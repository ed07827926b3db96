"""Structured Streaming tier: the unbounded twin of the batch operators."""
