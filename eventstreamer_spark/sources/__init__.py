"""Batch + streaming sources for the canonical tables."""

from eventstreamer_spark.sources.tables import load_table, load_events, register_views

__all__ = ["load_table", "load_events", "register_views"]
