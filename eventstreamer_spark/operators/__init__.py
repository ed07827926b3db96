"""Operator library. Importing a module registers its queries."""
