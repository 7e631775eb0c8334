"""Reusable column-level functions and codec helpers."""
