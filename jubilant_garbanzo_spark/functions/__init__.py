"""Reusable Catalyst expression builders (no UDFs)."""
