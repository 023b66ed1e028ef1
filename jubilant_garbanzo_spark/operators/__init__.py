"""Composite operators the reference (or Spark) lacks as primitives.

Each is a pure DataFrame composition — no RDDs, no Python UDFs — so
Catalyst still optimizes through it (SURVEY.md §2b "custom operators").
"""
