"""Operator inventory (SURVEY.md §2), Spark-first.

Each module implements one operator family as lazy DataFrame
transformations; reference file:line citations in each docstring map
the operator back to the behavior it re-expresses.
"""
