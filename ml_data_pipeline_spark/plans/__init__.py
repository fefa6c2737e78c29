"""Lineage-tracking Dataset API — the Spark-native re-expression of the
reference's edit-loop lifecycle (SURVEY.md §3.1)."""

from .dataset import Dataset  # noqa: F401
