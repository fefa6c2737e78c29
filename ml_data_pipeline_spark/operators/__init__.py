"""Operator packs. Every operator is a pure ``DataFrame -> DataFrame`` function."""
