"""MLlib-backed ML pipeline: train / evaluate / cross-validate / tune /
explain / infer (SURVEY.md §2.8)."""
