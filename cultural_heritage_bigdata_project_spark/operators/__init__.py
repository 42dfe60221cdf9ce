"""Composable dataflow operators (the SURVEY.md §2 inventory)."""
