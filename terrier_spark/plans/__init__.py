"""Whole-query plans: the reference's operator inventory (SURVEY.md §2)
re-expressed as DataFrame programs over the testdata tables, plus the
IR / training-data pipeline queries."""
