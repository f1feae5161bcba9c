"""Sources S1-S3 (SURVEY.md §2.1)."""
