"""Custom operators built from DataFrame compositions (SURVEY.md §2.3,
§2.11, §2.12): first-match joins, range/as-of joins, wide→nested reshape,
dedup family, similarity search, text analysis, multimodal plumbing."""
