"""Dataset-level operators: the north-rule generalizations (SURVEY.md §2.4)
plus training-data-pipeline ops (dedup, similarity, text analysis)."""
