"""DataFrame operators of the CDC pipeline (SURVEY.md §2)."""
