"""Document sources and the chunk store (SURVEY.md §2.A)."""
