"""Sources & sinks (SURVEY.md §2.1-2.2)."""
