"""DSP blocks (one module per reference family, SURVEY.md §2)."""
