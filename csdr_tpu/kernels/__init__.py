"""Pallas TPU kernels for the hot inner loops (SURVEY.md §7 kernel tier 2)."""
