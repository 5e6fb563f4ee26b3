"""Receiver / transmitter pipeline definitions (the BASELINE.json configs)."""
