"""Multi-chip distribution (SURVEY.md §2.12-2.13 mapped to mesh collectives).

The reference's concurrency models and their TPU-native equivalents:
- process pipeline over Unix pipes  -> one jitted program (XLA fusion)
- nmux TCP fan-out                  -> broadcast/replication over mesh axes
- ddcd per-client channels          -> channel-axis sharding (fastddc bank)
- block streaming with overlap      -> time-axis sharding + ppermute halo
"""
