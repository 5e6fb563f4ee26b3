"""Network runtime: TPU-era equivalents of the reference's C++ components —
the ddcd DDC server (ddcd.py, batched on-device channelizer replacing
per-client forked pipelines, ddcd_old.cpp) and helpers around the native
nmux fan-out binary and tsmpool buffer pool (native/)."""
