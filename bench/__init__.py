"""Checked-in performance probes (docs/PERF.md records their results).

A package so bench.py can import the shared DP-projection implementation;
each probe is also directly runnable (python bench/<probe>.py).
"""
