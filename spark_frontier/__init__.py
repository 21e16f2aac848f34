"""spark-frontier: a PySpark-native URL-frontier + fetch-scheduler engine.

A from-scratch rebuild (NOT a port) of the dataflow semantics of the
Jadaunkg/Sports-crawler reference (see SURVEY.md): sitemap-tree expansion,
recency filtering, exact URL-seen dedup accelerated by a segmented bloom
filter over canonicalized xxhash64 URL keys, a host-bucketed priority
frontier with politeness deadlines, robots rules as a broadcast join, and
vectorized Arrow UDF batches for fetch/extract/validate over tables of
image + caption pairs.

Everything is plain DataFrame/SQL — Catalyst plans it; we only control
staging (cheap filters before anti-joins before UDF fetch) and physical
layout (bucketing, broadcast, salting).
"""

__version__ = "0.1.0"
