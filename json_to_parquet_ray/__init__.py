"""Ray-Data-native per-column lightweight-compression engine.

A brand-new engine with the capabilities of the reference
``Zhengsheng-Wang/Json-to-Parquet`` (a single-threaded Java JSON→Parquet
converter, see /root/reference/src/Manager.java:8-35), rebuilt
Ray-Data-first per the north rule in BASELINE.json:

- streaming ``ray.data.Dataset`` pipelines, zero-copy Arrow ``map_batches``
- schema inference + per-column statistics (cardinality, run-length,
  value-range, sample entropy)
- per-column-chunk codec auto-selection: dictionary, RLE, FSST,
  bit-packing, frame-of-reference (+ plain / zstd / byte-stream-split)
- stateful actor pools for shared dictionaries / FSST symbol tables
- salted repartition for skewed columns (heavy-hitter url hosts,
  near-constant lang)
- per-partition lineage manifest with checkpoint/resume
- bit-identical decode round-trip

Library code NEVER calls ``ray.init()`` — sessions are owned by bench.py,
CLI entry points, and the pytest fixture only.
"""

__version__ = "0.1.0"
