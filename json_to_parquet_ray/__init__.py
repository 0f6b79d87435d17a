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


def __getattr__(name):
    """Lazy re-exports so `import json_to_parquet_ray as jtpr` gives the
    main surface without paying import cost until used."""
    surface = {
        "encode_table": ("json_to_parquet_ray.encode", "encode_table"),
        "decode_table": ("json_to_parquet_ray.encode", "decode_table"),
        "read_chunk_file": ("json_to_parquet_ray.encode", "read_chunk_file"),
        "encode_job": ("json_to_parquet_ray.pipelines.encode_job", "encode_job"),
        "decode_dataset": ("json_to_parquet_ray.pipelines.encode_job", "decode_dataset"),
        "verify_job": ("json_to_parquet_ray.pipelines.encode_job", "verify_job"),
        "compute_stats": ("json_to_parquet_ray.stats", "compute_stats"),
        "plan_from_stats": ("json_to_parquet_ray.plan", "plan_from_stats"),
        "json_to_parquet_job": ("json_to_parquet_ray.json_source", "json_to_parquet_job"),
        "infer_json_schema": ("json_to_parquet_ray.schema_infer", "infer_json_schema"),
        # round-5 training-data operators
        "paragraph_dedup": ("json_to_parquet_ray.pipelines.dedup", "paragraph_dedup"),
        "exact_dedup": ("json_to_parquet_ray.pipelines.dedup", "exact_dedup"),
        "extract_text_batch": ("json_to_parquet_ray.pipelines.text", "extract_text_batch"),
        "decontaminate": ("json_to_parquet_ray.pipelines.text", "decontaminate"),
        "prepare_corpus": ("json_to_parquet_ray.pipelines.prepare", "prepare_corpus"),
        "pack_sequences": ("json_to_parquet_ray.pipelines.pack", "pack_sequences"),
        "quantize_embeddings": ("json_to_parquet_ray.pipelines.ann", "quantize_embeddings"),
        "stratified_sample": ("json_to_parquet_ray.pipelines.mix", "stratified_sample"),
        "canonicalize_urls_batch": ("json_to_parquet_ray.pipelines.text", "canonicalize_urls_batch"),
        "weighted_mix": ("json_to_parquet_ray.pipelines.mix", "weighted_mix"),
    }
    if name in surface:
        import importlib

        mod, attr = surface[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)
