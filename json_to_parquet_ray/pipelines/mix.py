"""Deterministic weighted corpus mixing for training-data pipelines.

A training mixture draws each source corpus at its own rate ("wiki at
2x epochs, crawl at 0.3") — at 100 TB that must be a per-row decision
with no coordination, stable under Ray task retries and partition
layout. Each corpus Bernoulli-samples rows by a deterministic hash of
a key column (NOT an RNG: retries and re-splits must keep the same
rows), then the sampled corpora union into one stream.

``hash_fn="fast"`` uses ``pandas.util.hash_array`` (vectorized, used
by the stats KMV sketch); ``hash_fn="md5"`` hashes ``md5(str(key))``
per row — a Python loop, kept ONLY because DuckDB can replicate it
exactly (same pattern as ``text.fingerprint_batch``'s md5/fnv pair).
The sampling decision is ``hash(key) mod 2^32 < floor(rate * 2^32)``;
the equivalent DuckDB predicate for the md5 family is::

    CAST(('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 8)) AS BIGINT)
        % 4294967296 < CAST(floor(rate * 4294967296) AS BIGINT)

(md5's first 8 hex chars read big-endian match Python's
``digest()[:4]``.) NULL keys are never sampled — the DuckDB predicate
evaluates to NULL and filters them out, and both hash families here
drop them explicitly to match. Rows keep their source corpus in a
``mix_source`` column so downstream stages can stratify.

The reference has nothing like this (single-input CLI); this is a
first-class engine component per the build brief's training-data
operator list.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

_SCALE = 1 << 32


def _hash_fast(keys: pa.Array) -> np.ndarray:
    """Vectorized uint32 bucket per key. Null slots get an arbitrary
    bucket — the caller masks them out — but they must be FILLED with a
    type-appropriate value first: a numeric array with nulls converts
    to float64-with-NaN, which would silently change every non-null
    value's hash depending on which BATCH a null happened to land in."""
    t = keys.type
    if keys.null_count:
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            keys = keys.fill_null("")
        elif pa.types.is_binary(t) or pa.types.is_large_binary(t):
            keys = keys.fill_null(b"")
        else:
            keys = keys.fill_null(0)
    vals = keys.to_numpy(zero_copy_only=False)
    if vals.dtype == object:
        h = pd.util.hash_array(vals, categorize=False)
    else:
        h = pd.util.hash_array(np.ascontiguousarray(vals))
    return (h % np.uint64(_SCALE)).astype(np.uint64)


def _hash_md5(keys: pa.Array) -> np.ndarray:
    """md5(str(key)) first 4 bytes, big-endian — DuckDB-replicable."""
    out = np.zeros(len(keys), np.uint64)
    for i, v in enumerate(keys.to_pylist()):
        if v is None:
            continue
        dg = hashlib.md5(str(v).encode()).digest()
        out[i] = int.from_bytes(dg[:4], "big")
    return out


_HASHES = {"fast": _hash_fast, "md5": _hash_md5}


def bernoulli_sample(ds, key_col: str, rate: float, hash_fn: str = "fast"):
    """Deterministic rate-sample of a Dataset by hash of ``key_col``.

    rate >= 1.0 keeps everything; rate <= 0 keeps nothing. The decision
    depends only on the key value — stable under retries, re-splits,
    and appends (a row's fate never changes when the corpus grows).
    """
    if rate >= 1.0:
        return ds
    h = _HASHES[hash_fn]
    threshold = np.uint64(int(rate * _SCALE)) if rate > 0 else np.uint64(0)

    def pick(b: pa.Table) -> pa.Table:
        keys = b.column(key_col).combine_chunks()
        keep = h(keys) < threshold
        if keys.null_count:  # null keys are never sampled (SQL parity)
            keep &= keys.is_valid().to_numpy(zero_copy_only=False)
        return b.filter(pa.array(keep))

    return ds.map_batches(pick, batch_format="pyarrow")


def stratified_sample(ds, rates: dict, group_col: str, key_col: str,
                      default_rate: float = 1.0, hash_fn: str = "fast"):
    """Per-GROUP deterministic rate-sampling in one pass — corpus
    rebalancing ("downsample en to 25%, keep low-resource langs whole")
    without splitting the Dataset per group: each row's threshold comes
    from its ``group_col`` value (``rates`` dict, ``default_rate`` for
    unlisted or null groups), the keep decision from the same
    hash-Bernoulli rule as ``bernoulli_sample`` (retry/layout/append
    stable, md5 family DuckDB-replicable).

    Vectorized: groups dictionary-encode per batch, so the Python rate
    lookup runs once per DISTINCT group per batch; the row-level work is
    one hash compare. No shuffle — sampling a grouped corpus never
    moves it."""
    def thr(rate: float) -> np.uint64:
        if rate >= 1.0:
            return np.uint64(_SCALE)  # hashes are < 2^32 → always kept
        return np.uint64(int(rate * _SCALE)) if rate > 0 else np.uint64(0)

    rate_thr = {k: thr(v) for k, v in rates.items()}
    default_thr = thr(default_rate)
    h = _HASHES[hash_fn]

    def pick(b: pa.Table) -> pa.Table:
        groups = b.column(group_col).combine_chunks()
        enc = groups.dictionary_encode()
        per_value = np.array(
            [rate_thr.get(v, default_thr)
             for v in enc.dictionary.to_pylist()] or [default_thr],
            np.uint64)
        idx = enc.indices.fill_null(-1).to_numpy(zero_copy_only=False)
        row_thr = np.where(idx >= 0, per_value[idx], default_thr)
        keys = b.column(key_col).combine_chunks()
        keep = h(keys) < row_thr
        if keys.null_count:  # null keys are never sampled (SQL parity)
            keep &= keys.is_valid().to_numpy(zero_copy_only=False)
        return b.filter(pa.array(keep))

    return ds.map_batches(pick, batch_format="pyarrow")


def weighted_mix(parts, key_col: str, hash_fn: str = "fast",
                 label_col: str = "mix_source"):
    """Mix corpora at per-corpus rates: ``parts`` is
    ``[(name, dataset, rate), ...]``; returns the union of the sampled
    corpora with ``label_col`` recording each row's source name.

    Streaming end-to-end: per-corpus sampling is a stateless
    ``map_batches`` filter and ``Dataset.union`` concatenates lazily —
    nothing materializes on the driver regardless of corpus count.
    """
    if not parts:
        raise ValueError("weighted_mix needs at least one (name, dataset, "
                         "rate) part — an all-filtered mixture config is "
                         "a caller bug, not an empty dataset")
    sampled = []
    for name, ds, rate in parts:
        s = bernoulli_sample(ds, key_col, rate, hash_fn)
        tag = str(name)

        def label(b: pa.Table, _tag=tag) -> pa.Table:
            if label_col in b.column_names:
                # Arrow happily appends a DUPLICATE column name; fail
                # loudly instead of shipping an ambiguous schema
                raise ValueError(
                    f"input corpus already has a {label_col!r} column — "
                    f"pass a different label_col")
            return b.append_column(
                label_col, pa.array([_tag] * b.num_rows, pa.string()))

        sampled.append(s.map_batches(label, batch_format="pyarrow"))
    out = sampled[0]
    for s in sampled[1:]:
        out = out.union(s)
    return out
