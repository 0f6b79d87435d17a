"""Similarity search over an embedding column (``list<float>``).

- ``brute_force_topk``: exact cosine top-k. The query matrix is broadcast
  ONCE via ``ray.put``; every ``map_batches`` task computes a numpy
  matmul against its batch and emits only its local top-k rows — the
  driver merges #batches x k rows, never the corpus. This is the
  baseline and the oracle for the approximate variants.
- ``ivf_topk``: IVF-style scale path — seeded k-means (few Lloyd
  iterations on a sample) builds coarse centroids; vectors carry a
  bucket id; a query probes only the ``nprobe`` nearest buckets. At
  cluster scale the bucket id becomes the partition key so probes touch
  a subset of partitions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def embedding_matrix(col, dtype=np.float64) -> np.ndarray:
    """``list<float>`` column → (n, dim) matrix via the flattened values
    buffer — zero-copy out of the Arrow batch (then one cast to the math
    dtype), never ``to_pylist``."""
    import pyarrow.compute as pc

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.zeros((0, 0), dtype)
    lens = pc.list_value_length(arr).to_numpy(zero_copy_only=False)
    if arr.null_count or (lens != lens[0]).any():
        raise ValueError("embedding column must be non-null fixed-width lists")
    vals = arr.flatten().to_numpy(zero_copy_only=False)
    return vals.astype(dtype, copy=False).reshape(n, int(lens[0]))


def quantize_batch(b: pa.Table, vec_col: str = "embedding",
                   key: str = "vec_id") -> pa.Table:
    """Per-vector symmetric int8 quantization — the 4x-smaller memory/
    storage path for 10^12-scale embedding stores: ``scale = max|v|/127``
    (stored as DOUBLE), ``q_i = floor(v_i/scale + 0.5)`` (half-up; an
    all-zero vector gets scale 0 and all-zero codes). Cosine similarity
    survives quantization UNSCALED — ``cos(q·x)/|q||x|`` — because the
    per-vector scale cancels, so quantized brute-force/IVF search runs
    directly on int8 codes (int32 accumulate) with no dequantization.

    All arithmetic in float64 (float32 inputs upcast exactly), matching
    the DuckDB oracle's DOUBLE ops bit-for-bit — IEEE division, add and
    floor are deterministic, so the emitted codes hash-compare exactly.
    """
    m = embedding_matrix(b.column(vec_col))  # float64 (n, d)
    n, d = m.shape if m.size else (b.num_rows, 0)
    maxabs = np.abs(m).max(axis=1) if d else np.zeros(n)
    scale = maxabs / 127.0
    safe = np.where(scale > 0, scale, 1.0)[:, None]
    q = np.clip(np.floor(m / safe + 0.5), -127, 127).astype(np.int8)
    q[maxabs == 0] = 0
    offs = pa.array(np.arange(n + 1, dtype=np.int64) * d, pa.int64())
    qlist = pa.LargeListArray.from_arrays(offs, pa.array(q.reshape(-1),
                                                         pa.int8()))
    return pa.table({key: b.column(key), "q_vec": qlist,
                     "q_scale": pa.array(scale, pa.float64())})


def quantize_embeddings(ds, vec_col: str = "embedding",
                        key: str = "vec_id"):
    """Dataset wrapper: (key, q_vec list<int8>, q_scale float64)."""
    return ds.map_batches(
        lambda b: quantize_batch(b, vec_col=vec_col, key=key),
        batch_format="pyarrow")


def brute_force_topk(ds, queries: np.ndarray, k: int = 10,
                     vec_col: str = "embedding", key: str = "vec_id") -> pd.DataFrame:
    """Exact cosine top-k for each query row. Returns (query_id, vec_id, cosine)."""
    import ray

    qn = _normalize(np.asarray(queries, np.float64))
    q_ref = ray.put(qn)  # broadcast once; tasks read zero-copy from the store

    def topk_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            # bucket filters upstream (ivf_topk's nprobe pruning) leave
            # whole batches empty — a (0,0) matmul would crash. Use the
            # batch's OWN key type: hardcoding int64 made empty blocks
            # disagree with data blocks on string-keyed datasets
            return pa.table({"query_id": pa.array([], pa.int64()),
                             key: pa.array(
                                 [], type=batch.schema.field(key).type),
                             "cosine": pa.array([], pa.float64())})
        q = ray.get(q_ref)
        emb = embedding_matrix(batch.column(vec_col))
        keys = batch.column(key).to_numpy(zero_copy_only=False)
        sims = q @ _normalize(emb).T  # (Q, B)
        kk = min(k, sims.shape[1])
        idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows = {"query_id": [], key: [], "cosine": []}
        for qi in range(sims.shape[0]):
            rows["query_id"].extend([qi] * kk)
            rows[key].extend(keys[idx[qi]].tolist())
            rows["cosine"].extend(sims[qi, idx[qi]].tolist())
        return pa.table({c: pa.array(v) for c, v in rows.items()})

    parts = ds.map_batches(topk_batch, batch_format="pyarrow")
    df = parts.to_pandas()  # ≤ #batches x Q x k rows
    if not len(df):  # zero input rows → typed empty, not a KeyError
        try:
            sch = ds.schema()
            key_t = sch.base_schema.field(key).type
        except Exception:
            key_t = pa.int64()
        return pa.table({"query_id": pa.array([], pa.int64()),
                         key: pa.array([], type=key_t),
                         "cosine": pa.array([], pa.float64())}).to_pandas()
    df = (df.sort_values(["query_id", "cosine", key],
                         ascending=[True, False, True])
            .groupby("query_id", as_index=False).head(k)
            .reset_index(drop=True))
    return df


def kmeans_fit(sample: np.ndarray, n_clusters: int, iters: int = 8,
               seed: int = 42) -> np.ndarray:
    """Seeded Lloyd's k-means on a sample (deterministic)."""
    rng = np.random.default_rng(seed)
    X = _normalize(np.asarray(sample, np.float64))
    idx = rng.choice(len(X), size=min(n_clusters, len(X)), replace=False)
    C = X[np.sort(idx)].copy()
    for _ in range(iters):
        assign = (X @ C.T).argmax(axis=1)
        for c in range(len(C)):
            m = assign == c
            if m.any():
                C[c] = X[m].mean(axis=0)
        C = _normalize(C)
    return C


def assign_buckets(ds, centroids: np.ndarray, vec_col: str = "embedding"):
    """Add an ``ivf_bucket`` column (id of the nearest centroid)."""
    import ray

    c_ref = ray.put(_normalize(centroids))

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:  # empty block: typed empty, no matmul
            return batch.append_column("ivf_bucket",
                                       pa.array([], pa.int64()))
        C = ray.get(c_ref)
        emb = _normalize(embedding_matrix(batch.column(vec_col)))
        bucket = (emb @ C.T).argmax(axis=1).astype(np.int64)
        return batch.append_column("ivf_bucket", pa.array(bucket))

    return ds.map_batches(assign, batch_format="pyarrow")


def stratified_vec_sample(ds, vec_col: str, sample_rows: int) -> np.ndarray:
    """k-means training sample spread across the WHOLE dataset — a head
    ``.limit(n)`` sample would train centroids on only the first
    fragments and mis-center on corpora whose embedding distribution
    drifts across files.

    Selection is a deterministic CONTENT-hash: a row is kept iff the
    FNV-mix of its vector bits is ≡ 0 mod (total/sample_rows). That
    makes the sample batch-layout independent and its expected size
    ``sample_rows`` regardless of how many blocks the dataset has — a
    per-batch stride would leak ≥1 row per block (unbounded at 10^9
    rows / 10^6 blocks). Driver memory is hard-capped at
    4·sample_rows."""
    total = ds.count()
    if total == 0:
        # fail with an actionable message instead of take_batch's opaque
        # 'The dataset is empty.' three frames deeper
        raise ValueError("cannot sample vectors from an empty dataset — "
                         "ivf_build/ivf_topk need at least one row")
    mod = max(total // max(sample_rows, 1), 1)

    def sampled(b: pa.Table) -> pa.Table:
        emb = embedding_matrix(b.column(vec_col))
        if not len(emb):
            return b.select([vec_col]).slice(0, 0)
        bits = np.ascontiguousarray(emb).view(np.uint64)
        h = np.zeros(len(emb), np.uint64)
        for j in range(bits.shape[1]):  # dim-bounded, row-vectorized
            h = (h ^ bits[:, j]) * np.uint64(0x100000001B3)
        keep = (h % np.uint64(mod)) == 0
        return b.select([vec_col]).filter(pa.array(keep))

    # stream with an early stop: the driver holds at most the cap plus
    # one batch even if a duplicate-heavy corpus over-collects (identical
    # vectors share one hash, so they pass or fail the filter together)
    cap = 4 * sample_rows
    batches, kept = [], 0
    for b in (ds.map_batches(sampled, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")):
        if not len(b):
            continue
        m = embedding_matrix(b.column(vec_col))
        batches.append(m)
        kept += len(m)
        if kept >= cap:
            break
    if not batches:
        # all-duplicate corpus whose single hash missed the modulus: fall
        # back to a bounded head sample rather than returning empty
        head = ds.limit(min(sample_rows, max(total, 1))).take_batch(
            sample_rows, batch_format="pyarrow")
        return embedding_matrix(head.column(vec_col))
    return np.vstack(batches)[:cap]


def ivf_build(ds, index_dir: str, n_clusters: int = 16,
              vec_col: str = "embedding", key: str = "vec_id",
              sample_rows: int = 4096, seed: int = 42) -> np.ndarray:
    """Build a bucket-PARTITIONED ANN index: every vector is written into
    the parquet partition of its IVF bucket (``ivf_bucket=N/`` dirs), so a
    probe later reads ONLY the probed buckets' files — partition pruning
    at the storage layer, not a post-read filter. Returns the centroids
    (also persisted next to the index)."""
    import json
    import os

    sample = stratified_vec_sample(ds, vec_col, sample_rows)
    C = kmeans_fit(sample, n_clusters, seed=seed)
    bucketed = assign_buckets(ds, C, vec_col)
    bucketed.write_parquet(index_dir, partition_cols=["ivf_bucket"])
    os.makedirs(index_dir, exist_ok=True)
    with open(os.path.join(index_dir, "_ivf_centroids.json"), "w") as f:
        json.dump(C.tolist(), f)
    return C


def ivf_probe_topk(index_dir: str, queries: np.ndarray, k: int = 10,
                   nprobe: int = 4, vec_col: str = "embedding",
                   key: str = "vec_id"):
    """Approximate top-k over a bucket-partitioned index: reads ONLY the
    ``nprobe`` nearest buckets' partition directories. Returns
    (result DataFrame, io_stats dict) — io_stats proves the pruning."""
    import json
    import os

    import ray

    with open(os.path.join(index_dir, "_ivf_centroids.json")) as f:
        C = _normalize(np.asarray(json.load(f), np.float64))
    qn = _normalize(np.asarray(queries, np.float64))
    probes = np.argsort(-(qn @ C.T), axis=1)[:, :nprobe]
    wanted = sorted({int(b) for row in probes for b in row})
    all_parts = sorted(d for d in os.listdir(index_dir)
                       if d.startswith("ivf_bucket="))
    part_dirs = [os.path.join(index_dir, f"ivf_bucket={b}") for b in wanted
                 if f"ivf_bucket={b}" in all_parts]
    paths = [os.path.join(d, f) for d in part_dirs for f in sorted(os.listdir(d))
             if f.endswith(".parquet")]
    if not paths:  # every probed bucket empty → typed empty result
        return (pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                              key: pd.Series([], dtype="int64"),
                              "cosine": pd.Series([], dtype="float64")}),
                {"buckets_read": 0, "buckets_total": len(all_parts),
                 "files_read": 0})
    ds = ray.data.read_parquet(paths)  # ONLY probed partitions' files open
    out = brute_force_topk(ds, qn, k=k, vec_col=vec_col, key=key)
    return out, {"buckets_read": len(part_dirs), "buckets_total": len(all_parts),
                 "files_read": len(paths)}


def ivf_topk(ds, queries: np.ndarray, k: int = 10, n_clusters: int = 16,
             nprobe: int = 4, vec_col: str = "embedding", key: str = "vec_id",
             sample_rows: int = 4096, seed: int = 42) -> pd.DataFrame:
    """Approximate cosine top-k probing only ``nprobe`` IVF buckets per query."""
    sample = stratified_vec_sample(ds, vec_col, sample_rows)
    C = kmeans_fit(sample, n_clusters, seed=seed)
    bucketed = assign_buckets(ds, C, vec_col)
    qn = _normalize(np.asarray(queries, np.float64))
    probes = np.argsort(-(qn @ C.T), axis=1)[:, :nprobe]  # (Q, nprobe)
    wanted = sorted({int(b) for row in probes for b in row})

    import pyarrow.compute as pc

    want_arr = pa.array(wanted, pa.int64())
    filtered = bucketed.map_batches(
        lambda b: b.filter(pc.is_in(b.column("ivf_bucket"), value_set=want_arr)),
        batch_format="pyarrow",
    )

    out = brute_force_topk(filtered, qn, k=k, vec_col=vec_col, key=key)
    # restrict each query to its own probed buckets? brute force over the
    # union is a superset → recall can only improve; keep it simple+exactish
    return out
