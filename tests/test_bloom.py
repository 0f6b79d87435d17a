"""Split-block Bloom filter: unit properties, chunk-format integration,
and point-lookup pruning through encode_job/decode_dataset."""

import os
import shutil
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from json_to_parquet_ray.codecs.bloom import (
    bloom_might_contain,
    build_bloom,
    hash64_column,
)
from json_to_parquet_ray.encode import (
    chunk_bloom_rejects,
    encode_table,
    read_chunk_file,
)


def test_bloom_no_false_negatives_strings():
    vals = [f"https://host-{i % 311}.com/p/{i}?q={i * 13}" for i in range(5000)]
    f = build_bloom(pa.array(vals))
    assert all(bloom_might_contain(f, v, pa.string()) for v in vals)


def test_bloom_fpp_bounded():
    f = build_bloom(pa.array([f"member-{i}" for i in range(20000)]))
    fp = sum(bloom_might_contain(f, f"absent-{i}", pa.string())
             for i in range(20000))
    assert fp / 20000 < 0.03  # 12 bits/value targets ~0.5-1%


def test_bloom_int_timestamp_and_edge_values():
    iv = pa.array([-5, 0, 7, 2**62, -(2**62), 123], pa.int64())
    f = build_bloom(iv)
    assert all(bloom_might_contain(f, v.as_py(), pa.int64()) for v in iv)
    assert not any(bloom_might_contain(f, x, pa.int64())
                   for x in range(1000, 1100))
    # a fractional query on an int column can never match
    assert not bloom_might_contain(f, 5.5, pa.int64())
    tv = pa.array([np.datetime64("2024-01-01T00:00:00"),
                   np.datetime64("2024-06-01T12:30:00")]
                  ).cast(pa.timestamp("us"))
    ft = build_bloom(tv)
    assert bloom_might_contain(ft, "2024-01-01T00:00:00", pa.timestamp("us"))
    assert not bloom_might_contain(ft, "2030-01-01T00:00:00",
                                   pa.timestamp("us"))


def test_bloom_nulls_and_ineligible():
    assert build_bloom(pa.array([None, None], pa.string())) is None
    f = build_bloom(pa.array(["a", None, "b"]))
    assert not bloom_might_contain(f, None, pa.string())  # NULL = NULL is not true
    # list columns are not bloom-eligible
    assert build_bloom(pa.array([[1, 2], [3]], pa.list_(pa.int64()))) is None
    # oversized values opt the column out
    assert build_bloom(pa.array(["x" * 10_000, "y"])) is None


def test_bloom_hash_matches_between_build_and_query():
    """The scalar query path must hash exactly like the vectorized build
    path for every eligible type (a drift here silently drops rows)."""
    for arr, typ in [
        (pa.array(["", "a", "ab" * 100]), pa.string()),
        (pa.array([0, -1, 2**53 + 1], pa.int64()), pa.int64()),
        (pa.array([1, 2, 3], pa.uint64()), pa.uint64()),
    ]:
        h_build = hash64_column(arr)
        for i, v in enumerate(arr):
            h_q = hash64_column(pa.array([v.as_py()]).cast(typ))
            assert h_q[0] == h_build[i], (typ, v)


def test_encode_table_bloom_sections_and_compat():
    t = pa.table({
        "url": pa.array([f"u-{i}" for i in range(500)]),
        "n": pa.array(range(500), pa.int64()),
        "text": pa.array(["x" * 9000] * 500),  # too long -> no bloom
    })
    blob, header = encode_table(t, bloom_columns=["url", "n", "text", "nope"])
    by = {c["name"]: c for c in header["columns"]}
    assert "bloom_offset" in by["url"] and "bloom_offset" in by["n"]
    assert "bloom_offset" not in by["text"]  # ineligible, silently skipped
    # decode ignores the appended filter bytes entirely
    from json_to_parquet_ray.encode import decode_table

    assert decode_table(blob, verify_crc=True).equals(t)


@pytest.fixture()
def bloom_store(ray_session, tmp_path):
    from json_to_parquet_ray.fixtures import write_cc_parquet
    from json_to_parquet_ray.pipelines.encode_job import encode_job

    src = str(tmp_path / "cc.parquet")
    write_cc_parquet(src, 3000, seed=11, row_group_size=500)  # 6 chunks
    out = str(tmp_path / "enc_bloom")
    summary = encode_job(src, out, bloom_columns=["url"])
    assert summary["bloom_columns"] == ["url"]
    return src, out


def test_encode_job_bloom_point_lookup(bloom_store):
    from json_to_parquet_ray.pipelines.encode_job import (
        decode_dataset,
        effective_records,
        verify_job,
    )

    src, out = bloom_store
    assert verify_job(out)["failed"] == []
    t = pq.read_table(src, columns=["url", "lang"])
    target = t.column("url")[1717].as_py()
    recs = effective_records(out)
    rejected = sum(chunk_bloom_rejects(os.path.join(out, r.chunk_file),
                                       {"url": target}) for r in recs)
    # urls are unique: all but the holding chunk should bloom-reject
    # (minus the occasional ~0.5%-rate false positive, which can only
    # cost a wasted decode, never a missed row)
    assert rejected >= len(recs) - 2 > 0
    df = decode_dataset(out, columns=["url", "lang"],
                        zone_filter={"url": (target, target)}).to_pandas()
    assert df["url"].tolist() == [target]
    # a value present nowhere decodes zero rows and rejects every chunk
    assert all(chunk_bloom_rejects(os.path.join(out, r.chunk_file),
                                   {"url": "https://no.such/url"})
               for r in recs)
    df0 = decode_dataset(out, columns=["url"],
                         zone_filter={"url": ("https://no.such/url",) * 2}
                         ).to_pandas()
    assert len(df0) == 0


def test_bloom_corrupt_filter_never_prunes(bloom_store, tmp_path):
    """A bit-flipped filter must NOT cause silent row loss: the reader
    CRC-checks the bloom bytes and conservatively decodes the chunk."""
    from json_to_parquet_ray.encode import read_chunk_header

    src, out = bloom_store
    from json_to_parquet_ray.pipelines.encode_job import effective_records

    rec = effective_records(out)[0]
    path = os.path.join(out, rec.chunk_file)
    with open(path, "rb") as f:
        blob = bytearray(f.read())
    hdr, base = read_chunk_header(bytes(blob))
    c = next(c for c in hdr["columns"] if "bloom_offset" in c)
    blob[base + c["bloom_offset"]] ^= 0xFF
    corrupt = str(tmp_path / "corrupt.rde")
    with open(corrupt, "wb") as f:
        f.write(bytes(blob))
    # definitely-absent value: intact chunks reject, the corrupt one won't
    assert not chunk_bloom_rejects(corrupt, {"url": "https://no.such/url"})
    # and eq_prune still returns the chunk's real rows
    t = read_chunk_file(corrupt, columns=["url"],
                        eq_prune={"url": "https://no.such/url"})
    assert t.num_rows == rec.num_rows


def test_compact_preserves_blooms(bloom_store):
    from json_to_parquet_ray.pipelines.encode_job import (
        compact_job,
        decode_dataset,
        effective_records,
        verify_job,
    )

    src, out = bloom_store
    res = compact_job(out, min_rows=1500)
    assert res["groups"] >= 1
    assert verify_job(out)["failed"] == []
    t = pq.read_table(src, columns=["url"])
    target = t.column("url")[42].as_py()
    recs = effective_records(out)
    rejected = sum(chunk_bloom_rejects(os.path.join(out, r.chunk_file),
                                       {"url": target}) for r in recs)
    assert len(recs) < 6  # compaction actually merged
    assert rejected >= 1  # merged chunks re-bloomed and still prune
    df = decode_dataset(out, columns=["url"],
                        zone_filter={"url": (target, target)}).to_pandas()
    assert df["url"].tolist() == [target]


def test_bloom_timestamp_ns_does_not_crash():
    """Regression: timestamp[ns] values that aren't whole microseconds
    must build a working filter (native-unit hashing), never raise the
    lossy-cast ArrowInvalid that would kill an encode job."""
    tv = pa.array(np.array([1_700_000_000_123_456_789, 42],
                           dtype="datetime64[ns]"))
    f = build_bloom(tv)
    assert f is not None
    for v in tv:
        assert bloom_might_contain(f, v.as_py(), tv.type)
    assert not bloom_might_contain(
        f, np.datetime64(987_654_321, "ns").item(), tv.type)


def test_bloom_eq_prune_keeps_sequential_fast_path(bloom_store):
    """A surviving full-projection decode under eq_prune must return the
    full chunk (sequential-read fallback), and a rejected one 0 rows."""
    from json_to_parquet_ray.pipelines.encode_job import effective_records

    src, out = bloom_store
    rec = effective_records(out)[0]
    path = os.path.join(out, rec.chunk_file)
    t_full = read_chunk_file(path)
    present = t_full.column("url")[0].as_py()
    t = read_chunk_file(path, eq_prune={"url": present})
    assert t.equals(t_full)
    t0 = read_chunk_file(path, eq_prune={"url": "https://no.such/url"})
    assert t0.num_rows == 0 and t0.column_names == t_full.column_names


def test_in_list_lookup_zone_bloom_and_exact(bloom_store):
    """IN-list decode: {col: [v1, v2]} batch point-fetch — zone maps
    survive any-value overlap, blooms reject all-absent chunks, the
    exact filter is set membership. Also covers the all-absent list."""
    from json_to_parquet_ray.pipelines.encode_job import (
        decode_dataset,
        effective_records,
    )

    src, out = bloom_store
    urls = pq.read_table(src, columns=["url"]).column("url").to_pylist()
    picks = sorted({urls[3], urls[1502], urls[2999]})
    df = decode_dataset(out, columns=["url"],
                        zone_filter={"url": picks}).to_pandas()
    assert sorted(df["url"]) == picks
    # IN-list with absent values mixed in: same rows
    df2 = decode_dataset(
        out, columns=["url"],
        zone_filter={"url": picks + ["https://no.such/a", None]}
    ).to_pandas()
    assert sorted(df2["url"]) == picks
    # all-absent IN-list: every chunk bloom-rejects, zero rows
    recs = effective_records(out)
    assert all(chunk_bloom_rejects(
        os.path.join(out, r.chunk_file),
        {"url": ["https://no.such/a", "https://no.such/b"]})
        for r in recs)
    df0 = decode_dataset(out, columns=["url"],
                         zone_filter={"url": ["https://no.such/a"]}
                         ).to_pandas()
    assert len(df0) == 0


def test_bloom_scalar_overflow_never_crashes():
    """A pa.Scalar whose as_py() overflows Python datetime must answer
    conservatively (maybe present), never raise."""
    import pyarrow as pa

    from json_to_parquet_ray.codecs.bloom import (
        bloom_might_contain, build_bloom)

    arr = pa.array([1, 2, 3], pa.timestamp("s"))
    filt = build_bloom(arr)
    big = pa.scalar(2**40, pa.timestamp("s"))  # out of datetime range
    assert bloom_might_contain(filt, big, pa.timestamp("s")) is True


def test_bloom_hash_stable_under_nulls_above_2_53():
    """A null elsewhere in the array must not change a valid value's
    hash (the old float64 conversion rounded values above 2^53)."""
    import pyarrow as pa

    from json_to_parquet_ray.codecs.bloom import hash64_column

    big = 2**60 + 1
    h_clean = hash64_column(pa.array([big], pa.int64()))[0]
    h_nully = hash64_column(pa.array([big, None], pa.int64()))[0]
    assert h_clean == h_nully


def test_bloom_hash_family_locked_to_poly_hash_binary():
    """Persisted filters pin the byte hash: it must stay exactly
    splitmix64(stats.poly_hash_binary) for values within
    MAX_VALUE_BYTES. If this test fails, a hash-family drift would
    false-negative every existing filter."""
    import pyarrow as pa

    from json_to_parquet_ray.codecs.bloom import _hash64_bytes, _splitmix64
    from json_to_parquet_ray.stats import poly_hash_binary

    arr = pa.array(["", "a", "hello world", "x" * 4096,
                    "\x00\xff bin-ish"], pa.string())
    assert (_hash64_bytes(arr) == _splitmix64(poly_hash_binary(arr))).all()


def test_dict_shared_dictionary_type_mismatch_roundtrips():
    """A string shared dictionary over a large_string column must decode
    back to large_string (the codec records the COLUMN type)."""
    import pyarrow as pa

    from json_to_parquet_ray.codecs.dictionary import DictCodec

    col = pa.array(["en", "de", None, "en"], pa.large_string())
    shared = pa.array(["en", "de", "fr"], pa.string())
    payload, meta = DictCodec.encode(col, dictionary=shared)
    back = DictCodec.decode(payload, meta)
    assert back.type == pa.large_string()
    assert back.equals(col)


def test_bloom_byte_hash_chunked_gather_matches_unchunked():
    """_hash64_bytes gathers in value-aligned ~4 MiB chunks; the chunked
    loop must produce the same hashes as the hash-family lock (which
    runs the same math single-chunk on small inputs) on an input big
    enough to span several chunks."""
    import pyarrow as pa

    from json_to_parquet_ray.codecs.bloom import _hash64_bytes, _splitmix64
    from json_to_parquet_ray.stats import poly_hash_binary

    # ~12 MiB total → 3+ chunk iterations at the 4 MiB chunk size
    vals = [("v%06d-" % i) * 256 for i in range(6000)] + ["", "tail"]
    arr = pa.array(vals, pa.string())
    assert (_hash64_bytes(arr) == _splitmix64(poly_hash_binary(arr))).all()


def test_bloom_size_cap_checked_before_hashing(monkeypatch):
    """The MAX_FILTER_BYTES cap needs only len(distinct) — build_bloom
    must return None WITHOUT hashing when the sized filter exceeds it."""
    import pyarrow as pa

    from json_to_parquet_ray.codecs import bloom as bl

    def boom(_):
        raise AssertionError("hash64_column ran before the size cap")

    monkeypatch.setattr(bl, "hash64_column", boom)
    # 12 bits/value: > MAX_FILTER_BYTES*8/12 distinct values trips the cap
    n = bl.MAX_FILTER_BYTES * 8 // 12 + 256
    arr = pa.array(np.arange(n, dtype=np.int64))
    assert bl.build_bloom(arr) is None


def test_bloom_date_out_of_timestamp_range_query_never_crashes():
    """A queried date32 outside the ±~292k-year us-timestamp range must
    degrade to 'maybe present' (True), mirroring the build side's
    degrade-to-no-filter — not raise ArrowInvalid inside the read task."""
    import pyarrow as pa

    from json_to_parquet_ray.codecs.bloom import bloom_might_contain, build_bloom

    f = build_bloom(pa.array([0, 1, 2], pa.date32()))
    assert f is not None
    # 2e9 days ≈ year 5.5M — valid date32, un-castable to timestamp[us]
    assert bloom_might_contain(f, 2_000_000_000, pa.date32()) is True
