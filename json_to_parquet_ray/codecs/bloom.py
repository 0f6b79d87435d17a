"""Split-block Bloom filters for point-lookup chunk pruning.

Zone maps prune RANGE predicates, but on a column whose values are
unsorted and high-cardinality (url, content hash, external id) every
chunk's [min, max] spans the whole value space and an equality lookup
decodes every chunk. A per-column-chunk Bloom filter answers "is this
value definitely absent from the chunk?" from a few KB, so a point
lookup opens header + filter bytes per chunk instead of the chunk body.

The filter is the split-block Bloom filter (SBBF) of the public Parquet
format spec (Putze/Sanders/Singler, "Cache-, Hash- and Space-Efficient
Bloom Filters"): 32-byte blocks of eight 32-bit words; a value selects
one block via multiply-shift on the hash's top 32 bits and sets/tests
ONE bit per word, chosen by eight odd salt constants. One cache line
per probe, fully vectorizable with numpy.

The 64-bit value hash is engine-local (filters are written and read
only by this engine): splitmix64 finalization for integer/temporal
values, and the same segment-sum polynomial hash the dedup shuffle uses
for strings/binary — both exact-vectorized, no per-row Python.

Layout on disk (see encode.encode_table): filter bytes are appended
after the column payloads; the chunk header's column entry records
``bloom_offset`` / ``bloom_size`` / ``bloom_crc32`` / ``bloom_algo``.
Readers that predate blooms ignore the extra bytes; chunks without
blooms simply never prune.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

BLOOM_ALGO = "sbbf1"
# Parquet-format SBBF salt constants (public spec, bloom_filter.md)
_SALT = np.array([0x47B6137B, 0x44974D91, 0x8824AD5B, 0xA2B7289D,
                  0x705495C7, 0x2DF1424B, 0x9EFC4947, 0x5C6BFB31],
                 np.uint32)
_WORDS_PER_BLOCK = 8
_BLOCK_BYTES = 32
# strings longer than this make the polynomial power table (8 B/byte)
# not worth it — and a column of multi-KB values is not a point-lookup
# column
MAX_VALUE_BYTES = 4096
MAX_FILTER_BYTES = 4 << 20  # hard cap per column-chunk


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public domain constants)."""
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


_POLY_P = np.uint64(0x100000001B3)  # FNV prime, as the rolling base


def _hash64_bytes(arr: pa.Array) -> np.ndarray:
    """Segment-sum polynomial hash per value (mod 2^64), vectorized:
    hash(v) = Σ (b_j + 1) · P^(L-1-j). Same family as
    ``stats.poly_hash_binary`` — for values within MAX_VALUE_BYTES the
    outputs are splitmix64(poly_hash_binary(v)) exactly, and a test
    locks that equivalence: persisted filters pin this hash, so neither
    copy may drift (the duplication is deliberate — poly_hash_binary's
    mega-value blake2b branch must never apply to filter bytes)."""
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    arr = arr.cast(pa.large_binary())
    n = len(arr)
    offs = np.frombuffer(arr.buffers()[1], np.int64, count=n + 1,
                         offset=arr.offset * 8)
    data_buf = arr.buffers()[2]
    data = (np.frombuffer(data_buf, np.uint8)[offs[0]:offs[-1]]
            if data_buf is not None else np.zeros(0, np.uint8))
    offs = offs - offs[0]
    lens = (offs[1:] - offs[:-1]).astype(np.int64)
    h = np.full(n, np.uint64(0xCBF29CE484222325))  # empty-value sentinel
    nz = np.flatnonzero(lens > 0)
    if len(nz):
        maxlen = int(lens[nz].max())
        pw = np.empty(maxlen, np.uint64)
        pw[0] = 1
        if maxlen > 1:
            pw[1:] = _POLY_P
            np.cumprod(pw, out=pw)
        # value-aligned byte chunks bound the transient (the unchunked
        # gather holds ~24 B of index/weight arrays per input byte —
        # GBs on a chunk of millions of multi-KB distinct strings); same
        # shape as stats.poly_hash_binary. Weights align the LAST byte
        # of each value with P^0.
        chunk = 1 << 22
        csum = np.concatenate([[0], np.cumsum(lens[nz])])
        pos = 0
        while pos < len(nz):
            end = int(np.searchsorted(csum, csum[pos] + chunk,
                                      side="right")) - 1
            end = min(max(end, pos + 1), len(nz))
            vals_idx = nz[pos:end]
            reps = lens[vals_idx]
            starts = np.concatenate([[0], np.cumsum(reps)[:-1]])
            within = np.arange(int(reps.sum())) - np.repeat(starts, reps)
            w = pw[np.repeat(reps, reps) - 1 - within]
            gather = np.repeat(offs[vals_idx], reps) + within
            vals = (data[gather].astype(np.uint64) + np.uint64(1)) * w
            h[vals_idx] = np.add.reduceat(vals, starts)
            pos = end
    # finalize: the polynomial sum alone has poor high-bit diffusion for
    # short values; splitmix64 spreads it over all 64 bits (the block
    # index uses the TOP 32)
    return _splitmix64(h)


def hash64_column(arr: pa.Array | pa.ChunkedArray) -> np.ndarray | None:
    """64-bit hashes for a column's values (nulls hash arbitrarily — the
    caller masks them out). None = type not bloom-eligible."""
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    t = arr.type
    def _ints(v: pa.Array) -> np.ndarray:
        # fill nulls BEFORE to_numpy: a null-bearing int array converts
        # to float64, silently rounding VALID values above 2^53 (and so
        # changing their hashes); fill_null keeps the exact int dtype.
        # Null slots hash as 0 — the caller masks them out.
        if v.null_count:
            v = v.fill_null(0)
        return _splitmix64(
            v.to_numpy(zero_copy_only=False).astype(np.uint64))

    if pa.types.is_integer(t):
        return _ints(arr.cast(
            pa.int64() if not pa.types.is_unsigned_integer(t)
            else pa.uint64()))
    if pa.types.is_timestamp(t):
        # reinterpret at the column's NATIVE unit (lossless for ns) —
        # build and query both pass through the column type first, so
        # the unit is consistent on both sides
        return _ints(arr.cast(pa.int64()))
    if pa.types.is_date(t):
        return _ints(arr.cast(pa.timestamp("us")).cast(pa.int64()))
    if (pa.types.is_string(t) or pa.types.is_large_string(t)
            or pa.types.is_binary(t) or pa.types.is_large_binary(t)):
        return _hash64_bytes(arr)
    return None


def build_bloom(arr: pa.Array | pa.ChunkedArray,
                bits_per_value: int = 12) -> bytes | None:
    """Build an SBBF over the column's distinct non-null values.

    Returns None (no filter) when the type is ineligible, the column is
    all-null, values exceed MAX_VALUE_BYTES, or the sized filter would
    exceed MAX_FILTER_BYTES. ~12 bits/value ≈ 0.5-1% false-positive rate.
    """
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if arr.null_count == len(arr) or len(arr) == 0:
        return None
    t = arr.type
    if not (pa.types.is_integer(t) or pa.types.is_timestamp(t)
            or pa.types.is_date(t) or pa.types.is_string(t)
            or pa.types.is_large_string(t) or pa.types.is_binary(t)
            or pa.types.is_large_binary(t)):
        return None  # nested/float/etc: not bloom-eligible
    if (pa.types.is_string(t) or pa.types.is_large_string(t)
            or pa.types.is_binary(t) or pa.types.is_large_binary(t)):
        ml = pc.max(pc.binary_length(arr)).as_py()
        if ml is not None and ml > MAX_VALUE_BYTES:
            return None
    try:
        distinct = pc.unique(arr.drop_null())
        # size the filter BEFORE hashing: nblocks needs only the distinct
        # count, and hashing millions of multi-KB strings only to discard
        # the result at the cap would transiently burn GBs in the encode
        # task (bloom_columns='auto' hits this on content columns)
        nblocks = max(1, -(-len(distinct) * bits_per_value // 256))
        if nblocks * _BLOCK_BYTES > MAX_FILTER_BYTES:
            return None
        h = hash64_column(distinct)
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        # an unhashable representation is just another form of
        # ineligibility — the contract is "no filter", never a crashed
        # encode job
        return None
    if h is None:
        return None
    words = np.zeros(nblocks * _WORDS_PER_BLOCK, np.uint32)
    blk = (((h >> np.uint64(32)) * np.uint64(nblocks))
           >> np.uint64(32)).astype(np.int64)
    x = (h & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    for i in range(_WORDS_PER_BLOCK):
        bit = (x * _SALT[i]) >> np.uint32(27)  # top 5 bits of the product
        np.bitwise_or.at(words, blk * _WORDS_PER_BLOCK + i,
                         np.uint32(1) << bit)
    # the filter section is defined little-endian like every other
    # on-disk structure (no-op copy on LE hosts, bit-compatible with
    # filters already written there)
    return words.astype("<u4", copy=False).tobytes()


def bloom_might_contain(filt: bytes, value, typ: pa.DataType) -> bool:
    """Test one query value against a serialized SBBF. True = maybe
    present (decode the chunk); False = DEFINITELY absent (skip it).
    A null query value never matches (SQL equality semantics)."""
    if value is None:
        return False
    if isinstance(value, pa.Scalar):
        try:
            value = value.as_py()
        except (OverflowError, ValueError):
            # e.g. a timestamp scalar outside Python datetime range —
            # it may still be a real column value, so never claim absence
            return True
        if value is None:
            return False
    try:
        try:
            # target-typed construction first: inference-then-cast can
            # silently truncate (a ns-precision Timestamp infers as us)
            arr = pa.array([value], type=typ)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError,
                pa.ArrowTypeError, TypeError):
            arr = pa.array([value]).cast(typ)
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError,
            TypeError, ValueError, OverflowError):
        # a value the column type can't represent cannot be present
        return False
    try:
        h = hash64_column(arr)
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        # e.g. a date outside the ±~292k-year us-timestamp range: the
        # BUILD side degrades the same cast failure to "no filter", so
        # the query side must likewise never claim absence — and never
        # kill the read task
        return True
    if h is None:
        return True  # ineligible type: never claim absence
    words = np.frombuffer(filt, "<u4")
    nblocks = len(words) // _WORDS_PER_BLOCK
    hv = h[0]
    blk = int(((hv >> np.uint64(32)) * np.uint64(nblocks)) >> np.uint64(32))
    x = np.uint32(int(hv) & 0xFFFFFFFF)
    for i in range(_WORDS_PER_BLOCK):
        bit = np.uint32(int(x) * int(_SALT[i]) & 0xFFFFFFFF) >> np.uint32(27)
        if not (words[blk * _WORDS_PER_BLOCK + i]
                & (np.uint32(1) << bit)):
            return False
    return True
