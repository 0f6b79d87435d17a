"""Frame-of-reference + bit-packing, and delta(+zigzag)+bit-packing.

Integer-like columns (ints, timestamps, dates, times, durations, bools):

- ``forbp``: subtract the chunk minimum (frame of reference), bit-pack the
  non-negative offsets to ceil(log2(range+1)) bits. Classic FOR.
- ``delta``: first value + zigzag(diff) bit-packed — wins on
  monotone-ish sequences like ``warc_ts`` (FIXTURES.md F1 expects
  "frame-of-reference + bit-packing (small deltas)").

Both fill nulls with the previous valid value (forward fill) before
packing so deltas stay small; the validity bitmap restores exact nulls.
All arithmetic is int64 wraparound → uint64, so any int64 range is safe.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .base import (
    Codec,
    bit_width,
    from_int64_values,
    is_int_like,
    pack_bits,
    pack_sections,
    pack_validity,
    to_int64_values,
    type_from_b64,
    type_to_b64,
    unpack_bits,
    unpack_sections,
    unpack_validity,
    zigzag_decode,
    zigzag_encode,
)


def _ffill(vals: np.ndarray, valid: np.ndarray | None) -> np.ndarray:
    """Forward-fill invalid slots (leading invalids get the first valid value)."""
    if valid is None or valid.all():
        return vals
    if not valid.any():
        return np.zeros_like(vals)
    idx = np.where(valid, np.arange(len(vals)), -1)
    np.maximum.accumulate(idx, out=idx)
    first = np.flatnonzero(valid)[0]
    idx[idx < 0] = first
    return vals[idx]


class ForBitPackCodec(Codec):
    name = "forbp"

    @classmethod
    def can_encode(cls, t: pa.DataType) -> bool:
        return is_int_like(t)

    @classmethod
    def encode(cls, arr: pa.Array) -> tuple[bytes, dict]:
        n = len(arr)
        validity = pack_validity(arr)
        vals, valid = to_int64_values(arr)
        vals = _ffill(vals, valid)
        ref = int(vals.min()) if n else 0
        offs = np.subtract(vals, np.int64(ref)).view(np.uint64)  # wraparound-safe
        width = bit_width(int(offs.max())) if n else 0
        payload = pack_sections([validity, pack_bits(offs, width)])
        return payload, {"n": n, "ref": ref, "width": width, "type": type_to_b64(arr.type)}

    @classmethod
    def decode(cls, payload: bytes, meta: dict) -> pa.Array:
        validity, packed = unpack_sections(payload)
        n, width = meta["n"], meta["width"]
        offs = unpack_bits(packed, n, width)
        ref_u64 = np.array(meta["ref"], dtype=np.int64).view(np.uint64)
        vals = (offs + ref_u64).view(np.int64)  # wraparound-safe add
        valid = unpack_validity(validity, n)
        return from_int64_values(vals, valid, type_from_b64(meta["type"]))


class DeltaCodec(Codec):
    name = "delta"

    @classmethod
    def can_encode(cls, t: pa.DataType) -> bool:
        return is_int_like(t)

    @classmethod
    def encode(cls, arr: pa.Array) -> tuple[bytes, dict]:
        n = len(arr)
        validity = pack_validity(arr)
        vals, valid = to_int64_values(arr)
        vals = _ffill(vals, valid)
        first = int(vals[0]) if n else 0
        deltas = np.diff(vals) if n else np.zeros(0, np.int64)
        zz = zigzag_encode(deltas)
        width = bit_width(int(zz.max())) if len(zz) else 0
        payload = pack_sections([validity, pack_bits(zz, width)])
        return payload, {"n": n, "first": first, "width": width, "type": type_to_b64(arr.type)}

    @classmethod
    def decode(cls, payload: bytes, meta: dict) -> pa.Array:
        validity, packed = unpack_sections(payload)
        n, width = meta["n"], meta["width"]
        if n == 0:
            return pa.array([], type=type_from_b64(meta["type"]))
        zz = unpack_bits(packed, n - 1, width)
        deltas = zigzag_decode(zz)
        vals = np.empty(n, np.int64)
        vals[0] = meta["first"]
        if n > 1:
            np.cumsum(deltas, out=vals[1:])
            vals[1:] += np.int64(meta["first"])
        valid = unpack_validity(validity, n)
        return from_int64_values(vals, valid, type_from_b64(meta["type"]))
