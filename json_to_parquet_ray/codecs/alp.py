"""ALP-style decimal-scaling codec for float columns.

Public-knowledge scheme (Afroozeh & Boncz, "ALP: Adaptive Lossless
floating-Point compression", SIGMOD 2024): most real-world doubles are
decimals (prices, rates, scores), so ``round(v * 10^e)`` is a small
integer that round-trips BIT-identically through ``int * 10^-e``. We
pick one exponent per chunk (sampled vote), frame-of-reference +
bit-pack the integer stream, and store the values that don't survive
the exact round-trip (true reals, NaN/±inf, -0.0, overflow) verbatim as
positional exceptions. Complements ``bss``: bss wins on full-entropy
mantissas (embeddings), alp wins ~10-30x on decimal-valued columns
(``l_quantity``/``l_extendedprice``/``events.value``).

Determinism notes (the north rule requires bit-identical decode under
task retries): the scale factor is ``float(10**e)`` — exact for e ≤ 15
because 10^15 < 2^53 — and decode is ``enc / F``, a single IEEE-754
division, correctly rounded and platform-stable (multiplying by the
inexact inverse ``1/F`` instead would double-round: 123.45 * 100 →
12345 → 12345 * 0.01 ≠ 123.45 bitwise, pushing the vote to uselessly
large exponents); ``np.round`` is half-to-even. Encode checks
exactness with the SAME division the decoder uses, comparing raw bit
patterns, so any value the check passes decodes bit-identical by
construction.

The reference hard-codes parquet-mr's float path (Writer.java:102);
this codec is part of the superseding per-column auto-selection
(BASELINE.json north_rule).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .base import (
    Codec,
    bit_width,
    pack_bits,
    pack_sections,
    pack_validity,
    type_from_b64,
    type_to_b64,
    unpack_bits,
    unpack_sections,
    unpack_validity,
)

_MAX_E = 15          # 10^15 < 2^53: float(10**e) stays exact
_SAMPLE_CAP = 4096   # exponent vote sample size per chunk
_ENC_LIMIT = float(1 << 62)  # |scaled| bound so int64 + FOR stay safe


def _bits(vals: np.ndarray) -> np.ndarray:
    """Raw IEEE bit patterns (u32 for f32, u64 for f64)."""
    return vals.view(np.uint32 if vals.dtype == np.float32 else np.uint64)


def _decode_floats(enc: np.ndarray, e: int) -> np.ndarray:
    """THE decode transform — encode's exactness check uses it verbatim
    so accepted values round-trip bit-identically by construction."""
    f = float(10 ** abs(e))
    v = enc.astype(np.float64)
    return v / f if e >= 0 else v * f


def _exact_mask(vals: np.ndarray, enc: np.ndarray, ok: np.ndarray,
                e: int) -> np.ndarray:
    """Slots where decoding ``enc`` reproduces ``vals`` bit-identically."""
    dec = _decode_floats(enc, e)
    if vals.dtype == np.float32:
        dec = dec.astype(np.float32)
    return ok & (_bits(dec) == _bits(vals))


def _encode_ints(vals: np.ndarray, e: int) -> tuple[np.ndarray, np.ndarray]:
    """(int64 codes, exact-roundtrip mask) for exponent ``e``.

    Negative ``e`` handles decimals with trailing zeros (ALP's second
    exponent): multiples of 100 encode as ``round(v / 100)`` and decode
    by the exact-factor MULTIPLY ``enc * 100.0`` — one correctly-rounded
    IEEE op either way. Non-finite / overflowing slots get code 0 and
    exact=False; the caller stores them as exceptions.
    """
    f = float(10 ** abs(e))
    v64 = vals.astype(np.float64, copy=False)
    with np.errstate(invalid="ignore", over="ignore"):
        scaled = np.round(v64 * f) if e >= 0 else np.round(v64 / f)
    ok = np.isfinite(scaled) & (np.abs(scaled) < _ENC_LIMIT)
    enc = np.zeros(len(vals), np.int64)
    enc[ok] = scaled[ok].astype(np.int64)
    return enc, _exact_mask(vals, enc, ok, e)


def _choose_exponent(vals: np.ndarray) -> int:
    """Vote on a strided sample for the exponent with the smallest
    ESTIMATED encoded size (packed-code bits + exception bytes), as the
    ALP paper does — not raw hit count: on a 99%-decimal column with 1%
    true-real noise, e=15 captures the noise exactly but triples the
    code width, while a small e takes the 1% as exceptions and wins."""
    if len(vals) > _SAMPLE_CAP:
        vals = vals[:: len(vals) // _SAMPLE_CAP + 1]
    n = len(vals)
    if n == 0:
        return 0
    exc_cost = vals.dtype.itemsize + 4  # verbatim value + u32 position
    best_e, best_cost = 0, None
    # |e| ascending so cost ties resolve to the cheapest-to-vote exponent
    for e in sorted(range(-_MAX_E, _MAX_E + 1), key=lambda x: (abs(x), x < 0)):
        enc, exact = _encode_ints(vals, e)
        hits = int(exact.sum())
        if hits:
            ff = enc[exact]
            width = bit_width(int(ff.max()) - int(ff.min()))
        else:
            width = 0
        cost = width * n / 8 + exc_cost * (n - hits)
        if best_cost is None or cost < best_cost:
            best_e, best_cost = e, cost
    return best_e


def _ffill_where(vals: np.ndarray, keep: np.ndarray) -> np.ndarray:
    """Replace ``~keep`` slots with the previous kept value (leading
    misses get the first kept value) so FOR ranges stay tight."""
    if keep.all():
        return vals
    if not keep.any():
        return np.zeros_like(vals)
    idx = np.where(keep, np.arange(len(vals)), -1)
    np.maximum.accumulate(idx, out=idx)
    idx[idx < 0] = np.flatnonzero(keep)[0]
    return vals[idx]


class AlpCodec(Codec):
    name = "alp"

    @classmethod
    def can_encode(cls, t: pa.DataType) -> bool:
        return pa.types.is_float32(t) or pa.types.is_float64(t)

    @classmethod
    def encode(cls, arr: pa.Array) -> tuple[bytes, dict]:
        n = len(arr)
        if n >= 1 << 32:  # exception positions are u32
            raise ValueError("alp chunk too large (>= 2^32 rows)")
        validity = pack_validity(arr)
        filled = arr.fill_null(0.0) if arr.null_count else arr
        vals = filled.to_numpy(zero_copy_only=False)
        if n == 0:
            payload = pack_sections([validity, b"", b"", b""])
            return payload, {"n": 0, "e": 0, "ref": 0, "width": 0,
                             "n_exc": 0, "type": type_to_b64(arr.type)}
        valid = (arr.is_valid().to_numpy(zero_copy_only=False)
                 if arr.null_count else None)
        # vote on VALID values only: the 0.0 null-fill codes would drag
        # the sampled FOR range (and the chosen exponent) toward 0
        e = _choose_exponent(vals if valid is None else vals[valid])
        enc, exact = _encode_ints(vals, e)
        # null slots were filled with 0.0 which always round-trips
        # (round(0.0 * f) decodes to +0.0), so they never become
        # exceptions — but their 0 codes must not anchor the FOR
        # reference either, so ffill them away like non-exact slots
        exc_idx = np.flatnonzero(~exact).astype(np.uint32)
        enc = _ffill_where(enc, exact if valid is None else exact & valid)
        ref = int(enc.min())
        offs = np.subtract(enc, np.int64(ref)).view(np.uint64)
        width = bit_width(int(offs.max()))
        payload = pack_sections([
            validity,
            pack_bits(offs, width),
            exc_idx.astype("<u4").tobytes(),
            vals[exc_idx].tobytes(),
        ])
        return payload, {"n": n, "e": e, "ref": ref, "width": width,
                         "n_exc": int(len(exc_idx)),
                         "type": type_to_b64(arr.type)}

    @classmethod
    def decode(cls, payload: bytes, meta: dict) -> pa.Array:
        validity, packed, idx_b, exc_b = unpack_sections(payload)
        t = type_from_b64(meta["type"])
        n = meta["n"]
        np_t = np.float32 if pa.types.is_float32(t) else np.float64
        if n == 0:
            return pa.array([], type=t)
        offs = unpack_bits(packed, n, meta["width"])
        ref_u64 = np.array(meta["ref"], dtype=np.int64).view(np.uint64)
        enc = (offs + ref_u64).view(np.int64)
        vals = _decode_floats(enc, meta["e"])
        if np_t is np.float32:
            vals = vals.astype(np.float32)
        if meta["n_exc"]:
            idx = np.frombuffer(idx_b, "<u4")
            vals[idx] = np.frombuffer(exc_b, np_t)
        valid = unpack_validity(validity, n)
        mask = None if valid is None else ~valid
        return pa.array(vals, type=t, mask=mask)
