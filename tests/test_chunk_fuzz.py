"""Property-based fuzz of the whole chunk encode path: arbitrary tables
(mixed types, nulls, empty) must round-trip bit-identically through
``encode_table`` → ``decode_table`` with per-chunk codec auto-selection."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from json_to_parquet_ray.encode import decode_table, encode_table

n_rows = st.integers(min_value=0, max_value=50)


@st.composite
def tables(draw):
    n = draw(n_rows)
    cols = {}
    if draw(st.booleans()):
        cols["i"] = pa.array(
            draw(st.lists(st.one_of(st.none(), st.integers(-(2**62), 2**62)),
                          min_size=n, max_size=n)), pa.int64())
    if draw(st.booleans()):
        # mix raw doubles with 2-decimal values so the planner's alp
        # candidate wins some chunks and loses others
        cols["f"] = pa.array(
            draw(st.lists(st.one_of(
                st.none(),
                st.floats(allow_nan=False, width=64),
                st.integers(-10**6, 10**6).map(lambda v: v / 100.0)),
                min_size=n, max_size=n)), pa.float64())
    if draw(st.booleans()):
        cols["s"] = pa.array(
            draw(st.lists(st.one_of(st.none(), st.text(max_size=20)),
                          min_size=n, max_size=n)), pa.string())
    if draw(st.booleans()):
        cols["b"] = pa.array(
            draw(st.lists(st.one_of(st.none(), st.binary(max_size=16)),
                          min_size=n, max_size=n)), pa.binary())
    if draw(st.booleans()):
        ts = draw(st.lists(st.one_of(st.none(),
                                     st.integers(0, 2**52)),
                           min_size=n, max_size=n))
        cols["t"] = pa.array(ts, pa.timestamp("us"))
    if draw(st.booleans()):
        cols["l"] = pa.array(
            draw(st.lists(st.one_of(st.none(),
                                    st.lists(st.integers(-100, 100), max_size=4)),
                          min_size=n, max_size=n)), pa.list_(pa.int64()))
    if not cols:
        cols["x"] = pa.array([0] * n, pa.int64())
    return pa.table(cols)


@given(tables())
@settings(max_examples=80, deadline=None)
def test_fuzz_chunk_roundtrip(t):
    blob, header = encode_table(t)
    back = decode_table(blob, verify_crc=True)
    assert back.schema == t.schema
    assert back.num_rows == t.num_rows
    for name in t.column_names:
        a = t.column(name).combine_chunks()
        b = back.column(name).combine_chunks()
        if pa.types.is_floating(a.type):
            assert repr(a.to_pylist()) == repr(b.to_pylist())
        else:
            assert b.equals(a), name
