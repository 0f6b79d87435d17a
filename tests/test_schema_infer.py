"""Schema-inference conformance corpus (FIXTURES.md F2): every reference
semantic from SURVEY.md §1.3/§7.3, with golden expected Arrow schemas."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from json_to_parquet_ray.json_source import json_docs_to_table, split_documents
from json_to_parquet_ray.schema_infer import infer_json_schema


def conf_schema(*docs):
    return infer_json_schema(list(docs), mode="conformance")


def test_flat_scalars():
    s = conf_schema('{"a":1,"b":2.5,"c":"s","d":true}')
    assert s.field("a").type == pa.int32()
    assert s.field("b").type == pa.float32()
    assert s.field("c").type == pa.string()
    assert s.field("d").type == pa.bool_()


def test_int_float_peers_widen():
    s = conf_schema('{"xs":[{"v":1},{"v":2.5}]}')
    assert s.field("xs").type == pa.list_(pa.struct([pa.field("v", pa.float32())]))


def test_mixed_array_widens_trailing_ints():
    s = conf_schema('{"xs":[1, 2.5, 3]}')
    assert s.field("xs").type == pa.list_(pa.float32())


def test_missing_key_across_array_elems_optional():
    t = json_docs_to_table(['{"xs":[{"a":1},{"b":2}]}'], mode="conformance")
    xs = t.column("xs").combine_chunks()
    elems = xs.flatten()
    assert elems.type == pa.struct([pa.field("a", pa.int32()), pa.field("b", pa.int32())])
    assert elems.field("a").to_pylist() == [1, None]
    assert elems.field("b").to_pylist() == [None, 2]


def test_explicit_null_plus_value_peer():
    t = json_docs_to_table(['{"xs":[{"a":null},{"a":1}]}'], mode="conformance")
    elems = t.column("xs").combine_chunks().flatten()
    assert elems.field("a").to_pylist() == [None, 1]
    assert elems.field("a").type == pa.int32()


def test_all_null_key_dropped():
    s = conf_schema('{"a":null,"b":1}')
    assert s.names == ["b"]


def test_empty_object_dropped():
    s = conf_schema('{"a":{},"b":1}')
    assert s.names == ["b"]


def test_nested_object():
    s = conf_schema('{"a":{"b":1}}')
    assert s.field("a").type == pa.struct([pa.field("b", pa.int32())])


def test_array_of_objects():
    s = conf_schema('{"a":[{"b":1}]}')
    assert s.field("a").type == pa.list_(pa.struct([pa.field("b", pa.int32())]))


def test_nested_arrays_flattened():
    s = conf_schema('{"a":[[1,2],[3]]}')
    assert s.field("a").type == pa.list_(pa.int32())
    t = json_docs_to_table(['{"a":[[1,2],[3]]}'], mode="conformance")
    assert t.column("a").to_pylist() == [[1, 2, 3]]


def test_nulls_inside_arrays_kept_as_null():
    t = json_docs_to_table(['{"a":[1,null,2]}'], mode="conformance")
    assert t.column("a").to_pylist() == [[1, None, 2]]


def test_quotes_in_strings_preserved():
    t = json_docs_to_table(['{"a":"x\\"y"}'], mode="conformance")
    assert t.column("a").to_pylist() == ['x"y']


def test_int32_truncation_conformance_q3():
    # Java Long.intValue() wraps: 3_000_000_000 → -1294967296
    t = json_docs_to_table(['{"a": 3000000000}'], mode="conformance")
    assert t.column("a").to_pylist() == [-1294967296]
    # engine mode keeps int64
    t2 = json_docs_to_table(['{"a": 3000000000}'], mode="engine")
    assert t2.column("a").type == pa.int64()
    assert t2.column("a").to_pylist() == [3000000000]


def test_multi_doc_unification_supersedes_q1():
    t = json_docs_to_table(
        ['{"a":1}', '{"b":"x"}', '{"a":2.5,"c":[1]}'], mode="conformance"
    )
    assert set(t.column_names) == {"a", "b", "c"}
    assert t.column("a").type == pa.float32()
    assert t.column("a").to_pylist() == [1.0, None, 2.5]


def test_engine_mode_preserves_structure():
    t = json_docs_to_table(['{"a":{},"b":[[1]],"c":null}'], mode="engine")
    assert t.column("b").to_pylist() == [[[1]]]  # no flattening in engine mode


# -------------------------------------------------------- document splitter S1

def test_split_documents_basic():
    assert split_documents('{"a":1}{"b":2}') == ['{"a":1}', '{"b":2}']


def test_split_documents_multiline_and_noise():
    text = 'junk\n{"a":\n 1}\nmore junk {"b":{"c":2}} trailing'
    assert split_documents(text) == ['{"a":\n 1}', '{"b":{"c":2}}']


def test_split_documents_quote_aware_q6():
    # braces inside strings must not break the split (reference quirk Q6)
    text = '{"a":"}{"}{"b":"{\\"}"}'
    assert split_documents(text) == ['{"a":"}{"}', '{"b":"{\\"}"}']


def test_split_documents_nested():
    text = '{"a":{"b":{"c":[1,2,{"d":3}]}}}'
    assert split_documents(text) == [text]


def test_unify_int_vs_string_widens_instead_of_crashing(ray_session, tmp_path):
    """Valid JSON where the same key is int in one file and string in
    another must convert (widen to string), not die in unify()."""
    import json as _json
    import os

    import pyarrow.parquet as pq

    from json_to_parquet_ray.json_source import json_to_parquet_job

    d = tmp_path / "mixed"
    os.makedirs(d)
    with open(d / "a.jsonl", "w") as f:
        f.write(_json.dumps({"id": 1, "v": 2.5}) + "\n")
        f.write(_json.dumps({"id": 2, "v": 3}) + "\n")
    with open(d / "b.jsonl", "w") as f:
        f.write(_json.dumps({"id": "x7", "v": 4}) + "\n")
    out = str(tmp_path / "out")
    json_to_parquet_job([str(d / "a.jsonl"), str(d / "b.jsonl")], out)
    t = pq.ParquetDataset(out).read()
    ids = sorted(t.column("id").to_pylist())
    assert ids == ["1", "2", "x7"]  # int side rendered as its lexical text


def test_ingest_in_block_type_flip_falls_back_to_python_parse(
        ray_session, tmp_path):
    """A type flip WITHIN one file/parse block (Arrow C++ reader refuses)
    must fall back to the exact Python parser, not crash."""
    import json as _json
    import os

    import pyarrow.parquet as pq

    from json_to_parquet_ray.json_source import json_to_parquet_job

    d = tmp_path / "flip"
    os.makedirs(d)
    with open(d / "a.jsonl", "w") as f:
        f.write(_json.dumps({"id": 1}) + "\n")
        f.write(_json.dumps({"id": "x"}) + "\n")
    out = str(tmp_path / "out")
    json_to_parquet_job(str(d / "a.jsonl"), out)
    t = pq.ParquetDataset(out).read()
    assert sorted(str(v) for v in t.column("id").to_pylist()) == ["1", "x"]


def test_big_int_widens_to_float_lossily(ray_session, tmp_path):
    """Regression (round-4 review): an int beyond the float mantissa next
    to a real float must WIDEN with rounding (Java doubleValue()
    semantics), not crash align_table's safe cast on valid JSON."""
    import json as _json

    from json_to_parquet_ray.json_source import json_to_parquet_job

    p = tmp_path / "docs.jsonl"
    p.write_text(_json.dumps({"a": 9007199254740993}) + "\n"
                 + _json.dumps({"a": 0.5}) + "\n")
    out = str(tmp_path / "out")
    schema = json_to_parquet_job(str(p), out)
    assert pa.types.is_floating(schema.field("a").type)
    t = pq.read_table(out)
    got = sorted(x for x in t.column("a").to_pylist())
    assert got[0] == 0.5 and abs(got[1] - 9007199254740993) <= 1


def test_mixed_scalar_array_within_one_doc(ray_session, tmp_path):
    """Regression (round-4 review): [1, "x"] inside ONE document widens
    its elements to string (the cross-document conflict resolution),
    never crashes the per-doc fallback."""
    import json as _json

    from json_to_parquet_ray.json_source import json_to_parquet_job

    p = tmp_path / "docs.jsonl"
    p.write_text(_json.dumps({"id": 1, "a": [1, "x", True]}) + "\n"
                 + _json.dumps({"id": 2, "a": ["y"]}) + "\n")
    out = str(tmp_path / "out")
    json_to_parquet_job(str(p), out)
    t = pq.read_table(out)
    by_id = {r["id"]: r["a"] for r in t.to_pylist()}
    assert by_id[1] == ["1", "x", "true"]
    assert by_id[2] == ["y"]


def test_widened_string_keeps_timestamp_text(ray_session, tmp_path):
    """Regression (round-4 review): when unify widens a timestamp-looking
    column to string (a non-date value elsewhere), the output preserves
    the ORIGINAL lexical text — the strict widened-schema parse runs
    first instead of per-block inference + reformatting cast."""
    import json as _json

    from json_to_parquet_ray.json_source import json_to_parquet_job

    a = tmp_path / "a.jsonl"
    b = tmp_path / "b.jsonl"
    a.write_text(_json.dumps({"t": "2024-01-01T10:00:00"}) + "\n")
    b.write_text(_json.dumps({"t": "not a date"}) + "\n")
    out = str(tmp_path / "out")
    schema = json_to_parquet_job([str(a), str(b)], out)
    assert pa.types.is_string(schema.field("t").type)
    vals = set(pq.read_table(out).column("t").to_pylist())
    assert vals == {"2024-01-01T10:00:00", "not a date"}


def test_intra_doc_object_scalar_mix_raises_designed_error():
    """[{'x': 1}, 'y'] inside ONE document must raise the module's
    ValueError, not a raw ArrowInvalid from three frames deep."""
    import pytest

    from json_to_parquet_ray.schema_infer import table_from_docs

    with pytest.raises(ValueError, match="incompatible kinds"):
        table_from_docs([{"a": [{"x": 1}, "y"]}])


def test_json_job_refuses_unrelated_out_dir(ray_session, tmp_path):
    """A typo'd out_dir pointing at an existing directory with
    non-parquet content must fail loudly, not be rmtree'd."""
    import pytest

    from json_to_parquet_ray.json_source import json_to_parquet_job

    p = tmp_path / "in.jsonl"
    p.write_text('{"a": 1}\n')
    victim = tmp_path / "precious"
    victim.mkdir()
    (victim / "notes.txt").write_text("do not delete")
    with pytest.raises(ValueError, match="refusing"):
        json_to_parquet_job(str(p), str(victim))
    assert (victim / "notes.txt").exists()
    # a parquet-only directory WITHOUT the output marker is someone
    # else's data lake, not a previous run — refused too
    lake = tmp_path / "lake"
    lake.mkdir()
    (lake / "data_0.parquet").write_bytes(b"user data")
    with pytest.raises(ValueError, match="refusing"):
        json_to_parquet_job(str(p), str(lake))
    assert (lake / "data_0.parquet").exists()
    # a MARKED previous-output directory IS replaced
    from json_to_parquet_ray.json_source import _OUTPUT_MARKER

    out = tmp_path / "out"
    out.mkdir()
    (out / "stale_0.parquet").write_bytes(b"stale")
    (out / _OUTPUT_MARKER).write_text("{}")
    json_to_parquet_job(str(p), str(out))
    assert not (out / "stale_0.parquet").exists()
    assert (out / _OUTPUT_MARKER).exists()  # re-stamped by the new run
    # and an empty directory is fine
    empty = tmp_path / "empty"
    empty.mkdir()
    json_to_parquet_job(str(p), str(empty))
