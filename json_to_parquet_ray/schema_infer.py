"""JSON → Arrow schema inference with reference-conformant semantics.

Reproduces the *semantics* of the reference's inference pipeline
(SURVEY.md §1.3, §7.3 rules R1-R8) on Arrow, replacing its per-document
odometer peer-walk (JsonFactory.java:327-626) with per-batch Arrow
inference + ``pa.unify_schemas(promote_options="permissive")`` — the
cross-document unification the reference *intended* but got wrong by
writing every document with the last document's schema (Writer.java:24,
quirk Q1; fixed here per README.md:4's stated intent).

Two modes:

- ``engine`` (default): int64 / float64, all JSON structure preserved.
- ``conformance``: reproduces the reference write-path narrowing and
  normalization —
  R2/R3  ints narrowed to int32, floats to float32 (Writer.java:99,102;
         int64 truncation quirk Q3 reproduced bit-for-bit via wraparound)
  R4     keys that are null in every occurrence are dropped
         (SchemaBuilder.java:92-94)
  R6     nested arrays flattened (SchemaBuilder.java:33-36, Writer.java:48-50)
  R7     empty objects → null (JsonFactory.java:34-48, Writer.java:88-91)

Divergences from the reference are deliberate bug-fixes, documented in
SURVEY.md §7.4: Q1 (last-doc schema), Q5 (quote stripping), Q6 (brace
splitter not quote-aware), Q7 (lexical typing crashes).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

# ----------------------------------------------------- conformance transforms


def _flatten_lists(v):
    """R6: nested arrays are flattened ([[1,2],[3]] → [1,2,3])."""
    if isinstance(v, list):
        out = []
        for e in v:
            e = _flatten_lists(e)
            if isinstance(e, list):
                out.extend(e)
            else:
                out.append(e)
        return out
    if isinstance(v, dict):
        return {k: _flatten_lists(x) for k, x in v.items()}
    return v


def _empty_objects_to_null(v):
    """R7: {} → null, recursively (post-order so {"a":{}} → {"a": null})."""
    if isinstance(v, dict):
        out = {k: _empty_objects_to_null(x) for k, x in v.items()}
        return None if not out else out
    if isinstance(v, list):
        return [_empty_objects_to_null(e) for e in v]
    return v


def normalize_doc(doc: dict, mode: str = "engine") -> dict:
    if mode != "conformance":
        return doc
    d = _empty_objects_to_null(_flatten_lists(doc))
    return d if isinstance(d, dict) else {}


# -------------------------------------------------------------- type surgery


def _drop_null_fields(t: pa.DataType) -> pa.DataType | None:
    """R4: drop fields whose unified type is null (never had a value)."""
    if pa.types.is_struct(t):
        fields = []
        for f in t:
            ft = _drop_null_fields(f.type)
            if ft is not None:
                fields.append(pa.field(f.name, ft, nullable=True))
        return pa.struct(fields) if fields else None
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        vt = _drop_null_fields(t.value_type)
        return pa.list_(vt) if vt is not None else None
    if pa.types.is_null(t):
        return None
    return t


def _narrow_type(t: pa.DataType) -> pa.DataType:
    """R2/R3: int64→int32, float64→float32, recursively."""
    if pa.types.is_struct(t):
        return pa.struct([pa.field(f.name, _narrow_type(f.type), nullable=f.nullable)
                          for f in t])
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return pa.list_(_narrow_type(t.value_type))
    if t == pa.int64():
        return pa.int32()
    if t == pa.float64():
        return pa.float32()
    return t


def _align_array(arr: pa.Array, target: pa.DataType) -> pa.Array:
    """Cast with struct-widening (missing child fields → all-null child)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.type.equals(target):
        return arr
    if pa.types.is_null(arr.type):
        return pa.nulls(len(arr), target)
    if pa.types.is_struct(target) and pa.types.is_struct(arr.type):
        have = {f.name: i for i, f in enumerate(arr.type)}
        children = []
        for f in target:
            if f.name in have:
                children.append(_align_array(arr.field(f.name), f.type))
            else:
                children.append(pa.nulls(len(arr), f.type))
        validity = arr.is_valid() if arr.null_count else None
        return pa.StructArray.from_arrays(
            children, names=[f.name for f in target],
            mask=None if validity is None else pa.compute.invert(validity))
    if (pa.types.is_list(target) or pa.types.is_large_list(target)) and (
            pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type)):
        # flatten() returns values REBASED to 0 (slicing and null-slot
        # gaps removed), so the original arr.offsets must not be reused —
        # rebuild canonical offsets from per-slot lengths instead (a
        # sliced or non-canonical source would otherwise crash or read
        # the wrong value ranges)
        values = _align_array(arr.flatten(), target.value_type)
        lens = pa.compute.fill_null(
            pa.compute.list_value_length(arr), 0).to_numpy(
                zero_copy_only=False).astype(np.int64)
        new_offs = np.concatenate([[0], np.cumsum(lens)])
        mask = None
        if arr.null_count:
            mask = pa.compute.invert(arr.is_valid())
        if pa.types.is_large_list(target):
            la = pa.LargeListArray.from_arrays(
                pa.array(new_offs, pa.int64()), values, mask=mask)
        else:
            la = pa.ListArray.from_arrays(
                pa.array(new_offs.astype(np.int32), pa.int32()), values,
                mask=mask)
        return la.cast(target) if not la.type.equals(target) else la
    if pa.types.is_int32(target) and pa.types.is_int64(arr.type):
        # Q3 conformance: Java Long.intValue() truncation (wraparound)
        vals = arr.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        out = vals.astype(np.int32)  # C-style wraparound, matches intValue()
        mask = None
        if arr.null_count:
            mask = pa.compute.invert(arr.is_valid()).to_numpy(zero_copy_only=False)
        return pa.array(out, pa.int32(), mask=mask)
    if pa.types.is_floating(target) and pa.types.is_integer(arr.type):
        # int→float widening is LOSSY by design (Java doubleValue() /
        # floatValue() round): a safe cast would raise ArrowInvalid on any
        # int64 above 2^53 (or 2^24 for the conformance float32 target) —
        # crashing on valid JSON like a snowflake id next to a 0.5
        return arr.cast(target, safe=False)
    return arr.cast(target)


def align_table(table: pa.Table, schema: pa.Schema) -> pa.Table:
    if table.schema.remove_metadata() == schema:  # fast path: already aligned
        return table.replace_schema_metadata(None)
    if not schema.names:
        return _rows_only_table(table.num_rows)
    arrays = []
    for f in schema:
        if f.name in table.column_names:
            arrays.append(_align_array(table.column(f.name), f.type))
        else:
            arrays.append(pa.nulls(table.num_rows, f.type))
    return pa.Table.from_arrays(arrays, schema=schema)


# ------------------------------------------------------------------ inference


def table_from_docs(docs: list[dict]) -> pa.Table:
    """``pa.Table.from_pylist`` with the top-level key UNION across all
    docs (pyarrow 16 takes only the first row's keys at the top level —
    nested structs already union). Without this, a key missing from doc 0
    would be silently dropped — the reference's quirk Q1 reborn."""
    keys: dict[str, None] = {}
    for d in docs:
        for k in d:
            keys.setdefault(k)
    if not keys:  # all docs empty → 0-column table that still has the rows
        return _rows_only_table(len(docs))
    filled = [{k: d.get(k) for k in keys} for d in docs]
    try:
        return pa.Table.from_pylist(filled)
    except (pa.ArrowInvalid, pa.ArrowTypeError):
        # a key flips type WITHIN this batch ({"id": 1} then {"id": "x"}):
        # build per-doc tables, widen via unify's conflict resolution, and
        # align — the exceptional path only; clean batches stay one call
        per = []
        for d in filled:
            try:
                per.append(pa.Table.from_pylist([d]))
            except (pa.ArrowInvalid, pa.ArrowTypeError):
                # a mixed-type array INSIDE one document ([1, "x"]) can't
                # build even per-doc — widen its scalar elements to string
                # (the same non-promotable-conflict resolution
                # _unify_types applies across documents)
                try:
                    per.append(pa.Table.from_pylist([_widen_mixed_lists(d)]))
                except (pa.ArrowInvalid, pa.ArrowTypeError) as e:
                    # object/scalar mixes in ONE array ([{"x":1}, "y"])
                    # aren't widenable — raise the module's designed
                    # error, not a raw ArrowInvalid from a Ray worker
                    raise ValueError(
                        "a JSON document mixes incompatible kinds inside "
                        f"one array (objects with scalars/lists) and "
                        f"cannot unify: {e}") from e
        schema = unify([t.schema for t in per])
        return pa.concat_tables([align_table(t, schema) for t in per])


def _widen_mixed_lists(v):
    """Stringify the scalar elements of lists whose element types mix
    non-promotably within ONE document — [1, "x"] → ["1", "x"] — using
    the Arrow cast renderings (true/false booleans) so the result matches
    what cross-document widening would produce."""
    if isinstance(v, dict):
        return {k: _widen_mixed_lists(x) for k, x in v.items()}
    if isinstance(v, list):
        items = [_widen_mixed_lists(x) for x in v]
        kinds = {type(x) for x in items
                 if x is not None and not isinstance(x, (dict, list))}
        numeric = {int, float}
        if len(kinds) > 1 and not kinds <= numeric:
            def render(x):
                if x is None or isinstance(x, (dict, list)):
                    return x
                if isinstance(x, bool):
                    return "true" if x else "false"
                return x if isinstance(x, str) else str(x)
            items = [render(x) for x in items]
        return items
    return v


def _rows_only_table(n: int) -> pa.Table:
    """0-column table that still CARRIES its row count. Constant-space:
    one struct row replicated via take, never an n-element Python list
    (shared with encode._rows_only — keep ONE implementation)."""
    one = pa.array([{}], pa.struct([]))
    rb = pa.RecordBatch.from_struct_array(
        one.take(pa.nulls(n, pa.int64()).fill_null(0)))
    return pa.Table.from_batches([rb], schema=pa.schema([]))


def infer_batch_schema(docs: list[dict], mode: str = "engine") -> pa.Schema:
    docs = [normalize_doc(d, mode) for d in docs]
    return table_from_docs(docs).schema


def _unify_types(name: str, types: list[pa.DataType]) -> pa.DataType:
    """Resolve one key's cross-batch types when Arrow's permissive
    promotion can't (it only promotes numerics/null): scalar-type
    conflicts widen to string (the standard JSON-engine resolution — the
    original lexical text is recoverable via cast), nested/nested merge
    recursively, nested/scalar mixes fail with a usable error."""
    try:
        return pa.unify_schemas(
            [pa.schema([pa.field(name, t)]) for t in types],
            promote_options="permissive").field(0).type
    except (pa.ArrowTypeError, pa.ArrowInvalid, pa.ArrowNotImplementedError):
        pass
    non_null = [t for t in types if not pa.types.is_null(t)]
    if all(not pa.types.is_nested(t) for t in non_null):
        return pa.string()
    if all(pa.types.is_struct(t) for t in non_null):
        child_types: dict[str, list] = {}
        order: list[str] = []
        for t in non_null:
            for f in t:
                if f.name not in child_types:
                    order.append(f.name)
                child_types.setdefault(f.name, []).append(f.type)
        return pa.struct([pa.field(n, _unify_types(n, child_types[n]))
                          for n in order])
    if all(pa.types.is_list(t) or pa.types.is_large_list(t)
           for t in non_null):
        return pa.list_(_unify_types(name + ".item",
                                     [t.value_type for t in non_null]))
    raise ValueError(
        f"JSON key {name!r} mixes incompatible kinds (object vs array vs "
        f"scalar) across documents ({sorted(str(t) for t in non_null)}) "
        f"— cannot unify")


def unify(schemas: list[pa.Schema], mode: str = "engine",
          return_widened: bool = False):
    """Cross-document/batch unification (supersedes quirk Q1).

    With ``return_widened=True`` returns (schema, widened): ``widened``
    is True iff Arrow's permissive promotion failed and the per-field
    conflict resolution ran — callers that feed the schema back into a
    STRICT parser (explicit_schema) must not do so for a widened schema."""
    widened = False
    try:
        unified = pa.unify_schemas(schemas, promote_options="permissive")
    except (pa.ArrowTypeError, pa.ArrowInvalid, pa.ArrowNotImplementedError):
        widened = True
        # same key, non-promotable types across batches ({"id": 1} in one
        # file, {"id": "x"} in another) — resolve per field instead of
        # crashing the whole job on valid JSON
        types_by_name: dict[str, list] = {}
        order: list[str] = []
        for s in schemas:
            for f in s:
                if f.name not in types_by_name:
                    order.append(f.name)
                types_by_name.setdefault(f.name, []).append(f.type)
        unified = pa.schema(
            [pa.field(n, _unify_types(n, types_by_name[n]), nullable=True)
             for n in order])
    if mode == "conformance":
        fields = []
        for f in unified:
            t = _drop_null_fields(f.type)
            if t is None:
                continue  # R4: all-null key dropped
            fields.append(pa.field(f.name, _narrow_type(t), nullable=True))
        unified = pa.schema(fields)
    return (unified, widened) if return_widened else unified


def docs_to_table(docs: list[dict], schema: pa.Schema | None = None,
                  mode: str = "engine") -> pa.Table:
    docs = [normalize_doc(d, mode) for d in docs]
    t = table_from_docs(docs)
    if schema is None:
        schema = unify([t.schema], mode)
    return align_table(t, schema)


def infer_json_schema(json_texts: list[str], mode: str = "engine") -> pa.Schema:
    docs = [json.loads(s) for s in json_texts]
    return unify([infer_batch_schema(docs, mode)], mode)
