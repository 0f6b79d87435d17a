"""JSON document source: quote-aware splitter + distributed JSON→Parquet.

Reference parity (SURVEY.md §2.1):

- S1 document splitter (JsonFormater.java:10-50): brace-stack splitting of
  a text file into top-level ``{...}`` documents — here *quote-aware*
  (fixes quirk Q6: a brace inside a string no longer corrupts the split),
  supporting documents spanning lines and many documents per line.
- P1-P7 parse pipeline (JsonFactory/SchemaBuilder): replaced by
  ``json.loads`` (fixes Q7: no lexical-typing crashes) inside
  ``map_batches``.
- C1 end-to-end CLI (Manager.java:8-35): ``json_to_parquet_job`` — a
  two-pass streaming Ray pipeline (pass 1: per-batch schema partials →
  unified schema; pass 2: parse + align + write parquet), instead of the
  reference's materialize-everything single thread (Manager.java:21-29).
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa

from .schema_infer import (
    align_table,
    infer_batch_schema,
    normalize_doc,
    table_from_docs,
    unify,
)


def split_documents(text: str) -> list[str]:
    """Split concatenated JSON objects on balanced top-level braces.

    Quote-aware (handles ``"`` strings with ``\\"`` escapes), unlike the
    reference splitter (JsonFormater.java:33-45, quirk Q6).
    """
    docs: list[str] = []
    depth = 0
    start = -1
    in_str = False
    esc = False
    for i, ch in enumerate(text):
        if in_str:
            if esc:
                esc = False
            elif ch == "\\":
                esc = True
            elif ch == '"':
                in_str = False
            continue
        if ch == '"':
            # track strings at depth 0 TOO: a brace inside a top-level
            # quoted string would otherwise start a bogus document and
            # desync the splitter, silently dropping later objects
            in_str = True
        elif ch == "{":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "}":
            if depth > 0:
                depth -= 1
                if depth == 0:
                    docs.append(text[start : i + 1])
    return docs


def parse_documents(texts: list[str]) -> list[dict]:
    return [json.loads(t) for t in texts]


def read_json_docs(paths: list[str] | str):
    """Ray Dataset of raw JSON document strings (one row per document).

    Each input file is one read task (the reference handled exactly one
    file single-threaded; files are the natural parallel unit here).
    """
    import ray

    ds = ray.data.read_binary_files(paths)

    def split_batch(batch: pa.Table) -> pa.Table:
        out: list[str] = []
        for raw in batch.column("bytes").to_pylist():
            out.extend(split_documents(raw.decode("utf-8")))
        return pa.table({"doc": pa.array(out, pa.string())})

    return ds.map_batches(split_batch, batch_format="pyarrow")


def infer_schema_distributed(docs_ds, mode: str = "engine") -> pa.Schema:
    """Pass 1: per-batch schema partials → one unified schema (tiny merge)."""
    import pickle

    def schema_partial(batch: pa.Table) -> pa.Table:
        docs = parse_documents(batch.column("doc").to_pylist())
        schema = infer_batch_schema(docs, mode)
        return pa.table({"schema": pa.array([pickle.dumps(schema)], pa.binary())})

    parts = docs_ds.map_batches(schema_partial, batch_format="pyarrow")
    schemas = [pickle.loads(b) for b in
               (r["schema"] for r in parts.take_all())]
    return unify(schemas, mode)


def read_json_arrow(paths: list[str] | str, schema: pa.Schema | None = None):
    """Bulk JSON source on Arrow's C++ JSON reader (no Python parse loop).

    Handles NDJSON, many documents per line, and documents spanning lines
    (``newlines_in_values``) — the same inputs as the quote-aware splitter,
    at C parse speed. With ``schema`` given, values parse directly into the
    target types (ints promote to float, missing keys null-fill)."""
    import pyarrow.json as pj
    import ray

    parse = pj.ParseOptions(newlines_in_values=True, explicit_schema=schema)
    read = pj.ReadOptions(block_size=8 << 20)  # 8 MB parse blocks
    return ray.data.read_json(paths, parse_options=parse, read_options=read,
                              file_extensions=None)


_OUTPUT_MARKER = "_JTPR_JSON2PARQUET"


def _mark_output(out_dir: str) -> None:
    """Stamp out_dir as this job's output so a later run may replace it."""
    with open(os.path.join(out_dir, _OUTPUT_MARKER), "w") as f:
        f.write(json.dumps({"writer": "json_to_parquet_job"}))


def json_to_parquet_job(input_paths: list[str] | str, out_dir: str,
                        mode: str = "engine") -> pa.Schema:
    """The reference's whole CLI as a streaming two-pass Ray pipeline.

    Engine mode parses with Arrow's C++ JSON reader end to end (pass 1:
    per-block schema partials → unified schema; pass 2: parse straight
    into the unified schema and write parquet). Python-level parsing only
    runs in conformance mode, which reproduces the reference's narrowing
    semantics exactly (SURVEY.md §7.3 R1-R8). One documented divergence:
    Arrow infers ISO-8601 strings as timestamps in engine mode; the
    conformance path keeps them as strings like the reference."""
    import pickle

    # REPLACE semantics on every path: the widened engine path already
    # swapped out_dir via a staged rename, but the non-widened and
    # Python paths appended parquet files NEXT TO a previous run's — the
    # same call mixed stale rows or replaced them depending on whether
    # the schema happened to need widening
    if os.path.isdir(out_dir):
        # REPLACE only what a previous run of THIS job wrote: a typo'd
        # out_dir pointing at an unrelated existing directory must fail
        # loudly (same policy as require_store), not be silently deleted.
        # "Only parquet entries" is not provenance — a user's parquet
        # lake directory looks exactly like that — so previous runs leave
        # a marker file and only marked (or empty) directories are
        # replaced. The marker is '_'-prefixed, which pyarrow/Ray parquet
        # dataset discovery ignores (the _SUCCESS convention).
        entries = os.listdir(out_dir)
        marked = _OUTPUT_MARKER in entries
        stray = [f for f in entries
                 if f != _OUTPUT_MARKER and not f.endswith(".parquet")]
        if entries and (not marked or stray):
            raise ValueError(
                f"out_dir {out_dir!r} exists and is not a previous "
                f"json_to_parquet_job output (marker "
                f"{'present' if marked else 'missing'}; stray entries "
                f"{stray[:5]!r}) — refusing to delete; point at an empty "
                "directory or a previous run's output")
        shutil.rmtree(out_dir)
    # stamp provenance UP FRONT (not only on success): a run killed
    # mid-write must not leave an unmarked parquet-only directory that
    # every retry then refuses to replace
    os.makedirs(out_dir, exist_ok=True)
    _mark_output(out_dir)

    if mode == "engine":
        try:
            ds = read_json_arrow(input_paths)

            def schema_partial(batch: pa.Table) -> pa.Table:
                return pa.table({"schema": pa.array(
                    [pickle.dumps(batch.schema.remove_metadata())],
                    pa.binary())})

            parts = ds.map_batches(schema_partial, batch_format="pyarrow")
            schemas = [pickle.loads(r["schema"]) for r in parts.take_all()]
        except Exception as ex:
            # Arrow's C++ reader refuses inputs whose types flip WITHIN a
            # parse block ("Column changed from number to string") — fall
            # through to the exact Python parse path rather than dying on
            # valid JSON. Only PARSE failures reroute: a transient
            # cluster/worker error must surface, not silently run the
            # orders-of-magnitude-slower Python path with different
            # timestamp semantics.
            cause = getattr(ex, "cause", None) or ex
            # json.JSONDecodeError included: Ray's JSON datasource retries
            # a failed Arrow parse with a whole-buffer json.load, so an
            # Arrow type conflict on JSONL surfaces as 'Extra data'.
            # KeyError/TypeError too: the same retry json.loads a
            # single-document file to a DICT (not a list) and
            # from_pylist(dict) raises KeyError — a parse-shaped failure
            # the Python path handles, not a cluster error
            if not isinstance(cause, (pa.ArrowInvalid, pa.ArrowTypeError,
                                      pa.ArrowNotImplementedError,
                                      json.JSONDecodeError,
                                      KeyError, TypeError)):
                raise
            import logging

            logging.getLogger(__name__).warning(
                "engine-mode Arrow JSON parse failed (%s: %s) — falling "
                "back to the exact Python parse path",
                type(cause).__name__, cause)
            schemas = None
        if schemas is not None:
            # explicit_schema makes Arrow parse strictly. When unify had
            # to WIDEN a conflicting key, try the STRICT parse into the
            # widened schema FIRST (staged output, swapped in on success):
            # a string-vs-timestamp widening then keeps the original
            # lexical text, where the per-block-parse-then-cast fallback
            # would reformat timestamp-inferred strings ('T' separator
            # lost). The strict parse fails only when a field holds raw
            # NUMERIC tokens that must land in a widened string field —
            # that case parses per block and casts (numbers render
            # losslessly).
            schema, widened = unify(schemas, mode, return_widened=True)
            attempts = [schema, None] if widened else [schema]
            for i, sch in enumerate(attempts):
                staged = out_dir.rstrip("/") + "._strict_tmp"
                target = staged if (widened and sch is not None) else out_dir
                if target is staged:
                    shutil.rmtree(staged, ignore_errors=True)
                try:
                    ds2 = read_json_arrow(input_paths, schema=sch)
                    ds2.map_batches(lambda b: align_table(b, schema),
                                    batch_format="pyarrow"
                                    ).write_parquet(target)
                except Exception as ex:
                    cause = getattr(ex, "cause", None) or ex
                    if (i + 1 < len(attempts)
                            and isinstance(cause, (pa.ArrowInvalid,
                                                   pa.ArrowTypeError,
                                                   json.JSONDecodeError,
                                                   KeyError, TypeError))):
                        shutil.rmtree(staged, ignore_errors=True)
                        continue
                    raise
                if target is staged:
                    # marker travels with the staged dir so no swap
                    # window leaves an unmarked output
                    _mark_output(staged)
                    shutil.rmtree(out_dir, ignore_errors=True)
                    os.rename(staged, out_dir)
                _mark_output(out_dir)
                return schema

    docs_ds = read_json_docs(input_paths)
    schema = infer_schema_distributed(docs_ds, mode)
    # pass 2 re-reads the source (cheap vs materializing all docs — and the
    # Dataset is lazy, so pass 1's intermediate rows were never pinned)
    docs_ds2 = read_json_docs(input_paths)

    def to_arrow(batch: pa.Table) -> pa.Table:
        docs = [normalize_doc(d, mode)
                for d in parse_documents(batch.column("doc").to_pylist())]
        return align_table(table_from_docs(docs), schema)

    # a failed engine attempt may have left partial parquet behind — this
    # run owns out_dir (marker stamped at entry), so clear and re-stamp
    # before the fallback write instead of mixing generations
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    _mark_output(out_dir)
    docs_ds2.map_batches(to_arrow, batch_format="pyarrow").write_parquet(out_dir)
    return schema


def json_docs_to_table(json_texts: list[str], mode: str = "engine") -> pa.Table:
    """Local helper: documents → one unified Arrow table (tests/conformance)."""
    docs = [normalize_doc(json.loads(t), mode) for t in json_texts]
    per_doc = [table_from_docs([d]) for d in docs]
    schema = unify([t.schema for t in per_doc], mode)
    if not schema.names:
        # pa.concat_tables drops rows of 0-column tables — count directly
        from .schema_infer import _rows_only_table

        return _rows_only_table(len(docs))
    return pa.concat_tables([align_table(t, schema) for t in per_doc])
