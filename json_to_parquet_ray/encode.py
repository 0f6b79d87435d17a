"""Column-chunk encode/decode and the chunk file format.

One encoded *chunk file* per partition (input parquet row group):

    MAGIC "RDE1" | uint64 header_len | header JSON | concatenated payloads

The header carries the Arrow schema (IPC, base64), row count, and per
column: codec name, codec meta, payload offset/size and CRC32 — enough
to decode any single column without touching the others (column pruning
at the byte level), and enough for the manifest to verify integrity.

Supersedes the reference's single parquet-mr writer (Writer.java:20-36):
instead of one hardcoded encoder for the whole file, every column chunk
gets the codec chosen by the planner, and decode is bit-identical.
"""

from __future__ import annotations

import base64
import json
import zlib

import pyarrow as pa

from .codecs import decode_array, encode_array
from .plan import CodecPlan, plan_from_stats
from .stats import compute_stats_table

MAGIC = b"RDE1"


def schema_to_b64(schema: pa.Schema) -> str:
    return base64.b64encode(schema.serialize().to_pybytes()).decode()


def schema_from_b64(s: str) -> pa.Schema:
    return pa.ipc.read_schema(pa.py_buffer(base64.b64decode(s)))


def encode_table(table: pa.Table, plan: CodecPlan | None = None) -> tuple[bytes, dict]:
    """Encode all columns of ``table`` → (chunk file bytes, header dict).

    When ``plan`` is None the per-chunk planner runs on this chunk's own
    statistics — per-column-chunk codec selection (BASELINE.json).
    """
    if plan is None:
        stats = compute_stats_table(table)
        plan = plan_from_stats(stats, table.schema)
    payloads: list[bytes] = []
    columns: list[dict] = []
    offset = 0
    for name in table.column_names:
        arr = table.column(name).combine_chunks()
        cp = plan.codec_for(name)
        try:
            payload, meta = encode_array(arr, cp.codec, **cp.kwargs)
        except Exception as ex:
            # fallback keeps the job alive and bit-identical, but a
            # SYSTEMATIC failure (bad plan kwargs, uint64 > 2^63 under an
            # int codec) must not silently degrade every column to plain
            import logging

            logging.getLogger(__name__).warning(
                "codec %r failed on column %r (%s: %s) — falling back to "
                "plain", cp.codec, name, type(ex).__name__, ex)
            payload, meta = encode_array(arr, "plain")
        columns.append({
            "name": name,
            "codec": meta["codec"],
            "meta": meta,
            "offset": offset,
            "size": len(payload),
            "crc32": zlib.crc32(payload),
        })
        payloads.append(payload)
        offset += len(payload)
    header = {
        "schema": schema_to_b64(table.schema),
        "num_rows": table.num_rows,
        "columns": columns,
    }
    hbuf = json.dumps(header, sort_keys=True).encode()
    blob = MAGIC + len(hbuf).to_bytes(8, "little") + hbuf + b"".join(payloads)
    return blob, header


def read_chunk_header(blob: bytes) -> tuple[dict, int]:
    if blob[:4] != MAGIC:  # explicit (assert is stripped under python -O)
        raise ValueError("not an RDE1 chunk file")
    hlen = int.from_bytes(blob[4:12], "little")
    header = json.loads(blob[12 : 12 + hlen])
    return header, 12 + hlen


def read_chunk_file(path: str, columns: list[str] | None = None,
                    verify_crc: bool = False,
                    missing_ok: bool = False) -> pa.Table:
    """Decode a chunk file from disk; with ``columns`` given, only the
    header and the selected columns' byte ranges are read (seek-based) —
    column pruning at the I/O level, not just the decode level.
    ``missing_ok`` skips requested columns absent from the chunk (old
    chunks under read-time schema evolution) instead of raising."""
    with open(path, "rb") as f:
        if columns is None:
            return decode_table(f.read(), verify_crc=verify_crc)
        head = f.read(12)
        if head[:4] != MAGIC:
            raise ValueError("not an RDE1 chunk file")
        hlen = int.from_bytes(head[4:12], "little")
        header = json.loads(f.read(hlen))
        base = 12 + hlen
        schema = schema_from_b64(header["schema"])
        by_name = {c["name"]: c for c in header["columns"]}
        arrays, fields = [], []
        for name in columns:
            if missing_ok and name not in by_name:
                continue
            col = by_name[name]
            f.seek(base + col["offset"])
            payload = f.read(col["size"])
            if verify_crc and zlib.crc32(payload) != col["crc32"]:
                raise IOError(f"CRC mismatch for column {name}")
            arrays.append(decode_array(payload, col["meta"]))
            fields.append(schema.field(name))
        if not arrays:
            return _rows_only(header.get("num_rows", 0))
        return pa.Table.from_arrays(arrays, schema=pa.schema(fields))


def _rows_only(n: int) -> pa.Table:
    """0-column table that still CARRIES its row count — an empty (or
    all-missing under schema evolution) projection must not collapse the
    chunk's rows to zero; align_table can then null-fill n rows."""
    rb = pa.RecordBatch.from_struct_array(pa.array([{}] * n, pa.struct([])))
    return pa.Table.from_batches([rb], schema=pa.schema([]))


def decode_table(blob: bytes, columns: list[str] | None = None,
                 verify_crc: bool = False) -> pa.Table:
    """Decode a chunk file back to an Arrow table (optionally a column subset)."""
    header, base = read_chunk_header(blob)
    schema = schema_from_b64(header["schema"])
    # columns=[] is an explicit empty projection (0 columns), NOT "all" —
    # a falsy check would silently decode the full chunk
    want = (list(columns) if columns is not None
            else [c["name"] for c in header["columns"]])
    by_name = {c["name"]: c for c in header["columns"]}
    arrays, fields = [], []
    for name in want:
        col = by_name[name]
        payload = blob[base + col["offset"] : base + col["offset"] + col["size"]]
        if verify_crc and zlib.crc32(payload) != col["crc32"]:
            raise IOError(f"CRC mismatch for column {col['name']}")
        arrays.append(decode_array(payload, col["meta"]))
        fields.append(schema.field(name))
    if not arrays:
        return _rows_only(header.get("num_rows", 0))
    return pa.Table.from_arrays(arrays, schema=pa.schema(fields))
