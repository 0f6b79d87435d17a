"""The flagship pipeline: partitioned, resumable, codec-auto-selected encode.

Shape (SURVEY.md §3.4):

    fragments = parquet row groups of the input            [partition unit]
    (pass 1)  ray Dataset over the raw rows → map_batches stats partials
              → merged GlobalStats → shared-dictionary build (salted
              distinct) for low-cardinality string columns
    (pass 2)  ray Dataset over fragment work items → EncodePartition
              actor pool (stateful: shared dictionaries fetched once per
              actor from the object store) → one chunk file + one
              manifest record per partition (atomic commit)
    resume:   completed partitions (manifest ∩ chunk files) are filtered
              out of the work-item list before the Dataset is built.

Partition = parquet row group so that (a) each encode task reads only its
own byte range — a distributed read with no central bottleneck, and (b)
the partition↔input mapping is deterministic, which makes the manifest's
fragment ids stable across runs/retries (required for resume and for
bit-identical output under Ray task retry).
"""

from __future__ import annotations

import json
import os
import threading
import time
import zlib
from dataclasses import asdict

import pyarrow as pa
import pyarrow.parquet as pq

from ..encode import decode_table, encode_table, read_chunk_header
from ..manifest import (
    FragmentRef,
    PartitionRecord,
    completed_partitions,
    effective_records,
    load_manifest,
    write_atomic,
    write_record,
)
from ..plan import CodecPlan, ColumnPlan, plan_from_stats
from ..shuffle import distinct_values, distinct_values_multi
from ..stats import compute_stats, compute_stats_table

SHARED_DICT_MAX_CARD = 1024

# store-level shared plan: sample size knobs. O(1) in the store size —
# the sample is a fixed number of fragments regardless of input scale.
PLAN_SAMPLE_FRAGS = 16
PLAN_SAMPLE_ROWS = 4096


def _store_optimize_path(out_dir: str) -> str:
    from ..manifest import manifest_dir

    # top-level file in the manifest dir: record loaders only read
    # shard-*/part-*.json, so this can never be mistaken for a record
    return os.path.join(manifest_dir(out_dir), "store_optimize.json")


def record_store_optimize(out_dir: str, mode: str) -> None:
    """Persist the planner mode the store was (last) encoded with, so
    later maintenance jobs — compaction re-encodes merged chunks — plan
    under the SAME frontier instead of silently reverting an archival
    store to balanced codecs. Last writer wins: a resumed run with a
    different mode governs subsequent maintenance."""
    write_atomic(_store_optimize_path(out_dir),
                 json.dumps({"optimize": mode}).encode())


def load_store_optimize(out_dir: str) -> str:
    """The store's recorded planner mode; 'balanced' for stores written
    before the mode existed (their codecs ARE balanced picks)."""
    try:
        with open(_store_optimize_path(out_dir)) as f:
            mode = json.load(f).get("optimize", "balanced")
        return mode if mode in ("balanced", "size") else "balanced"
    except (OSError, ValueError):
        return "balanced"


def build_shared_plan(frags: list[FragmentRef],
                      file_schemas: dict[str, pa.Schema],
                      optimize: str = "balanced") -> CodecPlan | None:
    """Plan codecs ONCE for the whole store from a deterministic fragment
    sample, instead of re-running trial encodes per partition.

    Motivation (round-5 profile): ``plan_from_stats`` costs ~40-55 ms per
    partition *even on tiny partitions* — FSST trial training plus Arrow
    IPC writer setup dominate — which at 10^6+ partitions is pure
    redundant work when the corpus is homogeneous. The shared plan is a
    strided sample of ``PLAN_SAMPLE_FRAGS`` fragments (first
    ``PLAN_SAMPLE_ROWS`` rows each), statted in parallel Ray tasks,
    merged, planned on the driver, then broadcast via ``ray.put``.

    Correctness is codec-agnostic (decode is bit-identical under any
    codec), so a shared plan can only change SIZE, never values; columns
    the plan does not cover — or whose chunk type the planned codec
    cannot encode (schema evolution / type drift) — fall back to
    per-chunk planning inside ``EncodePartition._plan_for``. The
    ``constant`` codec is chunk-local evidence by definition (a column
    constant in the sample need not be constant everywhere), so constant
    entries are dropped here and re-detected per chunk.
    """
    import ray

    from ..stats import merge_partials, stats_partial_batch

    if not frags:
        return None
    stride = max(1, len(frags) // PLAN_SAMPLE_FRAGS)
    picks = frags[::stride][:PLAN_SAMPLE_FRAGS]
    items = [{"path": f.path, "row_group": f.row_group,
              "num_rows": f.num_rows, "row_start": f.row_start}
             for f in picks]

    def sample_stats(batch: pa.Table) -> pa.Table:
        out = []
        for item in batch.to_pylist():
            t = read_fragment(item["path"], item["row_group"],
                              item["num_rows"], item["row_start"])
            out.append(stats_partial_batch(t.slice(0, PLAN_SAMPLE_ROWS)))
        return pa.concat_tables(out)

    parts = (ray.data.from_items(items, override_num_blocks=len(items))
             .map_batches(sample_stats, batch_size=1, batch_format="pyarrow")
             .take_all())  # bounded: one tiny pickled partial per (frag, col)
    stats = merge_partials([r["partial"] for r in parts])
    from ..schema_infer import unify

    # union schema across files (footers already read by list_fragments);
    # a cross-file type conflict widens to string here, and the per-column
    # can_encode fallback in _plan_for keeps such columns chunk-planned
    schema = unify(list(file_schemas.values()))
    plan = plan_from_stats(stats, schema, optimize=optimize)
    plan.columns = {c: p for c, p in plan.columns.items()
                    if p.codec != "constant"}
    return plan


_RG_CACHE: dict[tuple, pa.Table] = {}
_RG_CACHE_BYTES = 0
_RG_CACHE_MAX = 64 << 20  # per worker process; 32 workers → ≤2 GiB heap
_RG_CACHE_LOCK = threading.Lock()  # created at import: lazy creation
# would itself race when an actor runs __call__ concurrently


_ENC_CACHE: dict[tuple, "EncodePartition"] = {}
_ENC_CACHE_MAX = 4  # concurrent jobs sharing one worker is the rare case


def _worker_encoder(out_dir, shared_ref, fsst_ref, bloom_columns,
                    plan_ref, optimize="balanced") -> "EncodePartition":
    """Per-worker-process EncodePartition cache (setup-once amortization
    on the TASK pool — see the dispatch branch in ``encode_job``). Keyed
    by the refs' ids, which are unique per job, so a re-run with new
    broadcast state can never reuse a stale encoder. Ray task workers
    are single-threaded; no lock needed."""
    key = (out_dir, str(shared_ref), str(fsst_ref),
           tuple(bloom_columns or ()), str(plan_ref), optimize)
    enc = _ENC_CACHE.get(key)
    if enc is None:
        while len(_ENC_CACHE) >= _ENC_CACHE_MAX:
            _ENC_CACHE.pop(next(iter(_ENC_CACHE)))
        enc = EncodePartition(out_dir, shared_dicts_ref=shared_ref,
                              shared_fsst_ref=fsst_ref,
                              bloom_columns=bloom_columns,
                              shared_plan_ref=plan_ref,
                              optimize=optimize)
        _ENC_CACHE[key] = enc
    return enc


def _dispatch_blocks(n_items: int) -> int:
    """Block count for a work-item Dataset (one PARTITION per row).

    ``map_batches(..., batch_size=1)`` calls the UDF once per item
    regardless of blocking, but Ray dispatches one TASK per block — one
    block per item (the old shape) costs ~5-10 ms of driver scheduling
    per partition, which is pure overhead at 10^6+ partitions (hours of
    dispatch for minutes of encode). Capping at 8 blocks per CPU packs
    several partitions into each task while keeping 8 waves of dynamic
    load balancing to absorb partition-size skew. Manifest records,
    resume claims and summaries stay strictly per-partition."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(1, min(n_items, max(8 * cpus, 64)))


def read_fragment(path: str, row_group: int, num_rows: int,
                  row_start: int = 0) -> pa.Table:
    """Read one fragment (row group, or a row slice of one).

    Parquet's decode unit is the row group, so a SLICED fragment
    (``max_rows_per_partition`` splitting) re-decodes the whole group per
    slice — 63 re-reads of the same 22 MB group at the bench's 40-row
    slicing, ~75% of the per-partition cost once planning is shared. A
    worker-process LRU keyed by (path, mtime, size, row_group) caches the
    decoded group ONLY when the fragment is a slice (whole-group
    fragments are read exactly once — caching them would only evict
    useful entries). Byte-bounded; groups larger than half the bound are
    never cached (real-scale groups can exceed the whole bound). Tables
    are immutable, so sharing one across slices is safe.
    """
    global _RG_CACHE_BYTES
    st = os.stat(path)
    key = (path, st.st_mtime_ns, st.st_size, row_group)
    with _RG_CACHE_LOCK:
        table = _RG_CACHE.get(key)
        if table is not None:
            # move-to-end = LRU refresh (dict preserves insertion order)
            del _RG_CACHE[key]
            _RG_CACHE[key] = table
    if table is None:
        table = pq.ParquetFile(path).read_row_group(row_group)
        sliced = row_start or num_rows < table.num_rows
        if sliced and table.nbytes <= _RG_CACHE_MAX // 2:
            with _RG_CACHE_LOCK:
                if key not in _RG_CACHE:  # idempotent: a concurrent read
                    # of the same group must not double-count the bytes
                    _RG_CACHE[key] = table
                    _RG_CACHE_BYTES += table.nbytes
                while _RG_CACHE_BYTES > _RG_CACHE_MAX and len(_RG_CACHE) > 1:
                    old_key = next(iter(_RG_CACHE))
                    if old_key == key:
                        break
                    _RG_CACHE_BYTES -= _RG_CACHE.pop(old_key).nbytes
    if row_start or num_rows < table.num_rows:
        table = table.slice(row_start, num_rows)
    return table


def list_fragments(paths: list[str] | str,
                   max_rows_per_partition: int | None = None,
                   schemas_out: dict | None = None) -> list[FragmentRef]:
    """Deterministic fragment list: files sorted, row groups in order.

    A row group larger than ``max_rows_per_partition`` is split into row
    slices so CPU parallelism survives single-row-group inputs (the
    slicing task re-reads its row group but encodes only its slice).

    ``schemas_out``, when given, is filled with {path: arrow schema} from
    the SAME footer read — callers needing per-file schemas (shared-dict
    column discovery under schema evolution) must not pay a second
    sequential driver footer pass over 10^5 files."""
    if isinstance(paths, str):
        paths = [paths]
    files: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            files.extend(
                os.path.join(p, f) for f in sorted(os.listdir(p))
                if f.endswith(".parquet")
            )
        else:
            files.append(p)
    frags: list[FragmentRef] = []
    for f in sorted(files):
        md = pq.read_metadata(f)
        if schemas_out is not None:
            schemas_out[f] = md.schema.to_arrow_schema()
        for rg in range(md.num_row_groups):
            n = md.row_group(rg).num_rows
            if max_rows_per_partition and n > max_rows_per_partition:
                for start in range(0, n, max_rows_per_partition):
                    frags.append(FragmentRef(
                        f, rg, min(max_rows_per_partition, n - start), start))
            else:
                frags.append(FragmentRef(f, rg, n))
    return frags


_ZONE_STR_TRUNC = 64  # keep manifest records small on long url/text columns


def _string_upper_bound(s: str, n: int = _ZONE_STR_TRUNC) -> str | None:
    """A ≤ n+1-char string guaranteed >= every string with prefix s[:n]:
    truncating a MAX directly would understate it (s[:n] < s), so the
    last incrementable code point of the kept prefix is bumped (skipping
    the surrogate range). None = cannot bound (prefix all at U+10FFFF) —
    the caller then stores no max and the chunk conservatively survives
    upper-bound checks."""
    if len(s) <= n:
        return s
    p = s[:n]
    for i in range(len(p) - 1, -1, -1):
        c = ord(p[i])
        if c < 0x10FFFF:
            nxt = c + 1
            if 0xD800 <= nxt <= 0xDFFF:
                nxt = 0xE000
            return p[:i] + chr(nxt)
    return None


def _zone_maps(table: pa.Table) -> dict[str, dict]:
    """Per-column min/max zone maps for the manifest (numeric, temporal
    and string columns; JSON-serializable). At read time, a chunk whose
    zone is disjoint from the query range is skipped WITHOUT being
    opened. String zones truncate to _ZONE_STR_TRUNC chars: a truncated
    MIN is already a valid lower bound; a truncated MAX is rounded UP
    via _string_upper_bound so pruning stays conservative."""
    import pyarrow.compute as pc

    out: dict[str, dict] = {}
    for name in table.column_names:
        t = table.schema.field(name).type
        col = table.column(name)
        if col.null_count == len(col):
            continue
        if pa.types.is_integer(t) or pa.types.is_floating(t):
            mm = pc.min_max(col)
            out[name] = {"min": mm["min"].as_py(), "max": mm["max"].as_py()}
        elif pa.types.is_timestamp(t):
            mm = pc.min_max(col)
            out[name] = {"min": str(mm["min"].as_py()),
                         "max": str(mm["max"].as_py()), "ts": True}
        elif pa.types.is_string(t) or pa.types.is_large_string(t):
            mm = pc.min_max(col)
            zmin = mm["min"].as_py()[:_ZONE_STR_TRUNC]
            zmax = _string_upper_bound(mm["max"].as_py())
            z: dict = {"min": zmin, "str": True}
            if zmax is not None:
                z["max"] = zmax
            out[name] = z
    return out


def zone_prune(out_dir: str, zone_filter: dict,
               recs: list | None = None) -> tuple[list, int]:
    """Manifest-level chunk pruning: returns (surviving records in input
    order, number skipped). ``zone_filter``: {col: (lo, hi)} inclusive
    range, or {col: [v1, v2, ...]} IN-list (a LIST is a value set, a
    TUPLE is a range); a chunk survives iff every filtered column's zone
    overlaps the range / contains a possible value (chunks without a
    zone map for the column conservatively survive)."""
    if recs is None:
        recs = effective_records(out_dir)
    keep, skipped = [], 0
    for rec in recs:
        if _zones_alive(rec.columns, zone_filter):
            keep.append(rec)
        else:
            skipped += 1
    return keep, skipped


def _zone_hits(z: dict, lo, hi) -> bool:
    # a string zone may lack "max" (upper bound not representable
    # after truncation) — that side then conservatively survives
    zmin, zmax = z.get("min"), z.get("max")
    if z.get("ts"):
        # zones store str(datetime) ('YYYY-MM-DD HH:MM:SS');
        # normalize ISO 'T' separators so lexical order holds
        lo = None if lo is None else str(lo).replace("T", " ")
        hi = None if hi is None else str(hi).replace("T", " ")
    try:
        return not ((hi is not None and zmin is not None and zmin > hi)
                    or (lo is not None and zmax is not None
                        and zmax < lo))
    except TypeError:
        raise ValueError(
            f"zone-filter bound ({lo!r}, {hi!r}) is not comparable "
            f"with the column's {type(zmin).__name__} zone "
            f"values") from None


def _zones_alive(columns: list, zone_filter: dict) -> bool:
    """One record's zone-map survival check — shared by the driver-side
    ``zone_prune`` and the streamed zone decode (same logic runs inside
    index-scan tasks there)."""
    zones = {c["name"]: c for c in columns}
    for col, bound in zone_filter.items():
        z = zones.get(col)
        if z is None or "min" not in z:
            continue
        try:
            if isinstance(bound, list):
                alive = any(_zone_hits(z, v, v) for v in bound
                            if v is not None)
            else:
                lo, hi = bound
                alive = _zone_hits(z, lo, hi)
        except ValueError as e:
            raise ValueError(f"column {col!r}: {e}") from None
        if not alive:
            return False
    return True


class EncodePartition:
    """Stateful stage: encodes one partition (row group) per work item.

    Stateful on purpose: shared dictionaries and shared FSST symbol tables
    are fetched from the object store ONCE per actor in ``__init__`` — not
    per batch (BASELINE.json: "FSST symbol tables and dictionaries built in
    stateful actor pools so tables are shared across batches of the same
    partition"). A partition is encoded as one chunk, so within a
    partition the tables are shared by construction; across partitions the
    broadcast refs make them shared cluster-wide.

    Runs as a ``map_batches`` actor pool at real partition counts, and on
    small jobs as plain tasks with a per-worker-process instance cache
    (``_worker_encoder``) — same setup-once amortization, no actor-spawn
    fixed cost; see the dispatch branch in ``encode_job``.
    """

    def __init__(self, out_dir: str, shared_dicts_ref=None,
                 shared_fsst_ref=None, bloom_columns=None,
                 shared_plan_ref=None, optimize: str = "balanced"):
        import ray

        from ..codecs.fsst import FsstEncoder

        self.out_dir = out_dir
        self.optimize = optimize
        self.bloom_columns = list(bloom_columns or [])
        self.shared_dicts: dict[str, pa.Array] = (
            ray.get(shared_dicts_ref) if shared_dicts_ref is not None else {}
        )
        # store-level codec plan (build_shared_plan), fetched once per
        # actor — per-partition planning then runs only for columns the
        # plan can't cover
        self.shared_plan: CodecPlan | None = (
            ray.get(shared_plan_ref) if shared_plan_ref is not None else None
        )
        # column → compiled FsstEncoder, built once per actor from the
        # broadcast symbol tables
        self.shared_fsst: dict[str, object] = {}
        if shared_fsst_ref is not None:
            tables: dict[str, list[bytes]] = ray.get(shared_fsst_ref)
            self.shared_fsst = {c: FsstEncoder(t) for c, t in tables.items()}

    def _plan_for(self, table: pa.Table) -> CodecPlan:
        if self.shared_plan is None:
            stats = compute_stats_table(table)
            return plan_from_stats(stats, table.schema,
                                   optimize=self.optimize)
        from ..codecs import get_codec

        cols: dict[str, ColumnPlan] = {}
        rest: list[str] = []
        for field in table.schema:
            cp = self.shared_plan.columns.get(field.name)
            # fresh copy per partition: _encode_with_shared mutates the
            # ColumnPlan in place (dict/fsst overrides), and the shared
            # plan object is actor-lifetime state
            if (cp is not None and cp.codec != "constant"
                    and get_codec(cp.codec).can_encode(field.type)):
                cols[field.name] = ColumnPlan(
                    cp.column, cp.codec, dict(cp.kwargs),
                    cp.est_ratio, cp.candidates)
            else:
                rest.append(field.name)
        if rest:
            sub_schema = pa.schema([table.schema.field(n) for n in rest])
            stats = compute_stats_table(table.select(rest))
            cols.update(plan_from_stats(stats, sub_schema,
                                        optimize=self.optimize).columns)
        return CodecPlan(cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        out = []
        for item in rows:
            out.append(self._encode_one(item))
        return pa.Table.from_pylist(out)

    def _encode_one(self, item: dict) -> dict:
        t0 = time.time()
        frag = FragmentRef(item["path"], item["row_group"], item["num_rows"],
                           item.get("row_start", 0))
        pid = item["partition_id"]
        table = read_fragment(frag.path, frag.row_group, frag.num_rows,
                              frag.row_start)
        plan = self._plan_for(table)
        # shared dictionaries override the per-chunk choice where available
        blob, header = self._encode_with_shared(table, plan)
        from ..manifest import shard_of

        chunk_file = os.path.join(shard_of(pid), f"part-{pid}.rde")
        write_atomic(os.path.join(self.out_dir, chunk_file), blob)
        zone = _zone_maps(table)
        rec = PartitionRecord(
            partition_id=pid,
            fragment=asdict(frag),
            num_rows=table.num_rows,
            chunk_file=chunk_file,
            chunk_size=len(blob),
            columns=[
                {"name": c["name"], "codec": c["codec"], "size": c["size"],
                 "offset": c["offset"], "crc32": c["crc32"],
                 **zone.get(c["name"], {})}
                for c in header["columns"]
            ],
            wall_time_s=time.time() - t0,
        )
        write_record(self.out_dir, rec)
        return {
            "partition_id": pid,
            "num_rows": table.num_rows,
            "input_bytes": table.nbytes,
            "chunk_bytes": len(blob),
            "wall_time_s": rec.wall_time_s,
            "codecs": ",".join(f"{c['name']}={c['codec']}" for c in rec.columns),
        }

    def _encode_with_shared(self, table: pa.Table, plan: CodecPlan):
        for name, values in self.shared_dicts.items():
            if name in plan.columns:
                cp = plan.columns[name]
                cp.codec = "dict"
                cp.kwargs = {"values_codec": "plain", "dictionary": values}
        for name, encoder in self.shared_fsst.items():
            if name in plan.columns:
                cp = plan.columns[name]
                cp.codec = "fsst"
                cp.kwargs = {"encoder": encoder}
        cols = ([c for c in self.bloom_columns if c in table.column_names]
                if self.bloom_columns != ["auto"] else
                [f.name for f in table.schema
                 if pa.types.is_string(f.type) or pa.types.is_large_string(f.type)
                 or pa.types.is_integer(f.type)])
        return encode_table(table, plan, bloom_columns=cols)


def encode_job(
    input_paths: list[str] | str,
    out_dir: str,
    *,
    resume: bool = True,
    shared_dict_columns: list[str] | str | None = None,
    shared_fsst_columns: list[str] | None = None,
    bloom_columns: list[str] | str | None = None,
    concurrency: int | tuple | None = None,
    max_rows_per_partition: int | None = None,
    consolidate_manifest: bool = False,
    shared_plan: bool = False,
    optimize: str = "balanced",
) -> dict:
    """Run the full encode pipeline; returns a summary dict.

    ``optimize`` selects the planner frontier: ``"balanced"`` (default)
    weighs sampled ratio by measured encode cost; ``"size"`` scores on
    ratio alone and adds the zstd-19 archival candidate (~20-25% fewer
    bytes on CC text at ~100x the encode CPU of zstd-3 — for write-once
    stores whose decode path, unaffected, dominates their life). Resume
    records codec choices per partition, so resuming with a DIFFERENT
    mode re-encodes only the missing partitions under the new mode —
    completed partitions keep their recorded codecs (bit-identical
    decode either way).

    ``shared_plan=True`` plans codecs ONCE from a deterministic fragment
    sample and broadcasts the plan to every encode task (see
    ``build_shared_plan``) — the scale mode for homogeneous corpora,
    removing the ~40-55 ms per-partition planning fixed cost. Columns the
    shared plan can't cover (schema evolution, type drift, sampled-
    constant) still plan per chunk, so output stays bit-identical on
    decode either way.

    ``bloom_columns`` (list, or "auto" = every string/integer column)
    writes per-chunk split-block Bloom filters so later equality scans
    prune chunks whose zone maps cannot (unsorted high-cardinality
    columns — url, external ids). See codecs.bloom.

    ``consolidate_manifest`` folds the per-partition JSON records into
    one parquet index after the job completes (the job end is
    single-writer by construction, so the offline-only constraint on
    ``manifest.consolidate`` holds) — at 10^6+ partitions every later
    resume/decode/verify then reads ONE file instead of one per
    partition. A killed job leaves plain JSONs and consolidates on the
    resumed run's completion.

    Ray must already be initialised by the caller (driver contract).
    """
    import ray

    from ..manifest import manifest_dir

    if optimize not in ("balanced", "size"):
        # fail before any output is touched, not inside the first worker
        raise ValueError(f"unknown optimize mode: {optimize!r}")

    # mark the output as a store up front — a legitimately-EMPTY encode
    # (zero input fragments) must still satisfy require_store so verify
    # passes vacuously-but-honestly instead of 'not an encoded store'
    os.makedirs(manifest_dir(out_dir), exist_ok=True)
    record_store_optimize(out_dir, optimize)  # compaction plans same-mode

    file_schemas: dict[str, pa.Schema] = {}
    frags = list_fragments(input_paths, max_rows_per_partition,
                           schemas_out=file_schemas)
    total = len(frags)
    done: set[str] = set()
    if resume:
        prior = load_manifest(out_dir)
        complete = completed_partitions(out_dir)
        # partition ids are content-addressed (FragmentRef.frag_hash), so
        # appending input files never shifts existing ids; a completed
        # partition is reusable iff its FULL recorded fragment matches
        # this run's fragment (guards hash/basename collisions too).
        # Compacted records cover SEVERAL source fragments — all of them
        # count as done while the merged chunk is intact.
        by_frag = {json.dumps(asdict(f), sort_keys=True): f.frag_hash
                   for f in frags}
        for pid in complete:
            for src in prior[pid].source_fragments:
                h = by_frag.get(json.dumps(src, sort_keys=True))
                if h is not None:
                    done.add(h)
    work = [
        {"partition_id": f.frag_hash, "path": f.path, "row_group": f.row_group,
         "num_rows": f.num_rows, "row_start": f.row_start}
        for f in frags
        if f.frag_hash not in done
    ]
    shared: dict[str, pa.Array] = {}
    shared_ref = None
    # distinct file list: frags are ROW-GROUP slices, so the raw path
    # list repeats each file once per slice — read_parquet would re-read
    # every file that many times (and skew any sample toward
    # multi-fragment files)
    frag_paths = sorted({f.path for f in frags})
    if work and shared_dict_columns:
        # union of file schemas (already collected from the footers during
        # list_fragments — no second driver metadata pass): schema
        # evolution may add a string column in later files
        str_typed: set[str] = set()
        col_files: dict[str, list[str]] = {}
        for p in frag_paths:
            for fld in file_schemas[p]:
                col_files.setdefault(fld.name, []).append(p)
                if (pa.types.is_string(fld.type)
                        or pa.types.is_large_string(fld.type)):
                    str_typed.add(fld.name)

        # a column added by schema evolution exists only in SOME files;
        # ray.data.read_parquet infers its schema from the first fragment
        # and raises on a projected column the fragment lacks — so every
        # read below is restricted to the files that HAVE the column
        # (files without it contribute only nulls anyway). Columns sharing
        # a file set share one read pass; the no-evolution common case
        # stays a single full-input read.
        def _by_fileset(cols: list[str]) -> dict[tuple, list[str]]:
            groups: dict[tuple, list[str]] = {}
            for c in cols:
                groups.setdefault(tuple(col_files[c]), []).append(c)
            return groups

        if shared_dict_columns == "auto":
            # prune the candidate-selection stats pass to string columns
            # only — reading html/text payload bytes to decide that a
            # dictionary doesn't apply to them is a wasted full scan
            shared_dict_columns = []
            for paths_grp, cols in _by_fileset(sorted(str_typed)).items():
                stats = compute_stats(ray.data.read_parquet(
                    list(paths_grp), columns=cols))
                shared_dict_columns.extend(
                    n for n, st in stats.items()
                    if st.type_str in ("string", "large_string")
                    and 1 < st.cardinality <= SHARED_DICT_MAX_CARD
                )
        # one pruned read pass per file-set group builds every string
        # column's distinct set (per-column distinct_values would re-scan
        # the input once per column — a full pass each at 100 TB);
        # non-string dict columns (rare, manual callers) keep the
        # per-column path
        str_cols = [c for c in shared_dict_columns if c in str_typed]
        for paths_grp, cols in _by_fileset(str_cols).items():
            ds_grp = ray.data.read_parquet(list(paths_grp), columns=cols)
            shared.update(distinct_values_multi(ds_grp, cols))
        for coln in shared_dict_columns:
            if coln in shared:
                continue
            ds_col = ray.data.read_parquet(col_files.get(coln, frag_paths),
                                           columns=[coln])
            shared[coln] = distinct_values(ds_col, coln)
        if shared:
            shared_ref = ray.put(shared)
    fsst_ref = None
    if work and shared_fsst_columns:
        from ..codecs.fsst import train

        tables: dict[str, list[bytes]] = {}
        # STRATIFIED sample: a fixed per-block row stride spreads the
        # training sample across every fragment — a head `.limit(n)` sample
        # trains the symbol table on only the first fragments, which
        # mis-trains on corpora whose content regime drifts across files
        total_rows = sum(f.num_rows for f in frags)
        step = max(1, total_rows // 2048)

        def strided(b: pa.Table) -> pa.Table:
            return b.take(list(range(0, len(b), step)))

        sample_rows = (ray.data.read_parquet(
            frag_paths, columns=list(shared_fsst_columns))
            .map_batches(strided, batch_format="pyarrow").take_all())
        for coln in shared_fsst_columns:
            buf = b"".join(
                (r[coln].encode() if isinstance(r[coln], str) else (r[coln] or b""))
                for r in sample_rows if r.get(coln) is not None
            )
            tables[coln] = train(buf)
        fsst_ref = ray.put(tables)

    plan_ref = None
    plan_obj = None
    if work and shared_plan:
        plan_obj = build_shared_plan(frags, file_schemas, optimize=optimize)
        if plan_obj is not None:
            plan_ref = ray.put(plan_obj)

    summary_rows = []
    # EncodePartition takes the sentinel as a list; normalize ONCE here
    # so the stateless and actor branches can't drift
    _bc = ["auto"] if bloom_columns == "auto" else bloom_columns
    if work:
        items = ray.data.from_items(
            work, override_num_blocks=_dispatch_blocks(len(work)))
        if shared_ref is None and fsst_ref is None and plan_ref is None:
            # stateless → plain tasks reuse the already-warm worker pool
            def encode_item(batch: pa.Table) -> pa.Table:
                return EncodePartition(out_dir, bloom_columns=_bc,
                                       optimize=optimize)(batch)

            results = items.map_batches(encode_item, batch_size=1,
                                        batch_format="pyarrow")
        elif (concurrency is None and
              len(work) < 4 * int(ray.cluster_resources().get("CPU", 4))):
            # stateful shared refs on a SMALL job: actor spawn (~2-4 s of
            # fresh python workers importing the package) rivals the
            # encode itself, so run tasks + a per-WORKER-process encoder
            # cache instead. Ray task workers are long-lived, so
            # construction (ray.get of the broadcast dicts/tables/plan,
            # encoder build) still happens once per worker — the
            # actor-pool amortization — on the already-warm task pool.
            # Interleaved A/B at 16 partitions: median 6.7 s (tasks) vs
            # 8.3 s (16-actor pool); at 1008 partitions the two tie, so
            # big jobs keep the bounded pool below.
            def encode_item(batch: pa.Table) -> pa.Table:
                return _worker_encoder(out_dir, shared_ref, fsst_ref,
                                       _bc, plan_ref, optimize)(batch)

            results = items.map_batches(encode_item, batch_size=1,
                                        batch_format="pyarrow")
        else:
            cpus = int(ray.cluster_resources().get("CPU", 4))
            # actor pool for real partition counts (spawn amortizes) or
            # an explicit pool size (callers cap per-node memory when the
            # broadcast state is large); half the CPUs keeps every core
            # busy at ≥2 items/actor without doubling spawn+state cost
            conc = concurrency or max(1, min(len(work), max(2, cpus // 2)))
            results = items.map_batches(
                EncodePartition,
                fn_constructor_kwargs={"out_dir": out_dir,
                                       "shared_dicts_ref": shared_ref,
                                       "shared_fsst_ref": fsst_ref,
                                       "bloom_columns": _bc,
                                       "shared_plan_ref": plan_ref,
                                       "optimize": optimize},
                batch_size=1,
                batch_format="pyarrow",
                concurrency=conc,
            )
        # distributed summary aggregation — per-partition rows never
        # materialize on the driver (there may be millions at full scale)
        from ray.data.aggregate import Count, Sum

        agg = results.aggregate(
            Sum("input_bytes", alias_name="input_bytes"),
            Sum("chunk_bytes", alias_name="chunk_bytes"),
            Count(alias_name="n"),
        )
        summary_rows = [agg] if agg else []

    manifest = load_manifest(out_dir)
    input_bytes = int(summary_rows[0]["input_bytes"]) if summary_rows else 0
    chunk_bytes = int(summary_rows[0]["chunk_bytes"]) if summary_rows else 0
    encoded_n = int(summary_rows[0]["n"]) if summary_rows else 0
    plan_note = {
        "partitions_total": total,
        "partitions_skipped_resume": len(done),
        "partitions_encoded": encoded_n,
        "input_bytes": input_bytes,
        "chunk_bytes": chunk_bytes,
        "ratio": round(chunk_bytes / input_bytes, 4) if input_bytes else None,
        "shared_dict_columns": sorted(shared),
        "shared_fsst_columns": sorted(shared_fsst_columns or []),
        "bloom_columns": ("auto" if bloom_columns == "auto"
                          else sorted(bloom_columns or [])),
        # the broadcast plan's codec per column, for observability
        # (None when per-chunk planning ran) — kwargs/dictionaries are
        # deliberately not serialized into the job summary
        "shared_plan": ({c: p.codec for c, p in plan_obj.columns.items()}
                        if plan_obj is not None else None),
        "manifest_records": len(manifest),
    }
    if consolidate_manifest:
        from ..manifest import consolidate, manifest_dir

        # before job.json, so the on-disk summary records the result
        # too. An empty input (zero fragments) never created _manifest —
        # nothing to consolidate, and consolidate's not-a-store guard
        # must not kill an otherwise-successful empty job.
        plan_note["consolidated"] = (
            consolidate(out_dir) if os.path.isdir(manifest_dir(out_dir))
            else {"records_indexed": 0, "delta_files_removed": 0,
                  "sealed": False})
    write_atomic(
        os.path.join(out_dir, "_manifest", "job.json"),
        json.dumps(plan_note, indent=1).encode(),
    )
    return plan_note


def validate_zone_bounds(recs: list, zone_filter: dict) -> None:
    """Fail fast ON THE DRIVER for bounds a temporal column can't parse
    (e.g. CLI ts=2024,2025): the zone prune compares zone STRINGS
    lexically so such bounds slip through it and can lexically prune
    EVERY chunk — an empty result must not masquerade as success, and
    raising inside a Ray task would surface as an opaque RayTaskError.
    Shared by decode_dataset and the CLI scan-stats explain path (the
    explain must error exactly where the decode would)."""
    validate_zone_bounds_cols(
        {c["name"] for rec in recs for c in rec.columns if c.get("ts")},
        zone_filter)


def _validate_zone_bounds_streamed(out_dir: str,
                                   zone_filter: dict) -> None:
    """``validate_zone_bounds`` + bound-comparability for the streamed
    zone decode, fast and ON THE DRIVER (an in-task raise surfaces as an
    opaque mid-stream RayTaskError — the exact UX
    ``validate_zone_bounds`` exists to prevent):

    1. sample one zone per filtered column from the index's FIRST and
       LAST row groups (two footer-guided row-group reads, O(1) driver
       I/O at any store size — last covers columns added late by schema
       evolution);
    2. dry-run the zone check against the samples so an incomparable
       bound (``{'n': ('a','z')}`` on an int column) raises the same
       clean ValueError the driver-side prune raises;
    3. only a filter column absent from BOTH sampled row groups falls
       back to a distributed early-exit scan for one record carrying it
       (``limit(1)`` — the streaming executor stops at the first hit);
       a column no record carries validates vacuously, matching the
       driver path's conservative pass."""
    import ray

    from ..manifest import index_path

    def _informative(c: dict) -> bool:
        # only entries that CARRY zone info can represent the column: an
        # all-null slice's entry has neither 'ts' nor 'min' and must not
        # shadow real zones (a zone-less sample would silently disable
        # the ts literal check — empty result masquerading as success)
        return bool(c.get("ts")) or "min" in c

    def _collect(t: pa.Table, want: set) -> dict:
        found: dict[str, dict] = {}
        for raw in t.column("json").to_pylist():
            for c in json.loads(raw)["columns"]:
                n = c["name"]
                if n in want and _informative(c):
                    # prefer a ts-flagged sample — the flag is what the
                    # literal validation keys on
                    if n not in found or (c.get("ts")
                                          and not found[n].get("ts")):
                        found[n] = c
        return found

    want = set(zone_filter)
    pf = pq.ParquetFile(index_path(out_dir))
    sample_sets = [_collect(pf.read_row_group(0), want)]
    if pf.num_row_groups > 1:
        sample_sets.append(
            _collect(pf.read_row_group(pf.num_row_groups - 1), want))

    missing = want - {n for s in sample_sets for n in s}
    if missing:  # rare: zones only in mid-store records
        # one early-exit scan PER still-missing column (missing is the
        # schema-evolution tail of the user's zone_filter — a handful at
        # most). A single scan with a shared row cap could starve a rare
        # column behind a common one (256 samples of the common column
        # arrive before the rare column's first batch), silently
        # skipping its validation; per-column limit(1) is exact and the
        # streaming executor stops each scan at its first hit.
        fb: dict[str, dict] = {}
        for col in sorted(missing):
            def has_col(b: pa.Table, col=col) -> pa.Table:
                found = _collect(b, {col})
                return pa.Table.from_pylist(
                    [{"zone": json.dumps(c)} for c in found.values()],
                    schema=pa.schema([("zone", pa.string())]))

            hits = (ray.data.read_parquet(index_path(out_dir))
                    .map_batches(has_col, batch_format="pyarrow")
                    .limit(1).take_all())
            for r in hits:
                c = json.loads(r["zone"])
                fb[c["name"]] = c
        sample_sets.append(fb)
    # a column with NO informative zone anywhere validates vacuously —
    # exact: the in-task prune skips zone-less columns, so neither a
    # lexical ts compare nor a type error can occur for it

    validate_zone_bounds_cols(
        {n for s in sample_sets for n, z in s.items() if z.get("ts")},
        zone_filter)
    # comparability dry-run per sample set (first/last row group may
    # type a zone differently under schema evolution): same code path
    # as the in-task prune, so the same bad bound raises HERE with the
    # clean driver message. A type flip confined to mid-store chunks is
    # inherent to sampling and still surfaces via the in-task backstop.
    for s in sample_sets:
        _zones_alive(list(s.values()), zone_filter)


def validate_zone_bounds_cols(ts_cols: set, zone_filter: dict) -> None:
    """Core of ``validate_zone_bounds`` over a pre-computed timestamp
    column-name set (the streamed zone decode discovers it with a tiny
    distributed aggregate instead of a driver record list)."""
    for col, bound in zone_filter.items():
        if col not in ts_cols:
            continue
        for v in bound:  # tuple range and IN-list both iterate values
            if v is None:
                continue
            try:
                pa.scalar(str(v)).cast(pa.timestamp("us"))
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                raise ValueError(
                    f"zone-filter bound {v!r} is not a full literal "
                    f"for timestamp column {col!r} (use e.g. "
                    f"2024-01-01T00:00:00)") from None


def bloom_reject_count(out_dir: str, recs: list, eq: dict) -> int:
    """Distributed count of chunks whose Bloom sections reject ``eq``
    ({col: value | [values]}) — header+filter bytes only, one probe task
    batch per item block. The shared observability probe for the CLI
    scan-stats command and the bloom_pruned_lookup query."""
    import ray

    from ..encode import chunk_bloom_rejects

    if not recs:
        return 0
    items = [{"path": os.path.join(out_dir, r.chunk_file)} for r in recs]

    def probe(b: pa.Table) -> pa.Table:
        n = sum(chunk_bloom_rejects(p, eq)
                for p in b.column("path").to_pylist())
        return pa.table({"n": pa.array([n], pa.int64())})

    return sum(r["n"] for r in ray.data.from_items(items)
               .map_batches(probe, batch_format="pyarrow").take_all())


def require_store(out_dir: str) -> None:
    """Loud-fail guard for READ-ONLY store consumers (verify / decode /
    scan-stats): a typo'd path must not read as a healthy EMPTY store —
    verify would pass vacuously and decode would write an empty parquet.
    Same policy gc/store-stats/consolidate already enforce. Encode does
    NOT call this: a fresh out_dir is its normal starting state."""
    from ..manifest import manifest_dir

    if not os.path.isdir(manifest_dir(out_dir)):
        raise ValueError(
            f"{out_dir!r} is not an encoded store (no _manifest) — "
            f"refusing to treat it as empty")


def _preserve_order():
    """Scoped preserve_order=True: Datasets SNAPSHOT the DataContext at
    creation, so every Dataset built inside this context keeps its block
    order through the streaming executor, while later pipelines in the
    process are untouched (a leaked True degrades every subsequent
    pipeline's throughput — the reason this is a try/finally scope, now
    single-sourced instead of hand-rolled per call site)."""
    import contextlib

    import ray

    @contextlib.contextmanager
    def cm():
        ctx = ray.data.DataContext.get_current()
        prev = ctx.execution_options.preserve_order
        ctx.execution_options.preserve_order = True
        try:
            yield
        finally:
            ctx.execution_options.preserve_order = prev

    return cm()


# work-item schemas of the streamed index read, shared by decode (keyed:
# input-order sort restored from fragment identity) and verify — ONE
# definition each so the streamed and overlay-extra sides can never drift
# into a union schema mismatch
_KEYED_SCHEMA = pa.schema([("path", pa.string()),
                           ("sk_path", pa.string()),
                           ("sk_rg", pa.int64()),
                           ("sk_rs", pa.int64())])
_VERIFY_ITEM_SCHEMA = pa.schema([
    ("partition_id", pa.string()), ("chunk", pa.string()),
    ("sources", pa.string()), ("num_rows", pa.int64())])
_OVERLAY_SCAN_SCHEMA = pa.schema([
    ("partition_id", pa.string()), ("path", pa.string()),
    ("sources", pa.string()), ("num_rows", pa.int64()),
    ("sk_path", pa.string()), ("sk_rg", pa.int64()), ("sk_rs", pa.int64()),
    ("interacting", pa.bool_()), ("json", pa.string())])


def _overlay_scan(out_dir: str):
    """ONE distributed scan of a sealed index overlaid by JSON deltas,
    shared by decode and verify. (Previously ``overlay_plan`` read and
    json-parsed the full index once to find interacting records and the
    consumer's streamed pass read + parsed it all over again — double
    index I/O and parse CPU on the 10^7-record stores this path exists
    for.) Every index record is classified clean/interacting LOCALLY
    against the delta key sets — interacting iff it shares a
    partition_id or a ``(path, row_group)`` fragment key with a delta,
    which is exactly the old skip set — and the scan emits the parsed
    work-item fields per record plus the raw json of interacting records
    only. The materialized scan (~100 B/record, object store) then
    serves both the driver reconciliation (filter interacting →
    take_all, bounded by the interacting set) and the streamed clean
    work items (filter NOT interacting) without re-reading the index.

    Returns ``(clean_items, extra_records)``: a Dataset of
    ``_OVERLAY_SCAN_SCHEMA`` work items minus the classification columns
    for every non-superseded index record, and the driver
    reconciliation's chosen ``PartitionRecord``s to union back.

    Datasets snapshot the DataContext at CREATION (see decode_dataset's
    preserve_order note), so the scan — and with it the returned
    clean_items, whatever the caller's window — is built order-preserving
    here: decode's bit-identical row-order contract must survive the
    streaming executor even though this helper also serves the
    order-insensitive verify."""
    with _preserve_order():
        return _overlay_scan_inner(out_dir)


def _overlay_scan_inner(out_dir: str):
    import ray

    from ..manifest import delta_keysets, index_path, overlay_reconcile

    deltas, delta_ids, delta_keys = delta_keysets(out_dir)

    def classify(b: pa.Table) -> pa.Table:
        rows = []
        for raw in b.column("json").to_pylist():
            rec = json.loads(raw)
            frag = rec["fragment"]
            frags = frag["merged"] if "merged" in frag else [frag]
            inter = rec["partition_id"] in delta_ids or any(
                (f["path"], f["row_group"]) in delta_keys for f in frags)
            f0 = frags[0]
            rows.append({
                "partition_id": rec["partition_id"],
                "path": os.path.join(out_dir, rec["chunk_file"]),
                "sources": json.dumps(frags),
                "num_rows": int(rec["num_rows"]),
                # input-order sort key recomputed from fragment identity,
                # same rule as PartitionRecord.sort_key (first fragment)
                "sk_path": f0["path"], "sk_rg": int(f0["row_group"]),
                "sk_rs": int(f0.get("row_start", 0)),
                "interacting": inter, "json": raw if inter else None})
        return pa.Table.from_pylist(rows, schema=_OVERLAY_SCAN_SCHEMA)

    scan = (ray.data.read_parquet(index_path(out_dir))
            .map_batches(classify, batch_format="pyarrow")
            .materialize())

    def inter_json(b: pa.Table) -> pa.Table:
        return b.filter(b.column("interacting").combine_chunks()
                        ).select(["json"])

    inter_raw = [r["json"] for r in
                 scan.map_batches(inter_json,
                                  batch_format="pyarrow").take_all()]
    extra = overlay_reconcile(out_dir, deltas, inter_raw)

    def clean_items(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return (b.filter(pc.invert(b.column("interacting")
                                   .combine_chunks()))
                .drop_columns(["interacting", "json"]))

    return scan.map_batches(clean_items, batch_format="pyarrow"), extra


_UNSEALED_SCAN_SCHEMA = pa.schema([
    ("fkey", pa.string()), ("first", pa.bool_()), ("merged", pa.int8()),
    ("f_rs", pa.int64()), ("f_end", pa.int64()),
    ("partition_id", pa.string()), ("path", pa.string()),
    ("sources", pa.string()), ("num_rows", pa.int64()),
    ("sk_path", pa.string()), ("sk_rg", pa.int64()), ("sk_rs", pa.int64())])


_B_SCHEMA = pa.schema([
    ("f0_key", pa.string()), ("f0_rs", pa.int64()),
    ("last_key", pa.string()), ("cm_end", pa.int64()),
    ("overlaps", pa.list_(pa.string()))])


def _overlap_keys(items) -> set:
    """The ``fkey`` values whose ``[f_rs, f_end)`` claims OVERLAP, over a
    Dataset with those three columns — found with no per-group Python: a
    distributed sort by (fkey, f_rs), a vectorized adjacent check per
    block (``start[i] < segment-cummax(end)[i-1]`` within a key), and ONE
    summary row per block stitched on the driver, so only true overlaps
    plus O(blocks) boundary facts ever leave the cluster.

    Boundary exactness without any execution-order assumption:
    ``batch_size=None`` makes each batch exactly one block (intra-block
    row order is intrinsic to the block, not to the streaming executor),
    blocks of a sorted dataset are disjoint consecutive ranges, and each
    summary row carries its block's own first (fkey, f_rs) — the driver
    re-sorts the summaries by that key, so arrival order is irrelevant.
    A key continuing into the next block can only overlap through that
    block's FIRST row: starts are sorted, so if the first row clears the
    running cross-block cummax(end), every later row of the key does
    too."""
    import numpy as np
    import pandas as pd

    def block_overlaps(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return pa.Table.from_pylist([], schema=_B_SCHEMA)
        kv = b.column("fkey").to_pandas().to_numpy()
        rs = b.column("f_rs").to_numpy(zero_copy_only=False)
        en = b.column("f_end").to_numpy(zero_copy_only=False)
        new = np.empty(n, bool)
        new[0] = True
        new[1:] = kv[1:] != kv[:-1]
        seg = np.cumsum(new) - 1
        segcm = pd.Series(en).groupby(seg).cummax().to_numpy()
        hit = np.zeros(n, bool)
        hit[1:] = (~new[1:]) & (rs[1:] < segcm[:-1])
        return pa.Table.from_pylist([{
            "f0_key": kv[0], "f0_rs": int(rs[0]),
            "last_key": kv[-1], "cm_end": int(segcm[-1]),
            # true overlaps only — tiny
            "overlaps": sorted({str(k) for k in kv[hit]}),
        }], schema=_B_SCHEMA)

    summary = (items.sort(["fkey", "f_rs"])
               .map_batches(block_overlaps, batch_format="pyarrow",
                            batch_size=None)
               .take_all())
    out: set = set()
    last: tuple | None = None  # (key, running cummax end) across blocks
    # driver-side reorder by each block's own first sort key — blocks of
    # a sorted dataset are disjoint ranges, so this reconstructs dataset
    # order no matter how the executor emitted them
    for r in sorted(summary, key=lambda r: (r["f0_key"], r["f0_rs"])):
        out.update(r["overlaps"])
        if (last is not None and last[0] == r["f0_key"]
                and r["f0_rs"] < last[1]):
            out.add(r["f0_key"])
        if last is not None and last[0] == r["last_key"]:
            last = (r["last_key"], max(last[1], r["cm_end"]))
        else:
            last = (r["last_key"], r["cm_end"])
    return out


def _unsealed_scan(out_dir: str):
    """Streamed work items for a NEVER-consolidated store (sharded
    per-partition JSON records, no index) — same ``(clean_items,
    extra_records)`` contract as ``_overlay_scan``. The driver holds only
    the shard-dir list (≤4096 paths); record files are opened and parsed
    inside read tasks, one row per (record, source fragment).

    Exactness vs ``effective_records``: overlap resolution only ever
    rejects a record whose claimed ROW INTERVAL overlaps another claim on
    the same ``(path, row_group)`` key, so a record is CONTESTED iff some
    key it claims has a merged claimant (compaction in flight / crashed)
    or two claims with overlapping intervals. Everything else streams:
    a clean record is plain, conflicts with nothing, and ``is_complete``
    is only checked for merged records — the global two-pass algorithm
    always chooses it. Interval-DISJOINT multi-claimant keys (a store
    encoded with ``max_rows_per_partition`` slices every row group) stay
    clean. Overlaps are found with no per-group Python: a distributed
    sort by (fkey, f_rs), a vectorized adjacent check per block
    (``start[i] < segment-cummax(end)[i-1]``), and 2 summary rows per
    block stitched on the driver (a key continuing into the next block
    can only overlap through the block's FIRST row, since starts are
    sorted). Contested records re-read from their shard files on the
    driver (``record_path`` is derivable from the partition id), so the
    scan never pins raw JSON. Torn records are skipped in-task (same
    re-encode policy as ``load_delta_records``). Pathology: a store
    mid-way through a huge compaction degrades the contested set toward
    the full store — run ``consolidate`` and take the sealed path.

    Like ``_overlay_scan``, built under preserve_order=True (Datasets
    snapshot the DataContext at creation): decode needs the returned
    clean_items order-preserving. (The overlap detector itself no longer
    cares — its block stitching is order-independent by construction.)"""
    with _preserve_order():
        return _unsealed_scan_inner(out_dir)


def _unsealed_scan_inner(out_dir: str):
    import ray

    from ..manifest import (PartitionRecord, manifest_dir,
                            overlay_reconcile, record_path)

    mdir = manifest_dir(out_dir)
    shards = sorted(os.path.join(mdir, d) for d in os.listdir(mdir)
                    if d.startswith("shard-"))

    def read_shard(b: pa.Table) -> pa.Table:
        rows = []
        for sd in b.column("shard").to_pylist():
            try:
                names = sorted(os.listdir(sd))
            except FileNotFoundError:
                # vanished shard dir (concurrent gc of an emptied shard)
                # — the driver path's isdir() guard skips exactly this.
                # Any OTHER OSError (permissions, I/O) propagates and
                # fails the read task loudly: swallowing it here would
                # silently drop every partition in the shard from decode
                # and let verify pass vacuously over the survivors.
                continue
            for name in names:
                if not (name.startswith("part-")
                        and name.endswith(".json")):
                    continue
                # open/read errors propagate (driver parity:
                # load_delta_records catches only decode/Type errors —
                # an unreadable-but-present record is NOT "torn")
                with open(os.path.join(sd, name)) as f:
                    raw = f.read()
                try:
                    rec = PartitionRecord(**json.loads(raw))
                except (json.JSONDecodeError, TypeError):
                    continue  # torn record → partition re-encodes
                frags = rec.source_fragments
                merged = 1 if "merged" in rec.fragment else 0
                f0 = frags[0]
                base = {
                    "merged": merged,
                    "partition_id": rec.partition_id,
                    "path": os.path.join(out_dir, rec.chunk_file),
                    "sources": json.dumps(frags),
                    "num_rows": int(rec.num_rows),
                    "sk_path": f0["path"], "sk_rg": int(f0["row_group"]),
                    "sk_rs": int(f0.get("row_start", 0))}
                for i, fr in enumerate(frags):
                    rs = int(fr.get("row_start", 0))
                    # a legacy fragment without num_rows claims its whole
                    # row group — same default as effective_records
                    rows.append({
                        "fkey": f"{fr['path']}\x00{fr['row_group']}",
                        "first": i == 0,
                        "f_rs": rs,
                        "f_end": rs + int(fr.get("num_rows", 1 << 62)),
                        **base})
        return pa.Table.from_pylist(rows, schema=_UNSEALED_SCAN_SCHEMA)

    scan = (ray.data.from_items([{"shard": sd} for sd in shards])
            .map_batches(read_shard, batch_format="pyarrow",
                         batch_size=16)
            .materialize())

    # contested keys, part 1: any key a merged record claims — pulled
    # set bounded by in-flight/crashed compactions
    def merged_keys(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(pc.greater(b.column("merged").combine_chunks(),
                                   0)).select(["fkey"])

    contested_keys = {r["fkey"] for r in
                      scan.map_batches(merged_keys,
                                       batch_format="pyarrow").take_all()}

    # part 2: keys whose plain claims genuinely overlap
    contested_keys |= _overlap_keys(scan)

    extra: list = []
    contested_pids: set = set()
    if contested_keys:
        key_arr = pa.array(sorted(contested_keys))  # built ONCE, not
        # per batch — ships with the closure

        def pids_of_contested(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            mask = pc.is_in(b.column("fkey").combine_chunks(),
                            value_set=key_arr)
            return b.filter(mask).select(["partition_id"])

        contested_pids = {r["partition_id"] for r in
                          scan.map_batches(pids_of_contested,
                                           batch_format="pyarrow")
                          .take_all()}

        # contested record JSON re-read directly (record_path is a pure
        # function of the partition id) — bounded by true conflicts
        inter_raw = []
        for pid in sorted(contested_pids):
            try:
                with open(record_path(out_dir, pid)) as f:
                    inter_raw.append(f.read())
            except OSError as ex:
                # the record parsed fine inside the scan seconds ago — a
                # vanished file means a concurrent consolidate/compact/gc
                # mutated the store mid-read; silently dropping it would
                # lose rows from decode and vacuously pass verify
                raise RuntimeError(
                    f"manifest record for contested partition {pid!r} "
                    f"disappeared during the streamed read ({ex}); the "
                    "store was mutated concurrently — re-run the read "
                    "(or consolidate first)") from ex
        # no deltas here — the whole store IS the json layout; the exact
        # reconciliation runs over the contested records alone
        extra = overlay_reconcile(out_dir, {}, inter_raw)

    pid_arr = (pa.array(sorted(contested_pids))
               if contested_pids else None)

    def clean_items(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = b.column("first").combine_chunks()
        if pid_arr is not None:
            mask = pc.and_(mask, pc.invert(pc.is_in(
                b.column("partition_id").combine_chunks(),
                value_set=pid_arr)))
        return b.filter(mask).drop_columns(
            ["fkey", "first", "merged", "f_rs", "f_end"])

    return scan.map_batches(clean_items, batch_format="pyarrow"), extra


def decode_dataset(out_dir: str, columns: list[str] | None = None,
                   zone_filter: dict | None = None,
                   schema: pa.Schema | None = None,
                   stream_index: bool | None = None):
    """Ray Dataset over the encoded chunks → decoded Arrow rows (streaming).

    ``zone_filter`` {col: (lo, hi)} (inclusive range) or {col: [v1, ...]}
    (IN-list; a LIST is a value set, a TUPLE is a range) prunes whole
    chunks via manifest zone maps (skipped chunks are never opened), then
    applies the exact row filter to the surviving chunks. Equality and
    IN-list predicates additionally consult per-chunk Bloom filters
    inside the read tasks when the store was encoded with
    ``bloom_columns``.

    ``schema`` enables read-time schema evolution: decoded batches are
    aligned to the target (missing columns null-filled, types cast,
    column order normalized) — old chunks stay readable after the logical
    schema gains columns or widens types."""
    import ray

    from ..manifest import (index_path, stream_eligible,
                            stream_eligible_overlay,
                            stream_eligible_unsealed)

    require_store(out_dir)
    items: list[dict] | None
    overlay: tuple | None = None
    zone_stream = False
    if zone_filter and stream_eligible(out_dir, stream_index):
        # zone-pruned read of a sealed store: the prune itself runs
        # inside the index-scan tasks (one _zones_alive per record) —
        # the driver never holds the record list, only the tiny
        # distributed ts-column aggregate needed to validate bounds
        items = None
        zone_stream = True
        _validate_zone_bounds_streamed(out_dir, zone_filter)
    elif zone_filter:
        all_recs = effective_records(out_dir)
        validate_zone_bounds(all_recs, zone_filter)
        recs, _ = zone_prune(out_dir, zone_filter, recs=all_recs)
        items = [{"path": os.path.join(out_dir, rec.chunk_file)}
                 for rec in recs]
    elif stream_eligible(out_dir, stream_index):
        # sealed index, no deltas, big enough: the work-item list never
        # materializes on the driver — chunk paths stream straight off
        # the index's row groups (at 10^7 partitions a from_items list
        # is GBs of driver heap). Index rows are stored in input order,
        # so decode order is identical to the reconciliation path's.
        items = None
    elif stream_eligible_overlay(out_dir, stream_index):
        # sealed index WITH newer JSON deltas (the steady state of a huge
        # evolving store): stream the index like the sealed path, dropping
        # rows the small driver-reconciled delta overlay supersedes, then
        # merge the overlay's chosen records back by input-order sort key
        # — a distributed sort of tiny (path, key) work items, never a
        # driver from_items of the full store
        items = None
        overlay = _overlay_scan(out_dir)
    elif stream_eligible_unsealed(out_dir, stream_index):
        # never-consolidated store big enough to stream: shard JSON
        # records are read and classified inside tasks; only contested
        # records (a compaction in flight / crashed) reconcile on the
        # driver — a fresh 10^7-partition encode decodes with no driver
        # record list at all
        items = None
        overlay = _unsealed_scan(out_dir)
    else:
        # input order is recomputed from the recorded fragment identity
        # (path, row_group, row_start) — stable under appends, unlike ids;
        # effective_records resolves merged/plain overlap after a crashed
        # compaction
        recs = effective_records(out_dir)
        items = [{"path": os.path.join(out_dir, rec.chunk_file)}
                 for rec in recs]

    from ..encode import read_chunk_file

    # the exact row filter needs the filtered columns even when the
    # caller's projection omits them — read them too, filter, THEN project
    # (skipping the filter for unprojected columns returned whole chunks)
    read_cols = columns
    filter_only_cols: list[str] = []
    if columns is not None and zone_filter:
        filter_only_cols = [c for c in zone_filter if c not in columns]
        if filter_only_cols:
            read_cols = list(columns) + filter_only_cols
    # tolerate absent columns only where absence is legitimate: filter
    # columns an old chunk may lack, or read-time schema evolution — a
    # plain typo'd projection should still fail loudly
    missing_ok = bool(filter_only_cols) or (schema is not None)

    # equality (lo == hi) and IN-list predicates additionally consult
    # the chunks' Bloom filters inside the read tasks: a chunk whose
    # filter rejects every candidate value skips its body at
    # header+filter I/O cost (codecs.bloom) — the pruning zone maps
    # can't do on unsorted high-cardinality columns
    def _eq_values(bound):
        if isinstance(bound, list):
            vs = [v for v in bound if v is not None]
            return vs or None
        lo, hi = bound
        return [lo] if lo is not None and lo == hi else None

    eq_prune = None
    if zone_filter:
        eq_prune = {c: vs for c, b in zone_filter.items()
                    if (vs := _eq_values(b)) is not None} or None

    def decode_item(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        tables = []
        for path in batch.column("path").to_pylist():
            t = read_chunk_file(path, columns=read_cols,
                                missing_ok=missing_ok, eq_prune=eq_prune)
            # missing_ok covers filter-only columns an old chunk may
            # legitimately lack; without read-time schema evolution the
            # CALLER's projection must still resolve — fail loudly on a
            # typo'd column instead of silently dropping it
            if missing_ok and schema is None and columns is not None:
                absent = [c for c in columns if c not in t.column_names]
                if absent:
                    raise KeyError(
                        f"projected column(s) {absent} absent from chunk "
                        f"{os.path.basename(path)}; pass schema= for "
                        f"read-time schema evolution")
            if zone_filter:
                mask = None
                for col, bound in zone_filter.items():
                    if col not in t.column_names:
                        # schema evolution: a chunk written before this
                        # column existed has it all-null for every row,
                        # and a null never satisfies a range predicate
                        # (fill_null(mask, False) below) — exclude the
                        # chunk's rows, matching the explicit-null case
                        t = t.slice(0, 0)
                        mask = None
                        break
                    c = t.column(col)

                    def _bound(v):
                        # bounds arrive as int/float/str from the CLI; cast
                        # to the column type before comparing. A
                        # numeric-looking bound against a temporal column
                        # (ts=2024,2025) passes the lexical zone prune but
                        # must not crash the exact row filter — cast its
                        # string form, and fail with a usable message if
                        # the type can't parse it.
                        if v is None:
                            return None
                        if pa.types.is_temporal(c.type):
                            s = str(v)
                            try:
                                return pa.scalar(s).cast(c.type)
                            except (pa.ArrowInvalid,
                                    pa.ArrowNotImplementedError):
                                raise ValueError(
                                    f"zone-filter bound {v!r} is not a "
                                    f"full literal for column {col!r} of "
                                    f"type {c.type} (use e.g. "
                                    f"2024-01-01T00:00:00)") from None
                        if isinstance(v, (int, float)):
                            return v
                        try:
                            return pa.scalar(v).cast(c.type)
                        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                            return v

                    if isinstance(bound, list):
                        # IN-list: exact membership (nulls never match).
                        # Cast per value; one the column type can't
                        # represent (2.5 against int64) simply never
                        # matches — SQL IN semantics, and the same answer
                        # the bloom path gives — instead of an uncaught
                        # lossy-cast error killing the read task.
                        vals = []
                        for v in bound:
                            if v is None:
                                continue
                            b_v = _bound(v)
                            if isinstance(b_v, pa.Scalar):
                                b_v = b_v.as_py()
                            try:
                                try:
                                    conv = pa.array([b_v], type=c.type)[0]
                                except (pa.ArrowInvalid, pa.ArrowTypeError,
                                        pa.ArrowNotImplementedError,
                                        TypeError):
                                    conv = pa.array([b_v]).cast(c.type)[0]
                            except (pa.ArrowInvalid, pa.ArrowTypeError,
                                    pa.ArrowNotImplementedError, TypeError,
                                    OverflowError):
                                continue  # unrepresentable: never present
                            # typed construction is PERMISSIVE (2.5 →
                            # int64 silently truncates to 2); only values
                            # that survive the round trip can match
                            if conv.as_py() == b_v:
                                vals.append(conv.as_py())
                        vset = pa.array(vals, type=c.type)
                        m = pc.is_in(c, value_set=vset)
                    else:
                        lo, hi = bound
                        lo_c, hi_c = _bound(lo), _bound(hi)
                        m = pc.and_kleene(
                            pc.greater_equal(c, lo_c) if lo_c is not None
                            else pc.is_valid(c),
                            pc.less_equal(c, hi_c) if hi_c is not None
                            else pc.is_valid(c))
                    mask = m if mask is None else pc.and_kleene(mask, m)
                if mask is not None:
                    t = t.filter(pc.fill_null(mask, False))
                if columns is not None:  # drop the filter-only columns
                    t = t.select([c for c in columns
                                  if c in t.column_names])
            if schema is not None:
                from ..schema_infer import align_table

                t = align_table(t, schema)
            tables.append(t)
        return pa.concat_tables(tables)

    if items is not None and not items:
        import pandas as pd

        return ray.data.from_pandas(pd.DataFrame())

    def index_to_paths(b: pa.Table) -> pa.Table:
        paths = []
        for r in b.column("json").to_pylist():
            rec = json.loads(r)
            if zone_stream and not _zones_alive(rec["columns"],
                                                zone_filter):
                continue  # zone-pruned inside the scan task
            paths.append(os.path.join(out_dir, rec["chunk_file"]))
        return pa.table({"path": pa.array(paths, pa.string())})

    def _keyed(r) -> dict:
        # input-order sort key taken from the record itself — ONE rule
        # (PartitionRecord.sort_key), not a fourth hand-rolled copy that
        # could drift from the scan paths' keys
        sk_path, sk_rg, sk_rs = r.sort_key
        return {"path": os.path.join(out_dir, r.chunk_file),
                "sk_path": sk_path, "sk_rg": int(sk_rg),
                "sk_rs": int(sk_rs)}

    def _overlay_paths():
        clean, extra = overlay

        def keyed_only(b: pa.Table) -> pa.Table:
            return b.select(["path", "sk_path", "sk_rg", "sk_rs"])

        ds = clean.map_batches(keyed_only, batch_format="pyarrow")
        if extra:
            ex = pa.Table.from_pylist(
                [_keyed(r) for r in extra], schema=_KEYED_SCHEMA)
            ds = ds.union(ray.data.from_arrow(ex))
        # global input order restored by a distributed sort of the tiny
        # work items (path + key ≈ 100 B/partition) — the rows themselves
        # never leave the downstream streaming decode
        return (ds.sort(["sk_path", "sk_rg", "sk_rs"])
                .map_batches(lambda b: b.select(["path"]),
                             batch_format="pyarrow"))

    # decode is the ordering-sensitive pipeline (bit-identical round-trip
    # preserves input row order); Ray's streaming executor reorders output
    # blocks unless preserve_order is set — see _preserve_order
    with _preserve_order():
        if items is not None:
            paths = ray.data.from_items(items)
        elif overlay is not None:
            paths = _overlay_paths()
        else:
            paths = (ray.data.read_parquet(index_path(out_dir))
                     .map_batches(index_to_paths, batch_format="pyarrow"))
        return paths.map_batches(
            decode_item, batch_size=1, batch_format="pyarrow"
        )


def cluster_job(input_paths: list[str] | str, out_dir: str,
                by: list[str], *, staging_dir: str | None = None,
                keep_staging: bool = True, **encode_kwargs) -> dict:
    """Sort-cluster then encode: a DISTRIBUTED ``Dataset.sort`` over the
    cluster columns, staged as parquet shards, then the normal
    ``encode_job`` — so the cluster columns' zone maps become disjoint
    across chunks and range/equality scans prune instead of opening
    everything (the scale path for predicate-heavy stores; pair with
    ``bloom_columns`` for the columns you did NOT cluster by).

    The staging parquet is the sort's materialization boundary; encode
    resume/content-addressing applies to the encode phase against that
    staging. A completed staging is REUSED on re-run (matched by a
    fingerprint of the inputs and sort keys written after the sort
    finishes), so a job killed mid-encode resumes against identical
    staging paths. When staging must be regenerated (first run, inputs
    or keys changed, staging deleted), any existing ``out_dir`` manifest
    is cleared first: Ray's parquet writer names shards per-execution,
    so records from a previous staging generation would never be claimed
    by resume and would DUPLICATE every row on decode.
    """
    import hashlib
    import shutil

    import ray

    paths = [input_paths] if isinstance(input_paths, str) else list(input_paths)
    files: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            files.extend(os.path.join(p, f) for f in sorted(os.listdir(p))
                         if f.endswith(".parquet"))
        else:
            files.append(p)
    # fingerprint includes mtime_ns: a same-size in-place rewrite of an
    # input must invalidate the staged sort, not silently reuse stale data
    fp = hashlib.sha1(json.dumps(
        {"by": list(by),
         "inputs": sorted((f, os.path.getsize(f), os.stat(f).st_mtime_ns)
                          for f in files)},
        sort_keys=True).encode()).hexdigest()

    staged = staging_dir or (out_dir.rstrip("/") + "_staged")
    marker = os.path.join(staged, "_staging_complete.json")
    reuse = False
    if os.path.exists(marker):
        try:
            with open(marker) as f:
                reuse = json.load(f).get("fingerprint") == fp
        except (OSError, json.JSONDecodeError):
            reuse = False
    if not reuse:
        shutil.rmtree(staged, ignore_errors=True)
        shutil.rmtree(out_dir, ignore_errors=True)  # stale-generation records
        ray.data.read_parquet(paths).sort(by).write_parquet(staged)
        write_atomic(marker, json.dumps({"fingerprint": fp}).encode())
    summary = encode_job(staged, out_dir, **encode_kwargs)
    summary["clustered_by"] = list(by)
    if keep_staging:
        # staging is the store's recorded SOURCE: verify_job compares
        # chunks against it and encode resume re-reads it — keep it until
        # the store is verified (the default), then callers may delete
        summary["staging_dir"] = staged
    else:
        shutil.rmtree(staged, ignore_errors=True)
    return summary


def compact_job(out_dir: str, min_rows: int = 100_000,
                optimize: str | None = None) -> dict:
    """Merge runs of small chunks into bigger ones (manifest rewrite).

    Consecutive (input-order) chunks are greedily grouped until the group
    reaches ``min_rows``; each group decodes its member chunks, re-encodes
    the concatenation with a fresh codec plan, and commits ONE merged
    record whose ``fragment`` lists all covered source fragments — so
    verify/resume/decode-order keep working (resume marks every covered
    fragment done). Old records+chunks are deleted only after the merged
    chunk is durable; a crash mid-compaction leaves either the old or the
    new state valid. Merging runs distributed (one task per group).

    Merged chunks re-plan under the store's RECORDED planner mode (see
    ``record_store_optimize``) — compacting a size-optimized archival
    store must not silently re-encode its text back to balanced codecs.
    Pass ``optimize`` explicitly to override."""
    import hashlib

    import ray

    if optimize is None:
        optimize = load_store_optimize(out_dir)
    elif optimize not in ("balanced", "size"):
        raise ValueError(f"unknown optimize mode: {optimize!r}")

    recs = effective_records(out_dir)
    groups: list[list[PartitionRecord]] = []
    cur: list[PartitionRecord] = []
    cur_rows = 0
    for rec in recs:
        if rec.num_rows >= min_rows:
            if len(cur) > 1:
                groups.append(cur)
            cur, cur_rows = [], 0
            continue
        cur.append(rec)
        cur_rows += rec.num_rows
        if cur_rows >= min_rows:
            groups.append(cur)
            cur, cur_rows = [], 0
    if len(cur) > 1:
        groups.append(cur)
    groups = [g for g in groups if len(g) > 1]
    if not groups:
        return {"groups": 0, "chunks_before": len(recs),
                "chunks_after": len(recs)}

    items = [{"group": json.dumps([
        {"chunk": os.path.join(out_dir, r.chunk_file),
         "sources": r.source_fragments, "partition_id": r.partition_id}
        for r in g])} for g in groups]

    def merge(batch: pa.Table) -> pa.Table:
        from ..manifest import shard_of

        out = []
        for gjson in batch.column("group").to_pylist():
            members = json.loads(gjson)
            t0 = time.time()
            tables = []
            sources: list[dict] = []
            bloom_cols: set[str] = set()
            for m in members:
                with open(m["chunk"], "rb") as f:
                    blob_in = f.read()
                hdr_base = read_chunk_header(blob_in)  # parsed ONCE
                tables.append(decode_table(blob_in, verify_crc=True,
                                           header_base=hdr_base))
                # preserve the members' bloom configuration: a column
                # bloomed in ANY member stays bloomed in the merged chunk
                bloom_cols.update(c["name"] for c in hdr_base[0]["columns"]
                                  if "bloom_offset" in c)
                sources.extend(m["sources"])
            merged = pa.concat_tables(tables).combine_chunks()
            stats = compute_stats_table(merged)
            plan = plan_from_stats(stats, merged.schema, optimize=optimize)
            blob, header = encode_table(merged, plan,
                                        bloom_columns=sorted(bloom_cols))
            # full paths: basename-only ids collide across same-named shards
            sid = ";".join(
                f"{s['path']}#rg{s['row_group']}"
                f"[{s.get('row_start', 0)}+{s['num_rows']}]" for s in sources)
            pid = hashlib.sha1(sid.encode()).hexdigest()[:16]
            chunk_file = os.path.join(shard_of(pid), f"part-{pid}.rde")
            write_atomic(os.path.join(out_dir, chunk_file), blob)
            zones = _zone_maps(merged)  # once — not once per column
            rec = PartitionRecord(
                partition_id=pid,
                fragment={"merged": sources},
                num_rows=merged.num_rows,
                chunk_file=chunk_file,
                chunk_size=len(blob),
                columns=[{"name": c["name"], "codec": c["codec"],
                          "size": c["size"], "offset": c["offset"],
                          "crc32": c["crc32"],
                          **zones.get(c["name"], {})}
                         for c in header["columns"]],
                wall_time_s=time.time() - t0,
            )
            write_record(out_dir, rec)
            out.append({"partition_id": pid, "merged_n": len(members),
                        "num_rows": merged.num_rows})
        return pa.Table.from_pylist(out)

    results = ray.data.from_items(items).map_batches(
        merge, batch_size=1, batch_format="pyarrow").take_all()

    # all merged chunks durable → retire the old records (JSON delta or
    # consolidated-index resident) and chunk files
    from ..manifest import retire_records

    retire_records(out_dir, {r.partition_id for g in groups for r in g})
    for g in groups:
        for r in g:
            try:
                os.remove(os.path.join(out_dir, r.chunk_file))
            except OSError:
                pass
    return {"groups": len(groups),
            "chunks_before": len(recs),
            "chunks_after": len(recs) - sum(len(g) for g in groups) + len(groups),
            "merged": results}


def store_stats(out_dir: str) -> dict:
    """Store-level metrics from manifest records alone (no chunk reads):
    per-column codec distribution and encoded bytes, plus chunk/row
    totals and recorded encode wall time — the 'metrics' half of the
    north rule's per-partition lineage + metrics. Works on JSON-delta
    and consolidated-index manifests alike. A keyed store (a
    ``_keyed_manifest``) reports per-key chunk/row totals (keyed records
    carry no per-column codec metadata); a dir holding BOTH manifests —
    valid, gc handles it — reports the keyed side under ``keyed``."""
    from ..manifest import manifest_dir
    from .keyed_store import _manifest_dir as _keyed_mdir
    from .keyed_store import keyed_manifest

    has_main = os.path.isdir(manifest_dir(out_dir))
    has_keyed = os.path.isdir(_keyed_mdir(out_dir))
    if not (has_main or has_keyed):
        # same guard as gc/consolidate: a typo'd path must not read as a
        # healthy empty store
        raise ValueError(
            f"store-stats: {out_dir!r} has no _manifest — not an "
            f"encoded store")
    keyed_out = None
    if has_keyed:
        krecs = keyed_manifest(out_dir)
        keys: dict[str, dict] = {}
        for r in krecs:
            st = keys.setdefault(r["key"], {"chunks": 0, "rows": 0,
                                            "chunk_bytes": 0})
            st["chunks"] += 1
            st["rows"] += int(r["num_rows"])
            st["chunk_bytes"] += int(r["chunk_size"])
        keyed_out = {"chunks": len(krecs),
                     "rows": sum(int(r["num_rows"]) for r in krecs),
                     "chunk_bytes": sum(int(r["chunk_size"])
                                        for r in krecs),
                     "keys": dict(sorted(keys.items()))}
        if not has_main:
            return keyed_out
    recs = effective_records(out_dir)
    cols: dict[str, dict] = {}
    for rec in recs:
        for c in rec.columns:
            st = cols.setdefault(c["name"],
                                 {"codecs": {}, "encoded_bytes": 0})
            st["codecs"][c["codec"]] = st["codecs"].get(c["codec"], 0) + 1
            st["encoded_bytes"] += int(c["size"])
    total_bytes = sum(r.chunk_size for r in recs)
    for st in cols.values():
        st["pct_of_store"] = round(100 * st["encoded_bytes"]
                                   / max(total_bytes, 1), 2)
        st["codecs"] = dict(sorted(st["codecs"].items()))
    out = {"chunks": len(recs),
           "rows": sum(r.num_rows for r in recs),
           "chunk_bytes": total_bytes,
           "encode_wall_s": round(sum(r.wall_time_s for r in recs), 3),
           "columns": dict(sorted(cols.items()))}
    if keyed_out is not None:
        out["keyed"] = keyed_out
    return out


def gc_job(out_dir: str, dry_run: bool = False) -> dict:
    """Reclaim orphaned bytes from an encoded store (main or keyed).

    Orphans arise from three crash/rewrite windows, none of which affect
    READ correctness (``effective_records`` / the keyed manifest already
    refuse to decode the losers) but all of which strand chunk bytes:

    * ``compact_job`` killed between committing merged records and
      retiring the old ones — the superseded plain records lose manifest
      reconciliation but their records + chunks stay on disk;
    * ``keyed_encode`` re-encodes — each encode writes its chunks under
      a fresh ``gen-N`` dir and the manifest swap points reads at the
      new generation only (keyed_store.py), so the previous
      generation's chunks become unreferenced; a keyed_encode killed
      mid-run also leaves an uncommitted ``_keyed_manifest.new``
      staging dir (its partial gen dir is unreferenced too);
    * torn ``write_atomic`` temps (``*.tmp.<pid>``) from a killed task.

    Deletes, in order: manifest records that lost reconciliation, then
    every ``*.rde`` under ``out_dir`` no surviving record claims, every
    atomic-write temp, stale keyed staging manifests, and now-empty
    shard dirs. OFFLINE operation: run with no concurrent writer —
    encode commits chunk bytes BEFORE the manifest record, so gc racing
    a live job would reclaim a chunk about to be committed.

    ``dry_run`` reports the same counts/bytes without deleting anything
    (records, chunks, temps, and staging dirs all stay in place).
    """
    from ..manifest import manifest_dir, retire_records
    from .keyed_store import _manifest_dir as _keyed_mdir
    from .keyed_store import keyed_manifest

    has_main = os.path.isdir(manifest_dir(out_dir))
    has_keyed = os.path.isdir(_keyed_mdir(out_dir))
    if not has_keyed and os.path.isdir(_keyed_mdir(out_dir) + ".old"):
        # keyed_encode killed between its two commit renames: .old (the
        # previous complete generation) exists and the committed dir is
        # gone, so NO keyed chunk would enter the live set and the sweep
        # would delete a real generation. Refuse — recovery is one
        # rename: .new if present (complete by construction — the swap
        # only starts after the encode finishes, and only the swap
        # removes the committed dir), else .old. A lone PARTIAL .new
        # without .old (job killed mid-encode, nothing committed) is NOT
        # this case: it is uncommitted staging, swept below.
        raise ValueError(
            f"gc: {out_dir!r} has a torn keyed-manifest swap "
            f"(_keyed_manifest missing but .old present) — rename "
            f"_keyed_manifest.new (or .old) to _keyed_manifest first")
    if not (has_main or has_keyed):
        raise ValueError(
            f"gc: {out_dir!r} has neither _manifest nor _keyed_manifest — "
            f"refusing to sweep a directory that is not an encoded store")

    live: set[str] = set()
    records_retired = 0
    if has_main:
        # ONE manifest scan feeds both reconciliation and the stale set
        m = load_manifest(out_dir)
        eff = {r.partition_id for r in effective_records(out_dir,
                                                         manifest=m)}
        stale: set[str] = set()
        for pid, rec in m.items():
            if pid in eff:
                live.add(os.path.normpath(rec.chunk_file))
            else:
                # lost reconciliation (stale generation / torn merge):
                # retire the record; its chunk falls to the sweep below
                stale.add(pid)
        records_retired = (len(stale) if dry_run
                           else retire_records(out_dir, stale)) if stale \
            else 0
    staging_removed = 0
    if has_keyed:
        live |= {os.path.normpath(r["chunk_file"])
                 for r in keyed_manifest(out_dir)}
    # stale staging manifests are removed whether or not a committed
    # keyed manifest exists (a mixed main+keyed dir can hold a lone
    # partial .new from a first keyed_encode killed mid-run); the
    # torn-swap guard above already excluded the dangerous .old case
    staging_roots: list[str] = []
    for suffix in (".new", ".old"):
        stale = _keyed_mdir(out_dir) + suffix
        if os.path.isdir(stale):
            if not dry_run:
                import shutil

                shutil.rmtree(stale, ignore_errors=True)
            staging_removed += 1
            staging_roots.append(stale)

    chunks_deleted = tmps_deleted = 0
    bytes_reclaimed = 0
    for root, dirs, files in os.walk(out_dir, topdown=False):
        # staging dirs are accounted under staging_dirs_removed; in a
        # dry run they still exist — skip their contents so the report
        # matches what the real run (rmtree before the walk) reports
        if any(root == s or root.startswith(s + os.sep)
               for s in staging_roots):
            continue
        for name in files:
            p = os.path.join(root, name)
            rel = os.path.normpath(os.path.relpath(p, out_dir))
            victim = None
            if ".tmp." in name:
                victim = "tmp"
            elif name.endswith(".rde") and rel not in live:
                victim = "chunk"
            if victim:
                try:
                    sz = os.path.getsize(p)
                    if not dry_run:
                        os.remove(p)
                except OSError:
                    continue
                bytes_reclaimed += sz
                if victim == "chunk":
                    chunks_deleted += 1
                else:
                    tmps_deleted += 1
        # drop shard/generation dirs the sweep emptied (topdown=False:
        # children first, so an emptied gen-N goes after its shards)
        if not dry_run and os.path.basename(root).startswith(
                ("shard-", "gen-")):
            try:
                os.rmdir(root)
            except OSError:
                pass
    return {"chunks_deleted": chunks_deleted,
            "bytes_reclaimed": bytes_reclaimed,
            "records_retired": records_retired,
            "tmps_deleted": tmps_deleted,
            "staging_dirs_removed": staging_removed,
            "chunks_live": len(live),
            "dry_run": dry_run}


def verify_job(out_dir: str, stream_index: bool | None = None) -> dict:
    """Distributed bit-identical verification: decode every chunk and compare
    against its recorded input fragment. Returns {partitions, ok, failed:[...]}.

    On a sealed consolidated store past STREAM_INDEX_MIN_ROWS (or with
    ``stream_index=True``), work items stream off the index's row groups
    (no driver-built list). Only FAILURES ever reach the driver either
    way — totals aggregate distributed.
    """
    import ray

    from ..manifest import (index_path, stream_eligible,
                            stream_eligible_overlay,
                            stream_eligible_unsealed)

    require_store(out_dir)
    use_index = stream_eligible(out_dir, stream_index)
    overlay: tuple | None = None
    if not use_index and stream_eligible_overlay(out_dir, stream_index):
        # sealed index + JSON deltas: ONE shared index scan streams the
        # clean rows and hands the driver-reconciled overlay's chosen
        # records back as extra items (verification is order-insensitive,
        # so no merge-sort is needed here)
        use_index = True
        overlay = _overlay_scan(out_dir)
    elif not use_index and stream_eligible_unsealed(out_dir, stream_index):
        # never-consolidated store: shard JSON records stream off read
        # tasks, only contested records reconcile on the driver
        use_index = True
        overlay = _unsealed_scan(out_dir)
    items = None if use_index else [
        {"partition_id": rec.partition_id,
         "chunk": os.path.join(out_dir, rec.chunk_file),
         "sources": json.dumps(rec.source_fragments),  # ≥2 if compacted
         "num_rows": rec.num_rows}
        for rec in effective_records(out_dir)
    ]

    def index_to_items(b: pa.Table) -> pa.Table:
        rows = []
        for raw in b.column("json").to_pylist():
            rec = json.loads(raw)
            frag = rec["fragment"]
            rows.append({
                "partition_id": rec["partition_id"],
                "chunk": os.path.join(out_dir, rec["chunk_file"]),
                "sources": json.dumps(frag["merged"] if "merged" in frag
                                      else [frag]),
                "num_rows": rec["num_rows"]})
        return pa.Table.from_pylist(rows, schema=_VERIFY_ITEM_SCHEMA)

    def check(batch: pa.Table) -> pa.Table:
        out = []
        for item in batch.to_pylist():
            # a corrupt/unreadable chunk is a *verification failure*, not a
            # job crash — report it in `failed` with the reason
            try:
                with open(item["chunk"], "rb") as f:
                    blob = f.read()
                decoded = decode_table(blob, verify_crc=True)
                # bloom sections get the same bit-rot check as payloads
                # (a corrupt filter won't drop rows — _bloom_rejects
                # refuses to prune on CRC mismatch — but verify should
                # still surface it)
                hdr, base = read_chunk_header(blob)
                for c in hdr["columns"]:
                    if "bloom_offset" in c:
                        fb = blob[base + c["bloom_offset"]:
                                  base + c["bloom_offset"] + c["bloom_size"]]
                        if zlib.crc32(fb) != c["bloom_crc32"]:
                            raise IOError(
                                f"bloom CRC mismatch for column {c['name']}")
                parts = []
                for src in json.loads(item["sources"]):
                    parts.append(read_fragment(
                        src["path"], src["row_group"], src["num_rows"],
                        src.get("row_start", 0)))
                original = pa.concat_tables(parts)
                ok = decoded.equals(original.cast(decoded.schema)
                                    .combine_chunks())
                err = None if ok else "decoded rows differ from source"
            except (ValueError, IOError, OSError, pa.ArrowInvalid) as e:
                ok, err = False, f"{type(e).__name__}: {e}"
            out.append({"partition_id": item["partition_id"], "ok": ok,
                        "err": err})
        return pa.Table.from_pylist(out)

    if items is not None and not items:
        return {"partitions": 0, "ok": 0, "failed": []}
    if overlay is not None:
        clean, extra = overlay

        def overlay_items(b: pa.Table) -> pa.Table:
            return (b.select(["partition_id", "path", "sources",
                              "num_rows"])
                    .rename_columns([f.name for f in _VERIFY_ITEM_SCHEMA]))

        src = clean.map_batches(overlay_items, batch_format="pyarrow")
        if extra:
            src = src.union(ray.data.from_arrow(pa.Table.from_pylist(
                [{"partition_id": r.partition_id,
                  "chunk": os.path.join(out_dir, r.chunk_file),
                  "sources": json.dumps(r.source_fragments),
                  "num_rows": r.num_rows} for r in extra],
                schema=_VERIFY_ITEM_SCHEMA)))
    elif items is None:
        src = (ray.data.read_parquet(index_path(out_dir))
               .map_batches(index_to_items, batch_format="pyarrow"))
    else:
        src = ray.data.from_items(items)
    # materialize pins only the TINY verdict rows; the driver then pulls
    # failures alone (at 10^7 partitions a take_all of every verdict is
    # GBs of driver heap for a normally-empty answer)
    res = src.map_batches(check, batch_size=1,
                          batch_format="pyarrow").materialize()
    total = res.count()

    def only_failures(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(pc.invert(b.column("ok").combine_chunks()))

    failed = [{"partition_id": r["partition_id"], "err": r["err"]}
              for r in res.map_batches(only_failures,
                                       batch_format="pyarrow").take_all()]
    return {"partitions": total, "ok": total - len(failed), "failed": failed}
