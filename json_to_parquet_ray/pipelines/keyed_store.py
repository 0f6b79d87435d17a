"""Key-partitioned encoded store: rows shuffle-partitioned by a column,
HOT keys salted across sub-partitions, one encoded chunk per partition.

This is the north rule's skew handling applied at the storage layer
(BASELINE.json: "salted groupby/repartition" for heavy-hitter keys):

1. an exact, skew-safe per-key count (``salted_group_count`` combiner)
   finds hot keys,
2. every row gets a partition key ``key`` or ``key#s<salt>`` (salt =
   deterministic hash of ``salt_col`` — retry-stable), so a hot key's
   rows spread over several reducers/chunks instead of one giant group,
3. ``groupby(_pkey)`` co-locates each partition; the group encodes as
   one chunk (rows sorted by ``salt_col`` for byte-deterministic
   retries) with its own manifest record carrying the key value.

Reads prune at the manifest: ``keyed_read(out_dir, keys=[...])`` opens
ONLY the requested keys' chunks.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..encode import decode_table, encode_table
from ..manifest import write_atomic

_SALT_MUL = np.uint64(0x9E3779B97F4A7C15)


def _manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_keyed_manifest")


def keyed_encode(ds, out_dir: str, key_col: str, salt_col: str,
                 hot_threshold: int = 1_000_000, salt_buckets: int = 8) -> dict:
    """Encode ``ds`` into one chunk per (key[, salt]) partition.

    ``salt_col`` must be a numeric id column; it drives both the
    deterministic hot-key salt and the within-chunk row order (so Ray
    task retries produce byte-identical chunks)."""
    import ray

    from ..shuffle import salted_group_count

    import pyarrow.compute as pc
    import shutil

    if "_pkey" in ds.schema().names:
        # append_column would create a DUPLICATE _pkey; the groupby then
        # becomes ambiguous and drop_columns(["_pkey"]) removes BOTH,
        # silently losing the user's column from every chunk
        raise ValueError("input dataset already has a '_pkey' column — "
                         "rename it before keyed_encode")

    # a RE-encode into an existing dir must not leave the previous
    # generation's records readable: partition ids derive from pkeys, so
    # changed data/hot-keys produce a different id set and keyed_read
    # would otherwise return both generations (orphaned chunk bytes are
    # harmless — reads go through the manifest). The new generation is
    # written to a STAGING manifest dir and swapped in only after the
    # encode completes — a job killed mid-encode leaves the previous
    # generation fully readable instead of a silent partial store.
    new_mdir = _manifest_dir(out_dir) + ".new"
    shutil.rmtree(new_mdir, ignore_errors=True)
    os.makedirs(new_mdir, exist_ok=True)

    # every generation gets its own gen-N chunk dir: partition ids derive
    # from pkeys alone, so a re-encode with the SAME key set would
    # otherwise overwrite live chunks in place BEFORE the manifest swap —
    # a mid-encode crash would leave the committed old manifest pointing
    # at new-generation bytes. Old-gen chunks become unreferenced after
    # the swap; `gc_job` reclaims them.
    gens = [int(d[4:]) for d in os.listdir(out_dir)
            if d.startswith("gen-") and d[4:].isdigit()] \
        if os.path.isdir(out_dir) else []
    gen_dir = f"gen-{max(gens, default=-1) + 1}"

    counts = salted_group_count(ds, key_col)
    # filter to HOT keys distributed: the driver sees at most
    # total_rows/hot_threshold keys, never the full distinct-key census
    # (a url-grained key column would otherwise materialize every
    # distinct value here)
    hot_parts = list(counts.map_batches(
        lambda b: b.filter(pc.greater(b.column("count"), hot_threshold)),
        batch_format="pyarrow").iter_batches(batch_format="pyarrow"))
    # stringify with the SAME Arrow cast add_pkey uses (str(k) renders
    # 5.0/'True'/timestamps differently and would silently disable
    # salting for non-string keys); a hot NULL key becomes "None", the
    # literal its rows partition under
    if hot_parts:
        hot_vals = pa.concat_tables(hot_parts).column("value").combine_chunks()
        hot_arr = pc.fill_null(pc.cast(hot_vals, pa.string()), "None")
        # the SUMMARY (and keyed_read lookups) use Python str() rendering
        # — the same rendering encode_group records in the manifest — so
        # keyed_read(out, keys=summary["hot_keys"]) round-trips for
        # float/bool/timestamp keys too (Arrow renders 5.0 as '5',
        # str() as '5.0')
        hot = sorted(str(v) if v is not None else "None"
                     for v in hot_vals.to_pylist())
    else:
        hot_arr = pa.array([], pa.string())
        hot = []
    # broadcast the Arrow value_set ONCE — tasks fetch it plasma-cached
    # instead of rebuilding a pa.array per batch
    hot_ref = ray.put(hot_arr)

    salt_suffixes = np.array([f"#s{s}" for s in range(salt_buckets)])

    def add_pkey(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # null keys partition as the literal string "None" (matching the
        # pre-round-3 str() behavior and keyed_read's str(k) lookups)
        keys = pc.fill_null(pc.cast(b.column(key_col), pa.string()), "None")
        # injective pkey: "<len>:<key>[#s<salt>]". The length prefix makes
        # a literal key value "en#s3" partition differently from hot key
        # "en"'s salt-3 sub-partition ("5:en#s3" vs "2:en#s3"), so one
        # chunk can never mix rows of two distinct keys.
        base = pc.binary_join_element_wise(
            pc.cast(pc.utf8_length(keys), pa.string()), keys, ":")
        # fill nulls + modular int64 cast at the ARROW level: a null id
        # would otherwise go through float64 NaN -> uint64, which is
        # C-undefined and architecture-dependent — a task retried on a
        # different node could place the row in a different salt
        # sub-chunk, breaking the byte-identical-retry contract
        sv = (pc.fill_null(pc.cast(b.column(salt_col), pa.int64(),
                                   safe=False), 0)
              .to_numpy(zero_copy_only=False).astype(np.uint64, copy=False))
        salt = ((sv * _SALT_MUL) >> np.uint64(32)).astype(np.int64) % salt_buckets
        hot_mask = pc.is_in(keys, value_set=ray.get(hot_ref)).to_numpy(
            zero_copy_only=False)
        suffix = np.where(hot_mask, salt_suffixes[salt], "")
        pkey = pc.binary_join_element_wise(
            base, pa.array(suffix, pa.string()), "")
        return b.append_column("_pkey", pkey)

    keyed = ds.map_batches(add_pkey, batch_format="pyarrow")

    def encode_group(g: pa.Table) -> pa.Table:
        pkey = g.column("_pkey")[0].as_py()
        # recover the key from the DATA, not by parsing pkey (a key value
        # containing the salt separator must not corrupt key recovery)
        key = str(g.column(key_col)[0].as_py())
        body = (g.drop_columns(["_pkey"])
                .sort_by([(salt_col, "ascending")]).combine_chunks())
        blob, header = encode_table(body)
        pid = hashlib.sha1(pkey.encode()).hexdigest()[:16]
        chunk_file = os.path.join(gen_dir, f"shard-{pid[:3]}",
                                  f"part-{pid}.rde")
        write_atomic(os.path.join(out_dir, chunk_file), blob)
        rec = {"partition_id": pid, "key": key, "pkey": pkey,
               "num_rows": body.num_rows, "chunk_file": chunk_file,
               "chunk_size": len(blob)}
        write_atomic(os.path.join(new_mdir, f"{pid}.json"),
                     json.dumps(rec, sort_keys=True).encode())
        return pa.table({"pkey": pa.array([pkey]),
                         "num_rows": pa.array([body.num_rows], pa.int64()),
                         "chunk_bytes": pa.array([len(blob)], pa.int64())})

    summary = keyed.groupby("_pkey").map_groups(
        encode_group, batch_format="pyarrow").to_pandas()
    # consolidate the generation BEFORE the swap: encode tasks committed
    # one JSON per partition (atomic, distributed); folding them into one
    # parquet index here is free of races (this writer owns new_mdir) and
    # keeps keyed_read to ONE metadata open at 10^6+ keys
    _consolidate_dir(new_mdir)
    # commit: swap the completed generation in (two renames — the only
    # window without a readable manifest is between them; a crash
    # anywhere earlier leaves the OLD generation fully intact)
    mdir = _manifest_dir(out_dir)
    trash = mdir + ".old"
    shutil.rmtree(trash, ignore_errors=True)
    if os.path.isdir(mdir):
        os.rename(mdir, trash)
    os.rename(new_mdir, mdir)
    shutil.rmtree(trash, ignore_errors=True)
    empty = len(summary) == 0  # empty input: zero partitions, no crash
    return {"partitions": len(summary),
            "hot_keys": hot,
            "rows": 0 if empty else int(summary["num_rows"].sum()),
            "chunk_bytes": 0 if empty else int(summary["chunk_bytes"].sum())}


def _consolidate_dir(mdir: str) -> None:
    """Fold a generation's per-partition JSON records into ONE parquet
    index inside ``mdir`` (same format + fsync'd commit as the main
    manifest's, via ``manifest.write_index_file``), then drop the
    JSONs. Caller must be the generation's sole writer."""
    from ..manifest import write_index_file

    recs: list[tuple[str, str]] = []
    for name in sorted(os.listdir(mdir)):
        if not name.endswith(".json"):
            continue
        try:
            with open(os.path.join(mdir, name)) as f:
                raw = f.read()
            json.loads(raw)  # only well-formed records index
        except (OSError, json.JSONDecodeError):
            continue
        recs.append((name, raw))
    if not recs:
        return
    write_index_file(os.path.join(mdir, "index.parquet"),
                     [r for _, r in recs])
    for name, _ in recs:
        try:
            os.remove(os.path.join(mdir, name))
        except OSError:
            pass


def keyed_manifest(out_dir: str) -> list[dict]:
    """All records of the committed generation: the consolidated index
    (written by keyed_encode before its swap) plus any per-partition
    JSONs (e.g. a pre-index-era store)."""
    mdir = _manifest_dir(out_dir)
    if not os.path.isdir(mdir):
        return []
    # dedup by partition id, JSONs overlaying the index: if
    # _consolidate_dir's cleanup failed to remove a JSON (EACCES, NFS
    # hiccup) the record exists in BOTH — returning it twice would make
    # keyed_read silently decode that chunk twice
    by_pid: dict[str, dict] = {}
    idx = os.path.join(mdir, "index.parquet")
    if os.path.exists(idx):
        from ..manifest import read_index_rows

        for r in read_index_rows(idx):
            rec = json.loads(r)
            by_pid[rec["partition_id"]] = rec
    for name in sorted(os.listdir(mdir)):
        if not name.endswith(".json"):
            continue
        try:
            with open(os.path.join(mdir, name)) as f:
                rec = json.load(f)
        except json.JSONDecodeError:
            continue  # torn record → that partition is simply absent
        by_pid[rec["partition_id"]] = rec
    return list(by_pid.values())


def keyed_read(out_dir: str, keys: list | None = None):
    """Ray Dataset over the store; with ``keys`` given, only those keys'
    chunks are OPENED (manifest-level pruning). Returns (dataset, io)."""
    import ray

    all_manifest = keyed_manifest(out_dir)
    recs = all_manifest
    total = len(recs)
    if keys is not None:
        want = {str(k) for k in keys}
        recs = [r for r in recs if r["key"] in want]
    items = [{"path": os.path.join(out_dir, r["chunk_file"])}
             for r in sorted(recs, key=lambda r: r["pkey"])]

    def decode_item(batch: pa.Table) -> pa.Table:
        tables = []
        for path in batch.column("path").to_pylist():
            with open(path, "rb") as f:
                tables.append(decode_table(f.read(), verify_crc=True))
        return pa.concat_tables(tables)

    if not items:
        all_recs = all_manifest  # already loaded — no second index read
        if all_recs:
            # no key matched, but the store has a schema: return a TYPED
            # empty dataset (from any chunk's header — a few bytes) so
            # callers can still select/union the store's columns
            from ..encode import _read_header, schema_from_b64

            p = os.path.join(out_dir, all_recs[0]["chunk_file"])
            with open(p, "rb") as f:
                hdr, _ = _read_header(f)
            sch = schema_from_b64(hdr["schema"])
            return ray.data.from_arrow(sch.empty_table()), {
                "chunks_read": 0, "chunks_total": total}
        return ray.data.from_pandas(pd.DataFrame()), {
            "chunks_read": 0, "chunks_total": total}
    ds = ray.data.from_items(items).map_batches(
        decode_item, batch_size=1, batch_format="pyarrow")
    return ds, {"chunks_read": len(items), "chunks_total": total}
