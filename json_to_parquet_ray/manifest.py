"""Per-partition lineage manifest: checkpoint/resume for the encode job.

Every partition emits a lineage record — input fragment id (file path +
row group), codec choice per column, chunk offsets, checksums, row count
— written atomically (tmp + rename) to ``<out>/_manifest/part-NNNNN.json``
(BASELINE.json: "every partition emits a lineage record ... so a killed
job resumes without re-encoding completed partitions").

The reference has no checkpointing at all (SURVEY.md §4.1: a mid-write
crash leaves garbage and everything restarts); this module is the
superseding capability.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field


@dataclass
class FragmentRef:
    path: str
    row_group: int
    num_rows: int
    row_start: int = 0  # slice offset within the row group (0 = whole group)

    @property
    def fragment_id(self) -> str:
        return (f"{os.path.basename(self.path)}#rg{self.row_group}"
                f"[{self.row_start}+{self.num_rows}]")


@dataclass
class PartitionRecord:
    partition_id: int
    fragment: dict                      # FragmentRef asdict
    num_rows: int
    chunk_file: str                     # relative to out_dir
    chunk_size: int
    columns: list = field(default_factory=list)  # name, codec, size, crc32, offset
    wall_time_s: float = 0.0

    def to_json(self) -> str:
        return json.dumps(asdict(self), sort_keys=True)


MANIFEST_SHARD = 10_000  # records per manifest subdirectory — keeps any
# one directory listable even at 10^7+ partitions (100 TB-scale runs)


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def record_path(out_dir: str, partition_id: int) -> str:
    shard = partition_id // MANIFEST_SHARD
    return os.path.join(manifest_dir(out_dir), f"shard-{shard:04d}",
                        f"part-{partition_id:08d}.json")


def write_record(out_dir: str, rec: PartitionRecord) -> None:
    """Atomic commit: the record only appears once the chunk file is durable."""
    path = record_path(out_dir, rec.partition_id)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        f.write(rec.to_json())
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def write_atomic(path: str, data: bytes) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def load_manifest(out_dir: str) -> dict[int, PartitionRecord]:
    mdir = manifest_dir(out_dir)
    out: dict[int, PartitionRecord] = {}
    if not os.path.isdir(mdir):
        return out
    shard_dirs = [os.path.join(mdir, d) for d in sorted(os.listdir(mdir))
                  if d.startswith("shard-")]
    for sd in shard_dirs or [mdir]:
        if not os.path.isdir(sd):
            continue
        for name in sorted(os.listdir(sd)):
            if not (name.startswith("part-") and name.endswith(".json")):
                continue
            try:
                with open(os.path.join(sd, name)) as f:
                    raw = json.load(f)
                rec = PartitionRecord(**raw)
            except (json.JSONDecodeError, TypeError):
                continue  # torn record → partition will be re-encoded
            out[rec.partition_id] = rec
    return out


def is_complete(out_dir: str, rec: PartitionRecord) -> bool:
    """A partition is complete iff its chunk file exists with the recorded size."""
    p = os.path.join(out_dir, rec.chunk_file)
    try:
        return os.path.getsize(p) == rec.chunk_size
    except OSError:
        return False


def completed_partitions(out_dir: str) -> set[int]:
    return {pid for pid, rec in load_manifest(out_dir).items()
            if is_complete(out_dir, rec)}
