"""Deterministic Common-Crawl-style web-page table generator (FIXTURES.md F1).

Schema (BASELINE.json ``input_hint``):
    url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string

Generation is fully deterministic (numpy Generator seeded with ``seed``):
- ``url``: ``https://{host}/{slug}`` with host drawn Zipf-skewed over H
  hostnames (heavy-hitter skew on purpose), rows ordered so hosts cluster
  into runs (crawl order).
- ``warc_ts``: monotone non-decreasing from 2025-01-01T00:00:00Z, seeded
  inter-arrival gaps in [0, 5 s], occasional repeats (runs).
- ``html``: pseudo-HTML tag soup wrapped around ``text``, ~5-10x its size.
- ``text``: sentences from a 500-word vocabulary, TARGET lengths
  100 B - 8 KiB (short-word draws can undershoot the low end).
- ``lang``: "en" w.p. 0.97 else one of {de, fr, es, zh} (near-constant).

No external data; runs at any row count. Also provides the codec-stress
variants listed in FIXTURES.md (all-unique url, constant lang, all-null
text, empty, single-row, quote/brace-heavy strings, non-ASCII).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

CC_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)

_WARC_EPOCH_US = 1_735_689_600_000_000  # 2025-01-01T00:00:00Z in microseconds

_LANGS = np.array(["en", "de", "fr", "es", "zh"])

_ALPHA = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz0123456789-", dtype="S1")


def _vocab(rng: np.random.Generator, n: int = 500) -> list[str]:
    lens = rng.integers(2, 11, size=n)
    return ["".join(_ALPHA[rng.integers(0, 26, size=l)].astype(str)) for l in lens]


def _hosts(rng: np.random.Generator, n: int = 1000) -> list[str]:
    tlds = np.array([".com", ".org", ".net", ".de", ".io"])
    out = []
    for i in range(n):
        l = rng.integers(4, 13)
        name = "".join(_ALPHA[rng.integers(0, 26, size=l)].astype(str))
        out.append(name + str(tlds[rng.integers(0, len(tlds))]))
    return out


def make_cc_table(num_rows: int, seed: int = 42, zipf_s: float = 1.2,
                  num_hosts: int = 1000) -> pa.Table:
    """Generate the CC-style table; deterministic for (num_rows, seed)."""
    rng = np.random.default_rng(seed)
    if num_rows == 0:
        return CC_SCHEMA.empty_table()

    vocab = np.array(_vocab(rng), dtype=object)
    hosts = _hosts(rng, num_hosts)

    # Zipf-skewed host ids, then sort so hosts cluster into runs (crawl
    # order). NOTE the tail CLAMP: P(raw > num_hosts) ≈ 0.22 at the
    # defaults all piles onto the LAST host id, making host 999 the
    # single heaviest hitter (~22%) ahead of rank-1 host 0 (~18%) — not
    # textbook Zipf, but heavy-hitter skew is what the fixture must
    # provide, and three rounds of bench/golden numbers were produced
    # against exactly these bytes, so the shape is pinned (a redraw or
    # modulo fold would silently invalidate cross-round comparisons).
    raw = rng.zipf(zipf_s, size=num_rows)
    host_ids = np.minimum(raw - 1, num_hosts - 1)
    # stable sort by a coarse "crawl wave" + host keeps determinism and runs
    wave = rng.integers(0, max(1, num_rows // 256) + 1, size=num_rows)
    order = np.lexsort((host_ids, wave))
    host_ids = host_ids[order]

    slugs_len = rng.integers(5, 41, size=num_rows)
    urls = []
    for i in range(num_rows):
        slug = "".join(_ALPHA[rng.integers(0, len(_ALPHA), size=slugs_len[i])].astype(str))
        urls.append(f"https://{hosts[host_ids[i]]}/{slug}")

    gaps = rng.integers(0, 5_000_000, size=num_rows)  # 0-5 s in us
    gaps[rng.random(num_rows) < 0.15] = 0  # repeated timestamps → runs
    ts = _WARC_EPOCH_US + np.cumsum(gaps)

    # text: sentences from the vocabulary, target 100 B - 8 KiB
    # (approximate at the low end: short-word draws may undershoot)
    texts = []
    htmls = []
    target = rng.integers(100, 8192, size=num_rows)
    for i in range(num_rows):
        words = vocab[rng.integers(0, len(vocab), size=max(4, target[i] // 6))]
        t = " ".join(words.tolist())[: target[i]]
        texts.append(t)
        mid = f"<html><body><div class=\"main\"><p>{t}</p></div>"
        pad = "<span data-x=\"1\"></span>" * int(rng.integers(1, 4 + target[i] // 128))
        htmls.append((mid + pad + "</body></html>").encode())

    langs = np.where(
        rng.random(num_rows) < 0.97, "en", _LANGS[rng.integers(1, 5, size=num_rows)]
    )

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs.tolist(), pa.string()),
        }
    )


def write_cc_parquet(path: str, num_rows: int, seed: int = 42,
                     row_group_size: int = 50_000) -> str:
    """Write the CC table to parquet (pyarrow default settings) and return path."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    t = make_cc_table(num_rows, seed=seed)
    pq.write_table(t, path, row_group_size=row_group_size)
    return path


def cc_dataset_dir(base_dir: str, num_rows: int, seed: int = 42,
                   shard_rows: int = 5000, row_group_size: int = 2500) -> str:
    """Generate (once, cached) a sharded CC-style parquet dataset via Ray.

    One file per shard, each generated deterministically from
    (seed + shard_index) — so any scale is reproducible and generation
    parallelizes. Returns the directory.

    TEST FIXTURE, single-node/shared-FS assumption: shard tasks write to
    a plain local path, so on a multi-node cluster without shared storage
    the shards would scatter across nodes — benches and tests run
    single-node by design. Generation is staged into a pid-suffixed dir
    and atomically renamed in, so a CONCURRENT generator (bench + oracle
    check on the same base_dir) can never expose a half-written dataset
    behind the _DONE marker; the losing generator discards its copy.
    """
    import ray

    tag = f"cc_{num_rows}_{seed}_{shard_rows}_rg{row_group_size}"
    out = os.path.join(base_dir, tag)
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    staging = f"{out}.gen.{os.getpid()}"
    os.makedirs(staging, exist_ok=True)
    shards = [
        {"shard": i, "rows": min(shard_rows, num_rows - i * shard_rows)}
        for i in range((num_rows + shard_rows - 1) // shard_rows)
    ]

    def gen(batch):
        import pyarrow.parquet as _pq

        for item in batch.to_pylist():
            t = make_cc_table(item["rows"], seed=seed + item["shard"])
            _pq.write_table(
                t, os.path.join(staging, f"shard-{item['shard']:04d}.parquet"),
                row_group_size=row_group_size)
        return batch

    ray.data.from_items(shards).map_batches(
        gen, batch_size=1, batch_format="pyarrow"
    ).materialize()
    with open(os.path.join(staging, "_DONE"), "w") as f:
        f.write("ok")
    try:
        os.rename(staging, out)
    except OSError:
        # another generator won the race (identical deterministic data);
        # or a stale incomplete `out` exists from a crashed run — replace
        # it only if it never completed
        import shutil

        if os.path.exists(done):
            shutil.rmtree(staging, ignore_errors=True)
        else:
            shutil.rmtree(out, ignore_errors=True)
            os.rename(staging, out)
    return out


# ---------------------------------------------------------------- stress cases

def stress_tables(seed: int = 42) -> dict[str, pa.Table]:
    """Codec-stress variants (FIXTURES.md F1): one distribution knob each."""
    rng = np.random.default_rng(seed)
    base = make_cc_table(64, seed=seed)
    out: dict[str, pa.Table] = {}
    out["empty"] = CC_SCHEMA.empty_table()
    out["single_row"] = base.slice(0, 1)
    out["constant_lang"] = base.set_column(
        4, "lang", pa.array(["en"] * len(base), pa.string())
    )
    out["all_null_text"] = base.set_column(
        3, "text", pa.array([None] * len(base), pa.string())
    )
    uniq = [f"https://u{i:08d}.example/{i}" for i in range(len(base))]
    out["all_unique_url"] = base.set_column(0, "url", pa.array(uniq, pa.string()))
    weird = ['{"a": "b\\"}', "brace { inside } string", "naïve — ünïcode ✓ 中文",
             'quote " and \\" escaped', ""] * 13
    out["weird_strings"] = base.set_column(
        3, "text", pa.array(weird[: len(base)], pa.string())
    )
    hi = rng.integers(2**40, 2**62, size=len(base))
    out["wide_ints"] = base.append_column("big", pa.array(hi, pa.int64()))
    return out
