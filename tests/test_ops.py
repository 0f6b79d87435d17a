"""Tests for text analysis, dedup, ANN and multimodal operators."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from json_to_parquet_ray.pipelines import ann, dedup, multimodal, text


def make_docs_table():
    texts = [
        "The quick brown fox jumps over the lazy dog",
        "The quick brown fox jumps over the lazy dog",          # exact dup of 0
        "The quick brown fox jumps over the lazy dog!",         # near dup of 0
        "Der schnelle braune Fuchs springt über den faulen Hund und der",
        "Le renard brun rapide saute par dessus le chien est une pour",
        "这是一段中文文本用于语言识别测试",
        "completely different content about machine learning pipelines",
        None,
    ]
    return pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


def test_token_count_batch():
    t = pa.table({"text": pa.array(["a b  c", "", "one"], pa.string())})
    out = text.token_count_batch(t)
    assert out.column("ws_tokens").to_pylist() == [3, 0, 1]


def test_quality_scores_batch():
    t = pa.table({"text": pa.array(["Hello, World!", "abc"], pa.string())})
    out = text.quality_score_batch(t)
    assert out.column("n_chars").to_pylist() == [13, 3]
    assert out.column("punct_ratio").to_pylist()[0] == pytest.approx(2 / 13)
    assert out.column("upper_ratio").to_pylist()[0] == pytest.approx(2 / 13)


def test_lang_id_heuristic():
    out = text.LangId()(make_docs_table())
    pred = dict(zip(out.column("doc_id").to_pylist(),
                    out.column("lang_pred").to_pylist()))
    assert pred[0] == "en"
    assert pred[3] == "de"
    assert pred[4] == "fr"
    assert pred[5] == "zh"


def test_fingerprints_deterministic():
    t = make_docs_table()
    a = text.fingerprint_batch(t).column("fp_md5").to_pylist()
    b = text.fingerprint_batch(t).column("fp_md5").to_pylist()
    assert a == b
    assert a[0] == a[1] and a[0] != a[2]
    assert a[7] is None
    f1 = text.fingerprint_batch_fast(t).column("fp_fnv").to_pylist()
    assert f1[0] == f1[1] and f1[0] != f1[2]


def test_minhash_signatures_similarity():
    arr = pa.array([
        "the quick brown fox jumps over the lazy dog " * 5,
        "the quick brown fox jumps over the lazy dog " * 5 + "extra tail",
        "completely different text with no overlap at all whatsoever",
    ])
    sig = dedup.minhash_signatures(arr)
    sim01 = (sig[0] == sig[1]).mean()
    sim02 = (sig[0] == sig[2]).mean()
    assert sim01 > 0.5
    assert sim02 < 0.2


def test_ngram_jaccard():
    assert dedup.ngram_jaccard("abcdef", "abcdef") == 1.0
    assert dedup.ngram_jaccard("abcdefgh", "zzzzzzzz") == 0.0


def test_shingle_hash_array_matches_shingle_set():
    """The vectorized verify path (sorted uint64 shingle hashes +
    searchsorted intersection) must reproduce _shingle_set's exact
    Jaccard on unicode / short / empty / repetitive strings."""
    texts = ["the quick brown fox", "the quick brown fix", "", "ab", "abcd",
             "abcde", "aaaaaaaaaa", "中文分词测试文本", "中文分词测试文字",
             "café résumé déjà", "x" * 4 + "y", "  spaces   inside  "]
    for a in texts:
        ha = dedup._shingle_hash_array(a)
        assert len(ha) == len(dedup._shingle_set(a))
        for b in texts:
            sa, sb = dedup._shingle_set(a), dedup._shingle_set(b)
            inter = len(sa & sb)
            want = inter / (len(sa) + len(sb) - inter)
            hb = dedup._shingle_hash_array(b)
            small, big = (ha, hb) if len(ha) <= len(hb) else (hb, ha)
            pos = np.searchsorted(big, small)
            ok = pos < len(big)
            got_i = int(np.count_nonzero(big[pos[ok]] == small[ok]))
            got = got_i / (len(ha) + len(hb) - got_i)
            assert got == pytest.approx(want), (a, b)


def test_exact_dedup_ray(ray_session):
    import ray

    ds = ray.data.from_arrow(make_docs_table().drop_null())
    kept = dedup.exact_dedup(ds).to_pandas()
    # doc 1 (dup of 0) removed; min doc_id kept
    assert 0 in set(kept["doc_id"]) and 1 not in set(kept["doc_id"])
    assert len(kept) == 6


def test_extract_text_batch():
    """HTML→text extraction kernel: scripts/styles/comments stripped
    (including tag-looking content inside them), entities decoded,
    whitespace collapsed; binary input accepted; nulls propagate."""
    html = pa.table({"doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                     "html": pa.array([
        '<html><head><script>var x = "<p>hidden</p>";</script>'
        "<style>p { color: red }</style></head><body>\n"
        "<h1>Title!</h1><p>Hello &amp; welcome to the &quot;test&quot; "
        "page.</p><!-- note\n--><div>a<br/>b &lt;tag&gt; &#39;q&#39;"
        "&nbsp;end</div></body></html>",
        "plain text  with   spaces", "", None])})
    out = text.extract_text_batch(html)
    assert out.column_names == ["doc_id", "text"]
    got = out.column("text").to_pylist()
    assert got[0] == ("Title! Hello & welcome to the \"test\" page. "
                      "a b <tag> 'q' end")
    assert got[1] == "plain text with spaces" and got[2] == "" and got[3] is None
    # binary column decodes identically
    as_bin = html.set_column(1, "html", html.column("html").cast(pa.binary()))
    assert text.extract_text_batch(as_bin).column("text").to_pylist() == got
    # escaped entities decode ONCE: &amp;lt; is the page literally
    # displaying '&lt;', not a tag bracket
    esc = pa.table({"html": pa.array(["&amp;lt;b&amp;gt; and &amp;amp;"])})
    assert (text.extract_text_batch(esc).column("text").to_pylist()
            == ["&lt;b&gt; and &amp;"])


def test_paragraph_dedup_ray(ray_session):
    """Boilerplate removal vs an independent naive reference, covering
    the edge shapes: a doc that is ALL boilerplate (→ empty text), a
    within-doc repeated paragraph (global count counts repeats), empty
    and null texts ('' paragraphs dedup like any other), and a doc with
    no duplicated paragraphs (untouched, n_removed=0)."""
    import ray

    docs = [
        {"doc_id": 0, "text": "boiler\n\nunique zero\n\nfooter0"},
        {"doc_id": 1, "text": "boiler\n\nunique one"},
        {"doc_id": 2, "text": "boiler"},                   # all boilerplate
        {"doc_id": 3, "text": "self\n\nself\n\nkeep me"},  # within-doc dup
        {"doc_id": 4, "text": ""},
        {"doc_id": 5, "text": None},                       # '' dups with 4
        {"doc_id": 6, "text": "alone entirely"},
    ]
    ds = ray.data.from_items(docs).repartition(3)
    out = dedup.paragraph_dedup(ds).to_pandas().set_index("doc_id")

    from collections import Counter
    counts = Counter()
    for d in docs:
        counts.update((d["text"] or "").split("\n\n"))
    for d in docs:
        ps = (d["text"] or "").split("\n\n")
        kept = [p for p in ps if counts[p] < 2]
        row = out.loc[d["doc_id"]]
        assert row["text"] == "\n\n".join(kept), d
        assert row["n_removed"] == len(ps) - len(kept), d
    assert out.loc[6, "n_removed"] == 0 and out.loc[2, "text"] == ""

    # layout invariance: the count combiner + global sum must not care
    # how rows fall into blocks
    for nb in (1, 7):
        alt = (dedup.paragraph_dedup(ray.data.from_items(docs)
                                     .repartition(nb))
               .to_pandas().set_index("doc_id").sort_index())
        pd.testing.assert_frame_equal(alt, out.sort_index())


def test_paragraph_dedup_fuzz_seeded(ray_session):
    """Randomized parity vs the naive reference: 120 docs over a tiny
    paragraph alphabet (so duplicate/unique/within-doc-repeat shapes all
    occur organically), min_count=3 to exercise a non-default threshold."""
    import ray

    rng = np.random.default_rng(7)
    vocab = [f"para {i} body" for i in range(30)] + [""]
    docs = []
    for i in range(120):
        k = int(rng.integers(1, 6))
        docs.append({"doc_id": i, "text": "\n\n".join(
            vocab[int(j)] for j in rng.integers(0, len(vocab), k))})

    out = (dedup.paragraph_dedup(ray.data.from_items(docs).repartition(5),
                                 min_count=3)
           .to_pandas().set_index("doc_id"))

    from collections import Counter
    counts = Counter()
    for d in docs:
        counts.update(d["text"].split("\n\n"))
    for d in docs:
        ps = d["text"].split("\n\n")
        kept = [p for p in ps if counts[p] < 3]
        row = out.loc[d["doc_id"]]
        assert row["text"] == "\n\n".join(kept)
        assert row["n_removed"] == len(ps) - len(kept)


def test_prepare_corpus_stage_interplay(ray_session):
    """The composite pipeline's stages must interact correctly: the lang
    and length gates drop rows BEFORE paragraph counting (a boilerplate
    paragraph only present in gated-out docs must survive elsewhere),
    all-boilerplate docs collapse to ONE empty-text row in exact dedup,
    and ws_tokens counts the CLEANED text."""
    import ray

    from json_to_parquet_ray.pipelines.prepare import prepare_corpus

    long_pad = "word " * 40  # clears min_chars
    docs = [
        # 'boiler' dups across docs 0/1 → removed from both
        {"doc_id": 0, "lang": "en", "text": f"boiler\n\n{long_pad}zero"},
        {"doc_id": 1, "lang": "en", "text": f"boiler\n\n{long_pad}one"},
        # all-boilerplate docs → '' → exact dedup keeps doc 2 only
        {"doc_id": 2, "lang": "en", "text": f"dup {long_pad}\n\ndup {long_pad}"},
        {"doc_id": 3, "lang": "en", "text": f"dup {long_pad}\n\ndup {long_pad}"},
        # gated out: wrong lang (its unique paragraph must not count)
        {"doc_id": 4, "lang": "de", "text": f"boiler\n\n{long_pad}vier"},
        # gated out: too short
        {"doc_id": 5, "lang": "en", "text": "boiler\n\nshort"},
    ]
    out = (prepare_corpus(ray.data.from_items(docs).repartition(3),
                          min_chars=150)
           .to_pandas().set_index("doc_id").sort_index())
    assert sorted(out.index) == [0, 1, 2]
    assert out.loc[0, "text"] == f"{long_pad}zero"
    assert out.loc[0, "n_removed"] == 1 and out.loc[0, "ws_tokens"] == 41
    assert out.loc[2, "text"] == "" and out.loc[2, "n_removed"] == 2
    assert out.loc[2, "ws_tokens"] == 0


def test_minhash_dedup_ray(ray_session):
    import ray

    texts = ["the quick brown fox jumps over the lazy dog and runs away " * 4]
    tbl = pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array([texts[0], texts[0] + " tiny change",
                          "totally different document about something else entirely",
                          texts[0]]),
    })
    ds = ray.data.from_arrow(tbl)
    kept, dropped = dedup.minhash_dedup(ds, threshold=0.7)
    kept_ids = set(kept.to_pandas()["doc_id"])
    assert 0 in kept_ids and 2 in kept_ids
    assert 3 not in kept_ids  # exact dup via minhash path
    assert 1 not in kept_ids  # near dup


def test_simhash_pairs_ray(ray_session):
    import ray

    # one word changed in a 100-word doc → Hamming(simhash) = 2 with the
    # md5-low64 token hash (verified), within the 4-band pigeonhole
    # guarantee for max_hamming=3
    words = [f"word{i}" for i in range(100)]
    base = " ".join(words)
    near = " ".join(words[:-1] + ["changed"])
    tbl = pa.table({
        "doc_id": pa.array(range(3), pa.int64()),
        "text": pa.array([base, near, "unrelated totally different short doc"]),
    })
    pairs = dedup.simhash_near_dup_pairs(
        ray.data.from_arrow(tbl), max_hamming=3).to_pandas()
    got = {(a, b) for a, b in zip(pairs["a"], pairs["b"])}
    assert (0, 1) in got
    assert not any(2 in p for p in got)


def test_simhash_kernel_matches_naive_reference():
    """The counts-matmul vote kernel must be bit-identical to a naive
    per-doc Python SimHash (md5-low64 tokens, majority bit vote) on
    every edge shape, and invariant to batch layout."""
    import hashlib

    def naive(texts):
        out = []
        for t in texts:
            toks = (t or "").lower().split()
            if not toks:
                out.append(0)
                continue
            votes = [0] * 64
            for tok in toks:
                h = int.from_bytes(
                    hashlib.md5(tok.encode()).digest()[8:16], "little")
                for j in range(64):
                    votes[j] += 1 if (h >> j) & 1 else -1
            out.append(sum(1 << j for j in range(64) if votes[j] > 0))
        return out

    texts = [
        "the quick brown fox the the THE",   # repeated tokens, case fold
        "",                                   # empty
        None,                                 # null
        "   \t  ",                            # whitespace-only → no tokens
        " ".join(f"w{i}" for i in range(500)),  # high vocab
        "solo",
        "a b a b a b a b c",
    ]
    want = np.array(naive(texts), np.uint64)
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    got = dedup.SimHash("text")(tbl).column("simhash") \
        .to_numpy().astype(np.uint64)
    assert np.array_equal(got, want)
    # layout invariance: each slice, processed alone, agrees
    for lo, hi in [(0, 3), (3, 5), (5, 7), (2, 6)]:
        part = dedup.SimHash("text")(tbl.slice(lo, hi - lo)) \
            .column("simhash").to_numpy().astype(np.uint64)
        assert np.array_equal(part, want[lo:hi])


def test_ann_brute_force_and_ivf(ray_session):
    import ray

    rng = np.random.default_rng(0)
    emb = rng.standard_normal((200, 16))
    tbl = pa.table({
        "vec_id": pa.array(range(200), pa.int64()),
        "embedding": pa.array(list(emb.astype(float)), pa.list_(pa.float64())),
    })
    q = emb[:2]
    exact = ann.brute_force_topk(ray.data.from_arrow(tbl), q, k=5)
    # the query vector itself must be its own top hit
    top0 = exact[exact.query_id == 0].iloc[0]
    assert top0["vec_id"] == 0 and top0["cosine"] == pytest.approx(1.0)
    approx = ann.ivf_topk(ray.data.from_arrow(tbl), q, k=5, n_clusters=8, nprobe=4)
    rec = len(set(exact[exact.query_id == 0]["vec_id"])
              & set(approx[approx.query_id == 0]["vec_id"])) / 5
    assert rec >= 0.6


def test_embedding_quantize_int8(ray_session):
    """int8 quantization: dequantization error bounded by scale/2 per
    component, cosine top-k on the CODES agrees with float top-k (the
    per-vector scale cancels in cosine), zero vectors quantize to zero
    codes with scale 0."""
    import ray

    rng = np.random.default_rng(5)
    emb = rng.standard_normal((300, 24))
    emb[7] = 0.0  # zero vector edge
    tbl = pa.table({
        "vec_id": pa.array(range(300), pa.int64()),
        "embedding": pa.array(list(emb.astype(float)), pa.list_(pa.float64())),
    })
    out = (ann.quantize_embeddings(ray.data.from_arrow(tbl))
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    q = np.stack(out.q_vec.map(np.asarray)).astype(np.float64)
    scale = out.q_scale.to_numpy()
    assert scale[7] == 0.0 and (q[7] == 0).all()
    err = np.abs(q * scale[:, None] - emb)
    assert (err <= scale[:, None] / 2 + 1e-12).all()

    # cosine top-10 overlap vs float vectors (scale cancels in cosine)
    def topk(m, qv, k=10):
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return set(np.argsort(-(mn @ (qv / np.linalg.norm(qv))))[:k])

    query = emb[3]
    overlap = len(topk(emb, query) & topk(q, query)) / 10
    assert overlap >= 0.8, overlap


def test_pack_sequences_prefix_scan(ray_session):
    """Distributed concat-and-chunk must equal the naive sequential
    packing under the same deterministic order, for any block layout;
    bin totals (except the last) must reach the budget."""
    import hashlib

    import ray

    from json_to_parquet_ray.pipelines.pack import pack_sequences

    docs = [{"doc_id": i, "text": " ".join(f"w{j}" for j in
                                           range((i * 7) % 23 + 1))}
            for i in range(150)]

    def low64(k):
        return int.from_bytes(hashlib.md5(str(k).encode()).digest()[8:16],
                              "little")

    acc, exp = 0, {}
    for d in sorted(docs, key=lambda d: (low64(d["doc_id"]), d["doc_id"])):
        n = len(d["text"].split())
        exp[d["doc_id"]] = (n, acc // 40)
        acc += n

    for nb in (1, 6):
        out = (pack_sequences(ray.data.from_items(docs).repartition(nb),
                              budget=40).to_pandas())
        got = {r.doc_id: (r.n_tokens, r.seq_id) for r in out.itertuples()}
        assert got == exp
    # every bin except the last starts because the previous one FILLED
    per_bin = out.groupby("seq_id")["n_tokens"].sum().sort_index()
    assert (per_bin.iloc[:-1].cumsum() >= 40 * np.arange(1, len(per_bin))).all()

    import pytest

    with pytest.raises(ValueError):
        pack_sequences(ray.data.from_items(docs), budget=0)


def test_pack_sequences_string_keys_and_null_text(ray_session):
    """Generic keys: a string key column must work end-to-end (no int
    casts anywhere); null text packs as zero tokens."""
    import ray

    from json_to_parquet_ray.pipelines.pack import pack_sequences

    docs = [{"url": f"https://ex.com/{i}",
             "text": None if i == 3 else "a b c"} for i in range(10)]
    out = (pack_sequences(ray.data.from_items(docs).repartition(3),
                          budget=5, key="url")
           .to_pandas().set_index("url"))
    assert len(out) == 10
    assert out.loc["https://ex.com/3", "n_tokens"] == 0
    assert out.n_tokens.sum() == 27
    # bins are contiguous from 0 and every doc's bin is within range
    assert set(out.seq_id) == set(range(out.seq_id.max() + 1))
    assert out.seq_id.max() <= 27 // 5


def test_pack_sequences_duplicate_keys(ray_session):
    """Duplicate keys: Ray's range-partitioned sort co-locates exact
    sort-key ties in one block (verified here — the in-code duplicate
    guard is defense-in-depth for a changed sort implementation), and
    the packed seq_id multiset matches naive concat-and-chunk."""
    import ray

    from json_to_parquet_ray.pipelines.pack import pack_sequences

    docs = ([{"doc_id": 1, "text": "x y z"}] * 100
            + [{"doc_id": 2, "text": "x y z"}] * 100)
    out = (pack_sequences(ray.data.from_items(docs).repartition(8),
                          budget=7).to_pandas())
    assert len(out) == 200 and out.n_tokens.sum() == 600
    # the 600-token stream cuts into ceil(600/7) bins; each doc starts
    # at a multiple-of-3 offset, so bins hold 2-3 docs
    assert out.seq_id.max() == (600 - 3) // 7
    sizes = out.groupby("seq_id").size().sort_index()
    assert set(sizes.iloc[:-1]) <= {2, 3}  # final bin may be partial


def test_canonicalize_urls_batch():
    """Lowercase scheme+host only (path case preserved), fragment and
    tracking params stripped wherever they sit, dangling ?/& tidied,
    schemeless strings untouched, nulls propagate."""
    t = pa.table({"url": pa.array([
        "HTTP://Example.COM/Path?a=1&utm_source=x&fbclid=Y#frag",
        "https://Host.org/?utm_campaign=z",
        "https://h.io/p?utm_a=1&b=2&utm_c=3&gclid=g",
        "no-scheme/path?utm_x=1",
        "https://a.b/#only-frag",
        None, "",
    ])})
    got = text.canonicalize_urls_batch(t).column("url").to_pylist()
    assert got == [
        "http://example.com/Path?a=1",
        "https://host.org/",
        "https://h.io/p?b=2",
        "no-scheme/path?utm_x=1",
        "https://a.b/",
        None, "",
    ]
    # out= appends instead of replacing
    t2 = text.canonicalize_urls_batch(t, out="canon")
    assert t2.column_names == ["url", "canon"]


def test_decontaminate_ngram_overlap(ray_session):
    """Eval-overlap flagging: exact n-token match flags, shorter docs
    never flag, a repeated matched gram counts ONCE per doc, distinct
    grams accumulate, and an empty eval set flags nothing."""
    import ray

    span = "a b c d"  # n=4 → one gram
    docs = [
        {"doc_id": 0, "text": f"x y {span} z"},         # 1 hit
        {"doc_id": 1, "text": span},                     # exactly n tokens
        {"doc_id": 2, "text": "a b c"},                  # shorter than n
        {"doc_id": 3, "text": f"{span} q {span}"},       # repeat → still 1... plus bridge grams
        {"doc_id": 4, "text": "p q r s t"},              # clean
        {"doc_id": 5, "text": f"{span} e"},              # 2 distinct grams
    ]
    out = (text.decontaminate(ray.data.from_items(docs).repartition(3),
                              [span + " e f"], n=4)
           .to_pandas().set_index("doc_id").sort_index())
    assert out.contaminated.tolist() == [True, True, False, True, False,
                                         True]
    # doc 3: 'a b c d' counted once despite appearing twice; 'b c d e'
    # doesn't occur (q breaks it)
    assert out.loc[3, "ngram_hits"] == 1
    assert out.loc[5, "ngram_hits"] == 2  # 'a b c d' + 'b c d e'
    clean = (text.decontaminate(ray.data.from_items(docs), [], n=4)
             .to_pandas())
    assert not clean.contaminated.any()
    with pytest.raises(ValueError):
        text.decontaminate(ray.data.from_items(docs), [span], n=0)
    # the rolling hash's mod-2^64 wraparound must be silent
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        from json_to_parquet_ray.pipelines.text import _ngram_hash_stream
        flat, counts, _ = text.token_stream(pa.array(["a b c d e f g h i"]))
        _ngram_hash_stream(flat, counts, 8)


def test_embedding_near_dup(ray_session):
    import ray

    rng = np.random.default_rng(1)
    base = rng.standard_normal(16)
    emb = np.vstack([base, base + 1e-4 * rng.standard_normal(16),
                     rng.standard_normal(16)])
    tbl = pa.table({
        "vec_id": pa.array(range(3), pa.int64()),
        "embedding": pa.array(list(emb.astype(float)), pa.list_(pa.float64())),
    })
    pairs = dedup.embedding_near_dup_pairs(
        ray.data.from_arrow(tbl), threshold=0.99).to_pandas()
    assert {(0, 1)} == {(a, b) for a, b in zip(pairs["a"], pairs["b"])}


def test_multimodal_stub_plumbing():
    payloads = [b"\x89PNG fake bytes" * 100, b"", None]
    t = pa.table({
        "media_id": pa.array(range(3), pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
    })
    out = multimodal.DecodeMedia()(t)
    assert out.column("decode_ok").to_pylist() == [True, True, False]
    assert out.column("n_bytes").to_pylist() == [1500, 0, 0]
    feats = multimodal.ExtractFeatures()(t)
    f = feats.column("features")
    assert f.type == pa.list_(pa.float32(), 64)
    # deterministic
    feats2 = multimodal.ExtractFeatures()(t)
    assert feats.column("features").equals(feats2.column("features"))
    frames = multimodal.frame_sample_batch(t, every=128, max_frames=3)
    assert frames.column_names == ["media_id", "frame_index", "frame"]
    assert frames.num_rows == 3  # 1500 bytes // 128 → capped at 3 frames


def test_multimodal_strict_raises():
    t = pa.table({"media_id": pa.array([1], pa.int64()),
                  "payload": pa.array([b"x"], pa.binary())})
    stage = multimodal.DecodeMedia(strict=True)
    if not stage.has_decoder:
        with pytest.raises(NotImplementedError):
            stage(t)


def test_minhash_signature_batch_purity():
    """A doc's signature is a pure function of the doc — independent of
    which neighbors share its batch (boundary shingles excluded)."""
    docs = ["the quick brown fox jumps over the lazy dog " * 3,
            "pack my box with five dozen liquor jugs " * 2,
            "abc", ""]
    import itertools

    solo = {d: dedup.minhash_signatures(pa.array([d]))[0] for d in docs}
    for combo in itertools.permutations(docs, 3):
        sig = dedup.minhash_signatures(pa.array(list(combo)))
        for i, d in enumerate(combo):
            assert (sig[i] == solo[d]).all()


def test_minhash_dedup_planted_mega_cluster(ray_session):
    """A 10^4-member duplicate cluster: star-pair fallback keeps candidate
    volume O(n), pairs stay in the object store, and distributed min-label
    propagation clusters without driver-side pair materialization."""
    import ray

    n_dup, n_bg = 10_000, 200
    rng = __import__("numpy").random.default_rng(3)
    bg = [" ".join(rng.choice(list("abcdefgh"), 30)) + f" unique{i}" * 3
          for i in range(n_bg)]
    dup_text = "identical duplicate document body repeated many times " * 4
    texts = [dup_text] * n_dup + bg
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts)})
    ds = ray.data.from_arrow(tbl).map_batches(lambda b: b, batch_size=512,
                                              batch_format="pyarrow")
    kept, drop = dedup.minhash_dedup(ds, threshold=0.8,
                                     cluster_mode="distributed")
    kept_ids = set(kept.to_pandas()["doc_id"])
    # exactly one survivor of the clique: the min id (0)
    assert 0 in kept_ids
    assert not (set(range(1, n_dup)) & kept_ids)
    assert len(drop) == n_dup - 1


def test_cluster_min_label_chain_and_components(ray_session):
    import ray

    edges = pd.DataFrame({"a": [1, 2, 3, 10, 20], "b": [2, 3, 4, 11, 21]})
    labels = dedup.cluster_min_label(ray.data.from_pandas(edges)).to_pandas()
    got = dict(zip(labels["node"], labels["label"]))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_cluster_min_label_pointer_doubling_rounds(ray_session):
    """A 64-hop chain must converge in O(log d) rounds (pointer doubling),
    not O(d): ≤ ceil(log2(64)) + 2 = 8 label-propagation rounds (one
    extra round is the fixpoint detection itself)."""
    import math

    import ray

    d = 64
    edges = pd.DataFrame({"a": np.arange(d, dtype=np.int64),
                          "b": np.arange(1, d + 1, dtype=np.int64)})
    stats: dict = {}
    labels = dedup.cluster_min_label(
        ray.data.from_pandas(edges), stats_out=stats).to_pandas()
    assert (labels["label"] == 0).all() and len(labels) == d + 1
    assert stats["iters"] <= math.ceil(math.log2(d)) + 2, stats


def test_ivf_partition_pruned_index(ray_session, tmp_path):
    """ivf_build writes one parquet partition per bucket; probes open only
    the probed buckets' directories and still find the true neighbors."""
    import os

    import ray

    rng = np.random.default_rng(7)
    emb = rng.standard_normal((400, 16))
    tbl = pa.table({
        "vec_id": pa.array(range(400), pa.int64()),
        "embedding": pa.array(list(emb.astype(float)), pa.list_(pa.float64())),
    })
    idx = str(tmp_path / "ivf_idx")
    ann.ivf_build(ray.data.from_arrow(tbl), idx, n_clusters=8)
    parts = [d for d in os.listdir(idx) if d.startswith("ivf_bucket=")]
    assert len(parts) >= 4
    out, io = ann.ivf_probe_topk(idx, emb[:2], k=5, nprobe=3)
    # union of 2 queries' probes: ≤ 6 buckets, strictly fewer than exist
    assert io["buckets_read"] <= 6 and io["buckets_read"] < io["buckets_total"]
    # the query vector's own bucket is always probed first → self-hit
    top0 = out[out.query_id == 0].iloc[0]
    assert top0["vec_id"] == 0


def test_redact_batch():
    t = pa.table({"text": pa.array(
        ["mail me at a.b+c@foo-bar.example.org today",
         "no emails here", "two x@y.io and z@w.co"])})
    out = text.redact_batch(t).column("text").to_pylist()
    assert out[0] == "mail me at <EMAIL> today"
    assert out[1] == "no emails here"
    assert out[2] == "two <EMAIL> and <EMAIL>"


def test_repetition_ratio_batch():
    t = pa.table({"text": pa.array(
        ["a a a a", "a b c d", "", "a b a b", None])})
    out = text.repetition_ratio_batch(t).column("rep_ratio").to_pylist()
    assert out[0] == pytest.approx(0.75)
    assert out[1] == 0.0
    assert out[2] == 0.0
    assert out[3] == pytest.approx(0.5)
    assert out[4] == 0.0


def test_embedding_near_dup_oversized_bucket_not_dropped(ray_session):
    """Regression: buckets over bucket_cap used to return ZERO pairs
    silently. A planted cluster larger than the cap must still surface
    its near-dup pairs (sub-split for separable groups, star pairs for
    identical-vector clusters)."""
    import ray

    rng = np.random.default_rng(5)
    base = rng.standard_normal(16)
    n = 40  # one LSH bucket of 40 identical-direction vectors, cap 16
    emb = np.vstack([base + 1e-6 * rng.standard_normal(16) for _ in range(n)]
                    + [rng.standard_normal(16)])
    tbl = pa.table({
        "vec_id": pa.array(range(n + 1), pa.int64()),
        "embedding": pa.array(list(emb.astype(float)), pa.list_(pa.float64())),
    })
    pairs = dedup.embedding_near_dup_pairs(
        ray.data.from_arrow(tbl), threshold=0.99, bucket_cap=16).to_pandas()
    got = {(a, b) for a, b in zip(pairs["a"], pairs["b"])}
    # every cluster member must be connected (star pairs at minimum: the
    # anchor 0 reaches all 39 others); the outlier stays out
    anchor_pairs = {(0, i) for i in range(1, n)}
    assert anchor_pairs <= got
    assert not any(n in p for p in got)


def test_sharded_broadcast_lookup(ray_session):
    items = {i: f"t{i}" for i in range(2500)}
    sb = dedup._ShardedBroadcast(items, max_per_shard=1000)
    assert sb.n == 3
    assert all(sb.get(i) == f"t{i}" for i in (0, 999, 1000, 2499))
    assert sb.get(99999) is None
    rng = np.random.default_rng(0)
    ids = np.arange(500, dtype=np.int64)
    mat = rng.standard_normal((500, 8))
    sv = dedup._ShardedVectors(ids[::-1].copy(), mat[::-1].copy(),
                               max_per_shard=100)
    want = np.array([7, 123, 499, 0])
    np.testing.assert_allclose(sv.get_many(want), mat[want])


def test_ivf_stratified_sample_on_drifting_corpus(ray_session, tmp_path):
    """k-means must train on a sample spanning ALL fragments: a corpus
    whose embedding distribution drifts across blocks (cluster A first,
    cluster B last) still yields centroids covering both, so recall@10
    for queries in the LATE cluster stays perfect."""
    import ray

    from json_to_parquet_ray.pipelines import ann

    rng = np.random.default_rng(9)
    dim, n = 16, 2000
    a_center = rng.standard_normal(dim)
    b_center = rng.standard_normal(dim)
    # first half near A, second half near B — ordered, so a head sample
    # would see only A
    emb = np.vstack([a_center + 0.05 * rng.standard_normal((n // 2, dim)),
                     b_center + 0.05 * rng.standard_normal((n // 2, dim))])
    tbl = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(list(emb.astype(float)),
                              pa.list_(pa.float64())),
    })
    ds = ray.data.from_arrow(tbl).repartition(8)

    sample = ann.stratified_vec_sample(ds, "embedding", 256)
    # the sample must cover the late half too
    sims_b = ann._normalize(sample) @ (b_center / np.linalg.norm(b_center))
    assert (sims_b > 0.9).sum() >= len(sample) // 4

    queries = emb[[n - 1, n - 10]]  # late-cluster queries
    exact = ann.brute_force_topk(ds, queries, k=10)
    approx = ann.ivf_topk(ds, queries, k=10, n_clusters=4, nprobe=1,
                          sample_rows=256)
    for qid in (0, 1):
        want = set(exact[exact["query_id"] == qid]["vec_id"])
        got = set(approx[approx["query_id"] == qid]["vec_id"])
        assert len(want & got) / 10 >= 0.9


# ------------------------------------------------------------------- BPE


def _naive_bpe_train(word_counts, n_merges):
    """Obviously-correct reference trainer: full pair recount each round."""
    words = {w: [w.encode()[i:i+1] for i in range(len(w.encode()))]
             for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pc_ = {}
        for w, syms in words.items():
            for p in zip(syms, syms[1:]):
                pc_[p] = pc_.get(p, 0) + word_counts[w]
        if not pc_:
            break
        best = max(pc_.items(), key=lambda kv: (kv[1], kv[0]))[0]
        if pc_[best] < 2:
            break
        merges.append(best)
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i+1]) == best:
                    out.append(syms[i] + syms[i+1]); i += 2
                else:
                    out.append(syms[i]); i += 1
            words[w] = out
    return merges


def test_bpe_train_matches_naive_reference():
    from json_to_parquet_ray.pipelines import bpe

    wc = {" the": 50, " then": 10, " than": 8, " cat": 5, " cats": 4,
          "The": 3, "!": 7, " 123": 2}
    fast = bpe.train_bpe(wc, vocab_size=256 + 12)
    naive = _naive_bpe_train(wc, 12)
    assert fast == naive
    # merges actually learned multi-byte symbols
    assert any(len(a + b) >= 3 for a, b in fast)


def test_bpe_encode_roundtrip_and_consistency():
    from json_to_parquet_ray.pipelines import bpe

    wc = {" hello": 20, " help": 10, " world": 15, " word": 5}
    merges = bpe.train_bpe(wc, vocab_size=256 + 20)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for w in [" hello", " help", " held", " helicopter", "xyz", ""]:
        syms = bpe.bpe_encode_word(w.encode(), ranks)
        assert b"".join(syms) == w.encode()  # lossless
    # trained words compress below raw byte length
    assert len(bpe.bpe_encode_word(b" hello", ranks)) < 6


def test_bpe_tokenize_distributed(ray_session):
    import ray

    from json_to_parquet_ray.pipelines import bpe

    texts = ["the cat sat on the mat", "the cats sat", "on a mat!",
             "", "the the the"] * 40
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    out1, merges = bpe.bpe_tokenize(
        ray.data.from_arrow(tbl).repartition(1), vocab_size=256 + 30,
        concurrency=2)
    out7, _ = bpe.bpe_tokenize(
        ray.data.from_arrow(tbl).repartition(7), vocab_size=256 + 30,
        concurrency=2)
    d1 = out1.to_pandas().sort_values("doc_id").reset_index(drop=True)
    d7 = out7.to_pandas().sort_values("doc_id").reset_index(drop=True)
    # batch-layout invariant
    assert (d1["bpe_token_count"] == d7["bpe_token_count"]).all()
    assert d1.loc[3, "bpe_token_count"] == 0  # empty doc
    # exact per-doc count == sum of per-word encode lengths
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    import re as _re
    w_re = _re.compile(bpe._WORD_RE)
    for i in (0, 1, 4):
        want = sum(len(bpe.bpe_encode_word(w.encode(), ranks))
                   for w in w_re.findall(texts[i]))
        assert d1.loc[i, "bpe_token_count"] == want


def test_bpe_conformance_matches_independent_naive(ray_session):
    """The distributed pipeline (incremental trainer + rank-greedy
    encoder + actor-pool id emission) must agree exactly with the
    independent naive reference (from-scratch pair recount, sequential
    in-order merge application) on the conformance corpus — this is the
    invariant the driver's golden `bpe_tokenize` oracle is generated
    from (tools/naive_bpe_reference.py)."""
    import ray

    from json_to_parquet_ray.pipelines.bpe import (
        BPE_CONFORMANCE_CORPUS,
        BPE_CONFORMANCE_VOCAB,
        bpe_tokenize,
    )
    from tools.naive_bpe_reference import naive_tokenize

    items = [{"doc_id": i, "text": t}
             for i, t in enumerate(BPE_CONFORMANCE_CORPUS)]
    out, merges = bpe_tokenize(
        ray.data.from_items(items).repartition(4),
        vocab_size=BPE_CONFORMANCE_VOCAB, concurrency=2, emit_ids=True)
    got = out.to_pandas().sort_values("doc_id").reset_index(drop=True)

    rows, naive_merges = naive_tokenize(BPE_CONFORMANCE_CORPUS,
                                        BPE_CONFORMANCE_VOCAB)
    assert merges == naive_merges
    for di, n, ids in rows:
        assert int(got.loc[di, "bpe_token_count"]) == n
        assert got.loc[di, "bpe_token_ids"] == ids
    # ids decode losslessly: every id is a valid vocab entry
    vocab = {b: bytes([b]) for b in range(256)}
    for i, (a, b) in enumerate(merges):
        vocab.setdefault(256 + i, a + b)
    joined = b"".join(vocab[int(x)]
                      for x in rows[0][2].split(",")).decode()
    assert joined.replace(" ", "") == \
        BPE_CONFORMANCE_CORPUS[0].replace(" ", "")


def test_multimodal_resize_stub():
    payloads = [bytes(range(256)) * 40, b"ab", b"", None]
    t = pa.table({"media_id": pa.array(range(4), pa.int64()),
                  "payload": pa.array(payloads, pa.binary())})
    stage = multimodal.ResizeMedia(target=(224, 224))
    out = stage(t)
    assert out.column_names == ["media_id", "resized", "target_w", "target_h"]
    r = out.column("resized").to_pylist()
    budget = max(224 * 224 // 256, 16)
    assert len(r[0]) == budget and len(r[0]) < len(payloads[0])  # shrank
    assert r[1] == b"ab" and r[2] == b"" and r[3] is None  # null preserved
    assert set(out.column("target_w").to_pylist()) == {224}
    # deterministic
    out2 = multimodal.ResizeMedia(target=(224, 224))(t)
    assert out.column("resized").equals(out2.column("resized"))
    # byte content is a stride-sample of the source
    stride = len(payloads[0]) // budget
    assert r[0][:4] == bytes(payloads[0][i * stride] for i in range(4))


def test_embedding_near_dup_batch_layout_invariant(ray_session):
    import ray

    rng = np.random.default_rng(17)
    emb = rng.standard_normal((600, 24))
    emb[100] = emb[7] + 1e-5
    emb[550] = emb[7] - 1e-5 * rng.standard_normal(24)
    tbl = pa.table({
        "vec_id": pa.array(range(600), pa.int64()),
        "embedding": pa.array(list(emb.astype(float)), pa.list_(pa.float64())),
    })
    outs = []
    for parts in (1, 7, 13):
        pairs = dedup.embedding_near_dup_pairs(
            ray.data.from_arrow(tbl).repartition(parts),
            threshold=0.999).to_pandas()
        outs.append(sorted(zip(pairs["a"], pairs["b"])))
    assert outs[0] == outs[1] == outs[2]
    assert (7, 100) in outs[0] and (7, 550) in outs[0]


def test_keyed_store_pkey_injective_fuzz(ray_session, tmp_path):
    """Randomized: adversarial key values (salt-suffix lookalikes, colons,
    unicode, length-prefix spoofs) — every chunk stays single-key and
    every key reads back exactly its own rows."""
    import pandas as pd
    import ray

    from json_to_parquet_ray.pipelines.keyed_store import (
        keyed_encode, keyed_read,
    )

    keys = ["en", "en#s0", "en#s1", "2:en", "3:en#s0", "é#s2", ":", "a:b",
            "5:é#s2", ""]
    rng = np.random.default_rng(4)
    rows = []
    for i in range(600):
        rows.append({"k": keys[int(rng.integers(0, len(keys)))], "doc_id": i})
    # make 'en' hot
    rows += [{"k": "en", "doc_id": 600 + i} for i in range(300)]
    df = pd.DataFrame(rows)
    out = str(tmp_path / "fz")
    keyed_encode(ray.data.from_pandas(df), out, key_col="k",
                 salt_col="doc_id", hot_threshold=120, salt_buckets=3)
    for k in keys:
        ds, _ = keyed_read(out, keys=[k])
        got = ds.to_pandas()
        want = df[df["k"] == k]
        assert len(got) == len(want), k
        if len(got):
            assert set(got["k"]) == {k}


def test_multimodal_force_stub_is_stub_even_with_decoder():
    """force_stub pins the deterministic fake regardless of installed
    libraries — the oracled query's golden SQL depends on it."""
    payloads = [b"\x89PNG fake bytes" * 100, None]
    t = pa.table({"media_id": pa.array(range(2), pa.int64()),
                  "payload": pa.array(payloads, pa.binary())})
    out = multimodal.DecodeMedia(force_stub=True)(t)
    assert out.column("decode_ok").to_pylist() == [True, False]
    assert out.column("n_bytes").to_pylist() == [1500, 0]
    # stub dims are the deterministic fake, not a real decode
    assert out.column("width").to_pylist()[0] >= 16


@pytest.mark.skipif(not multimodal.try_import_pillow(),
                    reason="Pillow not installed in this container")
def test_multimodal_real_decode_with_pillow():
    """When Pillow exists, DecodeMedia decodes real image headers: a
    valid PNG yields its true dimensions, garbage yields decode_ok=False
    with null dims, and the schema matches the stub path exactly."""
    import io

    import PIL.Image

    buf = io.BytesIO()
    PIL.Image.new("RGB", (20, 10)).save(buf, format="PNG")
    png = buf.getvalue()
    t = pa.table({"media_id": pa.array(range(3), pa.int64()),
                  "payload": pa.array([png, b"not an image", None],
                                      pa.binary())})
    stage = multimodal.DecodeMedia()
    assert stage.has_decoder
    out = stage(t)
    assert out.column("width").to_pylist() == [20, None, None]
    assert out.column("height").to_pylist() == [10, None, None]
    assert out.column("decode_ok").to_pylist() == [True, False, False]
    assert out.column("n_bytes").to_pylist() == [len(png), 12, 0]
    stub = multimodal.DecodeMedia(force_stub=True)(t)
    assert stub.schema.equals(out.schema)


def test_media_pipeline_chains_decode_and_features(ray_session):
    """Round-4 review: media_pipeline must actually deliver decode AND
    feature columns (DecodeMedia keeps the payload through for
    ExtractFeatures, which drops it)."""
    import ray

    t = pa.table({"media_id": pa.array(range(8), pa.int64()),
                  "payload": pa.array([bytes([i] * 50) for i in range(8)],
                                      pa.binary())})
    out = multimodal.media_pipeline(ray.data.from_arrow(t)).to_pandas()
    cols = set(out.columns)
    assert {"media_id", "width", "height", "decode_ok",
            "feat_nnz", "feat_argmax"} <= cols
    assert "payload" not in cols
    assert len(out) == 8


def test_ann_empty_bucket_batches(ray_session):
    """Round-4 review: nprobe pruning leaves whole batches empty — the
    brute-force and bucket-assign stages must pass them through instead
    of crashing on a (0,0) matmul."""
    import ray

    rng = np.random.default_rng(5)
    emb = rng.standard_normal((40, 8))
    t = pa.table({"vec_id": pa.array(range(40), pa.int64()),
                  "embedding": pa.array([list(map(float, v)) for v in emb])})
    ds = ray.data.from_arrow(t).repartition(8)
    # filter that empties most blocks
    import pyarrow.compute as _pc

    sparse = ds.map_batches(
        lambda b: b.filter(_pc.less(b.column("vec_id"), 3)),
        batch_format="pyarrow")
    df = ann.brute_force_topk(sparse, emb[:2], k=2)
    assert set(df["query_id"]) == {0, 1}
    out = ann.assign_buckets(sparse, emb[:4]).to_pandas()
    assert len(out) == 3 and "ivf_bucket" in out.columns


def test_cluster_min_label_exact_big_ids(ray_session):
    """Round-4 review: node ids >= 2^53 must survive min-label
    propagation exactly (the bucket merge previously round-tripped
    null-bearing int64 columns through pandas float64)."""
    import ray

    from json_to_parquet_ray.pipelines.dedup import cluster_min_label

    big = 2**53
    edges = pa.table({
        "a": pa.array([big, big + 1, 7], pa.int64()),
        "b": pa.array([big + 1, big + 3, 9], pa.int64()),
    })
    labels = cluster_min_label(ray.data.from_arrow(edges)).to_pandas()
    got = dict(zip(labels["node"].astype("int64"),
                   labels["label"].astype("int64")))
    assert got[big] == big and got[big + 1] == big and got[big + 3] == big
    assert got[7] == 7 and got[9] == 7


# ------------------------------------------------------------- weighted mix


def test_weighted_mix_md5_matches_duckdb(ray_session):
    """The md5 sampling family must match DuckDB's predicate exactly —
    the documented SQL-parity contract in pipelines/mix.py."""
    import duckdb
    import ray

    from json_to_parquet_ray.pipelines import mix

    tbl = pa.table({"doc_id": pa.array(range(500), pa.int64()),
                    "lang": pa.array(["en", "de"] * 250, pa.string())})
    rate = 0.3
    got = (mix.bernoulli_sample(ray.data.from_arrow(tbl), "doc_id", rate,
                                hash_fn="md5")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", tbl)
    want = con.execute(
        "SELECT * FROM t WHERE CAST(('0x' || substr(md5(CAST(doc_id AS "
        "VARCHAR)), 1, 8)) AS BIGINT) % 4294967296 < "
        f"CAST(floor({rate} * 4294967296) AS BIGINT) ORDER BY doc_id"
    ).df()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert 0 < len(got) < 500


def test_stratified_sample_per_group_rates(ray_session):
    """Per-group rates: each group keeps ~rate of its rows with the SAME
    rows the flat bernoulli_sample would keep at that rate (one shared
    rule, grouped lookup); unlisted and null groups use default_rate;
    rate 0 empties its group; layout-invariant."""
    import ray

    from json_to_parquet_ray.pipelines import mix

    n = 1200
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "lang": pa.array((["en", "de", "fr", None] * (n // 4)),
                         pa.string()),
    })
    rates = {"en": 0.25, "fr": 1.0, "zz": 0.9, "de": 0.0}
    base = {}
    for nb in (1, 5):
        ds = ray.data.from_arrow(tbl).repartition(nb)
        out = (mix.stratified_sample(ds, rates, "lang", "doc_id",
                                     default_rate=0.5)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        base[nb] = out
    pd.testing.assert_frame_equal(base[1], base[5])
    out = base[1]
    g = out.groupby(out.lang.fillna("<null>")).size()
    assert "de" not in g  # rate 0 → empty
    assert g.get("fr", 0) == n // 4  # rate 1 → everything
    assert 0 < g.get("en", 0) < n // 4
    # null group sampled at default_rate, against the flat-sample rows
    flat = (mix.bernoulli_sample(
        ray.data.from_arrow(tbl.filter(pa.compute.is_null(tbl["lang"]))),
        "doc_id", 0.5).to_pandas())
    assert (sorted(out[out.lang.isna()].doc_id)
            == sorted(flat.doc_id))


def test_weighted_mix_deterministic_and_layout_free(ray_session):
    """Fast-family sampling: identical selection at any batch layout,
    rate within KMV-ish tolerance, rate>=1 keeps everything."""
    import ray

    from json_to_parquet_ray.pipelines import mix

    tbl = pa.table({"k": pa.array(range(20_000), pa.int64())})
    picks = []
    for blocks in (1, 7, 13):
        ds = ray.data.from_arrow(tbl).repartition(blocks)
        out = mix.bernoulli_sample(ds, "k", 0.25).to_pandas()
        picks.append(sorted(out["k"].tolist()))
    assert picks[0] == picks[1] == picks[2]
    assert abs(len(picks[0]) / 20_000 - 0.25) < 0.02
    full = mix.bernoulli_sample(ray.data.from_arrow(tbl), "k", 1.0)
    assert full.count() == 20_000


def test_weighted_mix_union_and_labels(ray_session):
    import ray

    from json_to_parquet_ray.pipelines import mix

    docs = pa.table({"k": pa.array(range(1000), pa.int64())})
    out = mix.weighted_mix(
        [("wiki", ray.data.from_arrow(docs), 1.0),
         ("crawl", ray.data.from_arrow(docs), 0.2)],
        key_col="k").to_pandas()
    by = out.groupby("mix_source").size().to_dict()
    assert by["wiki"] == 1000
    assert 100 < by["crawl"] < 300
    # per-corpus selections are independent slices of the SAME key hash
    crawl_keys = set(out[out.mix_source == "crawl"]["k"])
    assert crawl_keys < set(range(1000))


def test_weighted_mix_null_keys_dropped(ray_session):
    """Null keys are never sampled — matching the DuckDB predicate,
    which evaluates md5(NULL) to NULL and filters the row out; and the
    fast family must not crash on string keys with nulls (fill_null(0)
    on a string array raised ArrowTypeError)."""
    import duckdb
    import ray

    from json_to_parquet_ray.pipelines import mix

    tbl = pa.table({
        "k": pa.array(["a", None, "b", "c", None, "d"], pa.string()),
        "v": pa.array(range(6), pa.int64())})
    got = (mix.bernoulli_sample(ray.data.from_arrow(tbl), "k", 0.9,
                                hash_fn="md5").to_pandas())
    con = duckdb.connect(); con.register("t", tbl)
    want = con.execute(
        "SELECT * FROM t WHERE CAST(('0x' || substr(md5(k), 1, 8)) AS "
        "BIGINT) % 4294967296 < CAST(floor(0.9 * 4294967296) AS BIGINT) "
        "ORDER BY v").df()
    assert sorted(got["v"].tolist()) == want["v"].tolist()
    fast = mix.bernoulli_sample(ray.data.from_arrow(tbl), "k", 0.99).to_pandas()
    assert fast["k"].notna().all()
    # a null in the batch must not change non-null keys' hashes: int keys
    # with/without a null select the same non-null rows
    base = pa.table({"k": pa.array(range(1000), pa.int64())})
    with_null = pa.table({"k": pa.array(list(range(1000)) + [None], pa.int64())})
    s1 = set(mix.bernoulli_sample(ray.data.from_arrow(base), "k", 0.3)
             .to_pandas()["k"])
    s2 = set(mix.bernoulli_sample(ray.data.from_arrow(with_null), "k", 0.3)
             .to_pandas()["k"].dropna())
    assert s1 == s2

    with pytest.raises(ValueError):
        mix.weighted_mix([], key_col="k")


def test_weighted_mix_label_collision_raises(ray_session):
    import ray

    from json_to_parquet_ray.pipelines import mix

    t = pa.table({"k": pa.array([1, 2], pa.int64()),
                  "mix_source": pa.array(["x", "y"], pa.string())})
    ds = mix.weighted_mix([("a", ray.data.from_arrow(t), 1.0)], key_col="k")
    with pytest.raises(Exception, match="mix_source"):
        ds.materialize()


def test_ann_empty_dataset_paths(ray_session):
    """brute_force_topk on an empty dataset returns a typed empty frame
    with the dataset's ACTUAL key dtype; the IVF sampler raises a clear
    error instead of take_batch's opaque one."""
    import ray

    from json_to_parquet_ray.pipelines import ann

    empty = ray.data.from_arrow(pa.table({
        "vec_id": pa.array([], pa.string()),
        "embedding": pa.array([], pa.list_(pa.float32()))}))
    q = np.ones((1, 4), np.float64)
    out = ann.brute_force_topk(empty, q, key="vec_id")
    assert len(out) == 0 and out["vec_id"].dtype == object
    with pytest.raises(ValueError, match="empty dataset"):
        ann.stratified_vec_sample(empty, "embedding", 16)


def test_ann_string_key_empty_batches(ray_session):
    """Empty blocks must emit the key column at the key's real type —
    a hardcoded int64 empty schema clashed with string-keyed data
    blocks."""
    import ray

    from json_to_parquet_ray.pipelines import ann

    rng = np.random.default_rng(5)
    t = pa.table({
        "vec_id": pa.array([f"v{i}" for i in range(40)], pa.string()),
        "embedding": pa.array(rng.standard_normal((40, 8)).astype(
            np.float32).tolist(), pa.list_(pa.float32()))})
    # force several blocks, some of which topk_batch will see empty after
    # an upstream filter
    ds = ray.data.from_arrow(t).repartition(8).filter(
        lambda r: not r["vec_id"].endswith("7"))
    out = ann.brute_force_topk(ds, np.ones((2, 8)), k=3, key="vec_id")
    assert set(out["query_id"]) == {0, 1}
    assert all(isinstance(v, str) for v in out["vec_id"])


def test_extract_features_null_payload_is_null(ray_session):
    """A NULL payload must produce a NULL feature vector (DecodeMedia's
    null-marking convention), not a fabricated all-zero vector."""
    t = pa.table({"media_id": pa.array([1, 2], pa.int64()),
                  "payload": pa.array([b"abc", None], pa.binary())})
    out = multimodal.ExtractFeatures()(t)
    feats = out.column("features")
    assert feats.is_valid().to_pylist() == [True, False]
    assert out.column("feat_nnz").to_pylist() == [3, 0]
    assert out.column("feat_argmax").is_valid().to_pylist() == [True, False]
