"""Independent naive BPE reference for the `bpe_tokenize` golden oracle.

Deliberately shares NO code with ``json_to_parquet_ray.pipelines.bpe``:
training rebuilds pair counts from scratch every round (no incremental
maintenance), and encoding applies merges sequentially in training order
(the classic full-pass formulation) instead of the engine's
lowest-rank-first greedy loop — the two are equivalent for BPE, so any
divergence is a real bug in one of them.

Run as a script to (re)generate the golden VALUES oracle:

    python tools/naive_bpe_reference.py
"""

from __future__ import annotations

import re

# the pre-tokenizer regex is part of the tokenizer SPEC (GPT-2-style
# leading-space convention), shared by both implementations
WORD_RE = re.compile(
    r" ?(?:'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+)")


def naive_train(docs: list[str], vocab_size: int) -> list[tuple[bytes, bytes]]:
    freqs: dict[tuple[bytes, ...], int] = {}
    for d in docs:
        for w in WORD_RE.findall(d):
            b = w.encode("utf-8")
            key = tuple(b[i:i + 1] for i in range(len(b)))
            freqs[key] = freqs.get(key, 0) + 1

    words = {k: v for k, v in freqs.items()}
    merges: list[tuple[bytes, bytes]] = []
    for _ in range(max(vocab_size - 256, 0)):
        pairs: dict[tuple[bytes, bytes], int] = {}
        for syms, f in words.items():
            for p in zip(syms, syms[1:]):
                pairs[p] = pairs.get(p, 0) + f
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        new_words: dict[tuple[bytes, ...], int] = {}
        for syms, f in words.items():
            out: list[bytes] = []
            i = 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == best[0]
                        and syms[i + 1] == best[1]):
                    out.append(best[0] + best[1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            k = tuple(out)
            new_words[k] = new_words.get(k, 0) + f
        words = new_words
    return merges


def naive_encode_word(word: bytes,
                      merges: list[tuple[bytes, bytes]]) -> list[bytes]:
    syms = [word[i:i + 1] for i in range(len(word))]
    for a, b in merges:  # sequential full passes, in training order
        out: list[bytes] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def naive_tokenize(docs: list[str], vocab_size: int):
    """Returns (rows, merges); rows = [(doc_id, token_count, ids_csv)]."""
    merges = naive_train(docs, vocab_size)
    sym_id = {bytes([b]): b for b in range(256)}
    for i, (a, b) in enumerate(merges):
        sym_id.setdefault(a + b, 256 + i)
    rows = []
    for di, d in enumerate(docs):
        ids: list[int] = []
        for w in WORD_RE.findall(d):
            ids.extend(sym_id[s] for s in naive_encode_word(
                w.encode("utf-8"), merges))
        rows.append((di, len(ids), ",".join(map(str, ids))))
    return rows, merges


if __name__ == "__main__":
    import sys

    sys.path.insert(0, ".")
    from json_to_parquet_ray.pipelines.bpe import (
        BPE_CONFORMANCE_CORPUS,
        BPE_CONFORMANCE_VOCAB,
    )

    rows, merges = naive_tokenize(BPE_CONFORMANCE_CORPUS,
                                  BPE_CONFORMANCE_VOCAB)
    print(f"-- {len(merges)} merges trained")
    vals = ", ".join(
        "({}, {}, '{}')".format(di, n, ids) for di, n, ids in rows)
    print("SELECT CAST(doc_id AS BIGINT) AS doc_id, "
          "CAST(bpe_token_count AS BIGINT) AS bpe_token_count, "
          "bpe_token_ids FROM (VALUES "
          + vals + ") AS t(doc_id, bpe_token_count, bpe_token_ids)")
