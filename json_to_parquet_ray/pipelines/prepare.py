"""End-to-end training-corpus preparation: the composite pipeline a
100 TB webtext job actually runs, chaining the engine's text operators
as ONE lazy Ray Dataset graph (no materialization between stages except
the paragraph-dedup count pass, which is inherently two-pass):

    language filter → length quality gate → paragraph boilerplate
    removal → exact dedup → whitespace token count

Every stage is an existing, individually-oracled operator; this module
adds only the composition. Registered as the `corpus_prepare` reserve
query with a single chained DuckDB oracle replicating the whole graph,
so the INTEGRATION (stage order, column flow, dedup interplay) is
value-checked, not just the pieces.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def prepare_corpus(ds, *, lang: str = "en", lang_col: str = "lang",
                   text_col: str = "text", key: str = "doc_id",
                   min_chars: int = 150, boiler_min_count: int = 2):
    """Returns a Dataset of (key, text, n_removed, ws_tokens): documents
    in ``lang`` with at least ``min_chars`` characters, corpus-duplicated
    paragraphs stripped (see ``dedup.paragraph_dedup``), then exact-
    deduplicated on the cleaned text (min-``key`` survivor — docs whose
    text was ALL boilerplate collapse to one empty-text row), with a
    whitespace token count of the cleaned text.

    Scale shape: the two filters are vectorized batch kernels fused into
    the read; paragraph dedup shuffles only (hash, count) pairs; exact
    dedup shuffles (hash, key) + group rows of the ALREADY cleaned and
    filtered corpus — each stage strictly shrinks the data the next one
    moves."""
    from .dedup import exact_dedup, paragraph_dedup
    from .text import _TOKEN_RE

    def gate(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.equal(b.column(lang_col), lang),
            pc.greater_equal(pc.utf8_length(b.column(text_col)),
                             min_chars))
        return b.filter(pc.fill_null(keep, False)).select([key, text_col])

    gated = ds.map_batches(gate, batch_format="pyarrow")
    cleaned = paragraph_dedup(gated, text_col=text_col, key=key,
                              min_count=boiler_min_count)
    deduped = exact_dedup(cleaned, col="text", key=key)

    def count_tokens(b: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(b.column("text"), _TOKEN_RE)
        return b.append_column("ws_tokens", n.cast(pa.int64()))

    return deduped.map_batches(count_tokens, batch_format="pyarrow")
