"""Property-based fuzz of JSON → Arrow inference (engine mode): for any
batch of JSON-serializable documents, ``json_docs_to_table`` must produce
a table whose rows round-trip the documents (missing keys as None)."""

import json
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from json_to_parquet_ray.json_source import json_docs_to_table, split_documents

# scalars that survive JSON + Arrow unification deterministically:
# ints within int64, finite floats, strings, bools, None
scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**62), max_value=2**62),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=12),
)

values = st.recursive(
    scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(min_size=1, max_size=6), children, max_size=4),
    ),
    max_leaves=12,
)

documents = st.dictionaries(st.text(min_size=1, max_size=6), values, max_size=5)


def normalize(v):
    """Expected engine-mode value after Arrow round-trip."""
    if isinstance(v, bool):
        return v
    if isinstance(v, dict):
        return {k: normalize(x) for k, x in v.items()}
    if isinstance(v, list):
        return [normalize(x) for x in v]
    if isinstance(v, int):
        return v
    if isinstance(v, float):
        return v
    return v


def compatible(a, b) -> bool:
    """Loose equality: Arrow may widen int→float when peers mix, struct
    fields gain None for missing keys, empty containers may carry unified
    child schemas."""
    if a is None or b is None:
        return a is None and b is None
    if isinstance(b, str) and not isinstance(a, str):
        # cross-doc scalar-type conflicts widen the field to string (the
        # documented engine resolution, schema_infer._unify_types): the
        # value becomes its JSON lexical form. Accept iff that string
        # parses back to the original value — fidelity is preserved.
        try:
            return compatible(a, json.loads(b))
        except ValueError:
            return False
    if isinstance(a, bool) or isinstance(b, bool):
        return a == b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-12)
    if isinstance(a, dict) and isinstance(b, dict):
        keys = set(a) | set(b)
        return all(compatible(a.get(k), b.get(k)) for k in keys)
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(compatible(x, y) for x, y in zip(a, b))
    return a == b


@given(st.lists(documents, min_size=1, max_size=5))
@settings(max_examples=120, deadline=None)
def test_fuzz_engine_mode_roundtrip(docs):
    texts = [json.dumps(d) for d in docs]
    try:
        table = json_docs_to_table(texts, mode="engine")
    except Exception as e:
        # unification can genuinely fail on incompatible types across docs
        # (e.g. "k": 1 vs "k": {"a": 2}); that must raise cleanly, not corrupt
        import pyarrow as pa

        assert isinstance(e, (pa.ArrowInvalid, pa.ArrowTypeError,
                              pa.ArrowNotImplementedError, ValueError,
                              TypeError)), type(e)
        return
    assert table.num_rows == len(docs)
    back = table.to_pylist()
    for doc, row in zip(docs, back):
        for k, v in doc.items():
            assert compatible(normalize(v), row.get(k)), (k, v, row.get(k))


@given(st.lists(documents, min_size=1, max_size=4))
@settings(max_examples=60, deadline=None)
def test_fuzz_splitter_roundtrip(docs):
    texts = [json.dumps(d) for d in docs]
    joined = " junk ".join(texts)
    assert split_documents(joined) == texts


@given(st.lists(documents, min_size=1, max_size=4))
@settings(max_examples=40, deadline=None)
def test_fuzz_splitter_non_ascii(docs):
    """Non-ASCII docs (ensure_ascii=False) + non-ASCII inter-doc noise.

    Note: noise must not contain unbalanced braces — a stray ``{`` outside
    any document defeats every brace-balancing splitter (the reference
    included); braces *inside strings* are the case our splitter fixes."""
    texts = [json.dumps(d, ensure_ascii=False) for d in docs]
    joined = "\n中文 noise — ünïcode ✓\n".join(texts)
    assert split_documents(joined) == texts


def test_fuzz_unify_random_type_flips(ray_session):
    """Randomized: batches of docs whose keys flip among scalar types must
    always unify + align without crashing, and the widened column keeps
    every value's lexical form."""
    import random

    from json_to_parquet_ray.json_source import json_docs_to_table

    rng = random.Random(7)
    gens = [lambda: rng.randint(-10, 10), lambda: round(rng.random(), 3),
            lambda: rng.choice(["a", "b", "x7"]), lambda: rng.random() > 0.5,
            lambda: None]
    for _ in range(10):
        docs = []
        for _ in range(rng.randint(2, 12)):
            docs.append({k: rng.choice(gens)()
                         for k in ("p", "q") if rng.random() > 0.2})
        import json as _json

        texts = [_json.dumps(d) for d in docs]
        t = json_docs_to_table(texts)
        assert t.num_rows == len(docs)
        # every non-null original value survives in SOME readable form
        for col in t.column_names:
            vals = t.column(col).to_pylist()
            orig = [d.get(col) for d in docs]
            for o, v in zip(orig, vals):
                if o is None:
                    continue
                assert v is not None, (docs, col)
