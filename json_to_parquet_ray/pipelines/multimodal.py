"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

This container has no image/audio libraries, so by default the media
decode falls back to a STUBBED (clearly marked) deterministic fake — but
all Ray-side plumbing is real and tested: schemas, actor-pool
signatures, batch sizing for large binary payloads, and the output
layout a downstream training pipeline would consume. When Pillow IS
installed, ``DecodeMedia`` automatically uses it (``_decode_real``);
``force_stub=True`` pins the fake for environment-independent oracles.

Pattern: an actor-pool ``map_batches`` stage with small ``batch_size``
(large payloads → a batch x concurrency must fit the worker heap) whose
``__init__`` would load the decoder model once per actor.
"""

from __future__ import annotations



import numpy as np
import pyarrow as pa

FEATURE_DIM = 64

MEDIA_SCHEMA = pa.schema([
    pa.field("media_id", pa.int64()),
    pa.field("payload", pa.binary()),
    pa.field("mime", pa.string()),
])


def _binary_buffers(col: pa.Array):
    """(offs, data, lens, valid) for a binary-like array — the shared
    buffer-extraction idiom of all three stages (it was copy-pasted with
    drifting null handling). Null slots are filled with b"" BEFORE the
    buffers are read: the Arrow spec leaves a null slot's offsets
    unspecified, so reading them risked histogramming garbage bytes.
    ``valid`` is None when the column has no nulls."""
    import pyarrow.compute as pc

    arr = col.cast(pa.large_binary())
    valid = None
    if arr.null_count:
        valid = pc.is_valid(arr).to_numpy(zero_copy_only=False)
        arr = arr.fill_null(b"")
    n = len(arr)
    offs = np.frombuffer(arr.buffers()[1], np.int64, count=n + 1,
                         offset=arr.offset * 8)
    buf = arr.buffers()[2]
    data = (np.frombuffer(buf, np.uint8)[offs[0]:offs[-1]]
            if buf is not None else np.zeros(0, np.uint8))
    offs = offs - offs[0]
    return offs, data, offs[1:] - offs[:-1], valid


def try_import_pillow():
    try:  # pragma: no cover - not present in this container
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


class DecodeMedia:
    """Actor-pool stage: binary payload → (width, height, n_bytes, ok).

    With a real decoder installed this would call it; here the stub
    derives deterministic pseudo-dimensions from the payload bytes so the
    pipeline shape, schema and tests are real.
    """

    def __init__(self, payload_col: str = "payload", strict: bool = False,
                 force_stub: bool = False, keep_payload: bool = False):
        # force_stub pins the deterministic fake even when Pillow exists —
        # the oracled query uses it so its golden SQL is environment-
        # independent; real pipelines leave it False and get the real
        # decoder automatically when the library is installed.
        # keep_payload threads the binary column through to a downstream
        # payload consumer (media_pipeline chains ExtractFeatures).
        self.payload_col = payload_col
        self.has_decoder = try_import_pillow() and not force_stub
        self.strict = strict
        self.keep_payload = keep_payload

    def _finish(self, batch: pa.Table) -> pa.Table:
        return batch if self.keep_payload \
            else batch.drop_columns([self.payload_col])

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if self.strict and not self.has_decoder:
            raise NotImplementedError(
                "media decode requires an image library not present in this "
                "container; run with strict=False for the deterministic stub")
        if self.has_decoder:
            return self._decode_real(batch)
        col = batch.column(self.payload_col).combine_chunks()
        # STUB fake dimensions from (length, first byte) — vectorized; a
        # real decoder would replace this (and is inherently per-item)
        offs, data, lens, valid = _binary_buffers(col)
        if valid is None:
            valid = np.ones(len(col), bool)
        first = np.zeros(len(col), np.uint64)
        nz = lens > 0
        first[nz] = data[offs[:-1][nz]]
        mix = (lens.astype(np.uint64) * np.uint64(2654435761)
               ) ^ (first << np.uint64(7))
        w = (16 + (mix % np.uint64(1024))).astype(np.int32)
        h = (16 + ((mix >> np.uint64(10)) % np.uint64(1024))).astype(np.int32)
        mask = ~valid
        return (self._finish(batch)
                .append_column("width", pa.array(w, pa.int32(), mask=mask))
                .append_column("height", pa.array(h, pa.int32(), mask=mask))
                .append_column("n_bytes", pa.array(lens, pa.int64()))
                .append_column("decode_ok", pa.array(valid)))

    def _decode_real(self, batch: pa.Table) -> pa.Table:
        """REAL decode path, used automatically when Pillow is installed:
        per-item PIL header decode (inherently per-payload — image headers
        are not batch-decodable) inside the actor, same output schema as
        the stub. A payload that fails to parse gets decode_ok=False and
        null dimensions instead of poisoning the batch."""
        import io

        import PIL.Image

        col = batch.column(self.payload_col)
        ws, hs, lens, oks = [], [], [], []
        for v in col.to_pylist():
            if v is None:
                ws.append(None), hs.append(None)
                lens.append(0), oks.append(False)
                continue
            lens.append(len(v))
            try:
                with PIL.Image.open(io.BytesIO(v)) as im:
                    ws.append(int(im.width)), hs.append(int(im.height))
                    oks.append(True)
            except Exception:
                ws.append(None), hs.append(None), oks.append(False)
        return (self._finish(batch)
                .append_column("width", pa.array(ws, pa.int32()))
                .append_column("height", pa.array(hs, pa.int32()))
                .append_column("n_bytes", pa.array(lens, pa.int64()))
                .append_column("decode_ok", pa.array(oks, pa.bool_())))


class ExtractFeatures:
    """Actor-pool stage: binary payload → fixed-size float32 feature vector
    plus integer summary features.

    STUB feature extractor: 64-bin byte histogram, L2-normalized — a
    deterministic stand-in with the exact schema (fixed_size list of
    float32) a real embedding model stage would produce. Fully vectorized:
    one ``np.bincount`` over (row_index*dim + byte%dim) for the whole
    batch, no per-row Python. The integer features (``feat_nnz`` occupied
    bins, ``feat_argmax`` dominant bin, ties → smallest) are
    SQL-expressible, giving the stage a hard DuckDB oracle.
    """

    def __init__(self, payload_col: str = "payload", dim: int = FEATURE_DIM):
        self.payload_col = payload_col
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.payload_col).combine_chunks()
        n = len(col)
        offs, data, lens, valid = _binary_buffers(col)
        row_of = np.repeat(np.arange(n), lens)
        hist = np.bincount(row_of * self.dim + (data % self.dim).astype(np.int64),
                           minlength=n * self.dim).reshape(n, self.dim)
        norms = np.linalg.norm(hist.astype(np.float32), axis=1, keepdims=True)
        feats = hist.astype(np.float32) / np.maximum(norms, np.float32(1e-12))
        nnz = (hist > 0).sum(axis=1).astype(np.int64)
        argmax = hist.argmax(axis=1).astype(np.int64)
        out = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.ravel(), pa.float32()), self.dim)
        if valid is not None:
            # NULL payload → NULL feature vector, matching DecodeMedia's
            # null-dims convention — an all-zero vector was
            # indistinguishable from a real empty (b"") payload
            out = out.take(pa.array(np.arange(n), type=pa.int64(),
                                    mask=~valid))
        return (batch.drop_columns([self.payload_col])
                .append_column("features", out)
                .append_column("feat_nnz", pa.array(nnz, pa.int64()))
                .append_column("feat_argmax",
                               pa.array(argmax, pa.int64(), mask=nnz == 0)))


class ResizeMedia:
    """Actor-pool stage: binary payload → resized binary payload plus the
    (target_w, target_h) metadata a downstream loader needs.

    STUB resize: with no image library in the container, the "resized"
    payload is a deterministic byte-stride downsample of the original
    whose length scales with target_area/source_area — the real
    contract (output smaller, deterministic, schema'd binary + dims) is
    kept and tested; a real decoder+resampler drops into ``__call__``.
    Vectorized: one ``binary_slice``-free gather via numpy index math
    per batch, no per-row Python.
    """

    def __init__(self, payload_col: str = "payload",
                 target: tuple[int, int] = (224, 224)):
        self.payload_col = payload_col
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = batch.column(self.payload_col).combine_chunks()
        n = len(col)
        if n == 0:  # Ray delivers empty blocks; np.repeat math below
            # broadcasts a (1,) seed against (0,) and crashes
            return (batch.drop_columns([self.payload_col])
                    .append_column("resized", pa.array([], pa.binary()))
                    .append_column("target_w", pa.array([], pa.int32()))
                    .append_column("target_h", pa.array([], pa.int32())))
        offs, data, lens, valid_np = _binary_buffers(col)
        # STUB: keep ~(target_area / est_source_area) of the bytes via a
        # per-row stride; floor 1 byte for non-empty payloads
        tw, th = self.target
        budget = max(tw * th // 256, 16)  # stub bytes-per-image budget
        out_lens = np.minimum(lens, budget)
        strides = np.maximum(lens // np.maximum(out_lens, 1), 1)
        # gather indices: for each row, offs[i] + stride*k for k<out_len
        row_of = np.repeat(np.arange(n), out_lens)
        k = np.arange(len(row_of)) - np.repeat(
            np.concatenate([[0], np.cumsum(out_lens)[:-1]]), out_lens)
        idx = offs[:-1][row_of] + strides[row_of] * k
        sel = data[np.minimum(idx, np.repeat(offs[1:] - 1, out_lens))] \
            if len(row_of) else np.zeros(0, np.uint8)
        out = pa.LargeBinaryArray.from_buffers(
            pa.large_binary(), n,
            [None, pa.py_buffer(np.concatenate(
                [[0], np.cumsum(out_lens)]).astype(np.int64).tobytes()),
             pa.py_buffer(sel.tobytes())])
        if valid_np is not None:
            out = pc.if_else(pa.array(valid_np), out,
                             pa.scalar(None, pa.large_binary()))
        return (batch.drop_columns([self.payload_col])
                .append_column("resized", out.cast(pa.binary()))
                .append_column("target_w", pa.array(
                    np.full(n, tw, np.int32), pa.int32()))
                .append_column("target_h", pa.array(
                    np.full(n, th, np.int32), pa.int32())))


def frame_sample_batch(batch: pa.Table, payload_col: str = "payload",
                       every: int = 4096, max_frames: int = 8) -> pa.Table:
    """STUB video frame-sampler: slices the payload at fixed strides —
    real frame decode would replace the slicing; the explode layout
    (one output row per sampled frame, media_id carried along) is real.

    Vectorized: one ``binary_slice`` kernel call per frame INDEX (≤
    ``max_frames`` calls per batch), never a Python loop over rows."""
    import numpy as np
    import pyarrow.compute as pc

    pay = batch.column(payload_col)
    if isinstance(pay, pa.ChunkedArray):
        pay = pay.combine_chunks()
    ids = batch.column("media_id")
    lens = pc.binary_length(pay)
    lens_np = pc.fill_null(lens, 0).to_numpy(zero_copy_only=False)
    n_frames = np.clip(lens_np // every, 1, max_frames)
    n_frames[lens_np == 0] = 0

    pieces = []
    row_pos = np.arange(len(batch))
    for fi in range(int(n_frames.max()) if len(n_frames) else 0):
        m = n_frames > fi
        sel = pa.array(m)
        pieces.append(pa.table({
            "_pos": pa.array(row_pos[m], pa.int64()),
            "media_id": ids.filter(sel),
            "frame_index": pa.array(
                np.full(int(m.sum()), fi, np.int32), pa.int32()),
            "frame": pc.binary_slice(pay.filter(sel),
                                     start=fi * every,
                                     stop=fi * every + 256),
        }))
    if not pieces:
        return pa.table({
            "media_id": pa.array([], pa.int64()),
            "frame_index": pa.array([], pa.int32()),
            "frame": pa.array([], pa.binary()),
        })
    t = pa.concat_tables(pieces)
    # restore row-major (input row, frame) order
    order = pc.sort_indices(t, sort_keys=[("_pos", "ascending"),
                                          ("frame_index", "ascending")])
    t = t.take(order).drop_columns(["_pos"])
    return pa.table({
        "media_id": t.column("media_id").cast(pa.int64()),
        "frame_index": t.column("frame_index"),
        "frame": t.column("frame").cast(pa.binary()),
    })


def media_pipeline(ds, batch_size: int = 64, concurrency=(1, 4)):
    """decode → features over a binary column; small batches on purpose
    (payloads are large). DecodeMedia keeps the payload through so
    ExtractFeatures can consume it; ExtractFeatures drops it."""
    decoded = ds.map_batches(DecodeMedia, batch_size=batch_size,
                             batch_format="pyarrow", concurrency=concurrency,
                             fn_constructor_kwargs={"keep_payload": True})
    return decoded.map_batches(ExtractFeatures, batch_size=batch_size,
                               batch_format="pyarrow",
                               concurrency=concurrency)
