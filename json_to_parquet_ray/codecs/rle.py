"""Run-length encoding via ``pyarrow.compute.run_end_encode``.

Run ends are strictly increasing → delta+bit-packed; run values are
encoded with a recursive child codec (forbp for int-likes, plain IPC
otherwise; the planner may override). Nulls ride along in the run values
natively, so no separate validity section is needed.

Wins on the near-constant ``lang`` column and timestamp repeat runs
(FIXTURES.md F1).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .base import Codec, is_int_like, pack_sections, unpack_sections


def _child_for(t: pa.DataType) -> str:
    return "forbp" if is_int_like(t) else "plain"


class RleCodec(Codec):
    name = "rle"

    @classmethod
    def can_encode(cls, t: pa.DataType) -> bool:
        try:
            pc.run_end_encode(pa.array([], type=t))
            return True
        except (pa.ArrowNotImplementedError, pa.ArrowInvalid):
            return False

    @classmethod
    def encode(cls, arr: pa.Array, values_codec: str | None = None) -> tuple[bytes, dict]:
        from . import get_codec

        ree = pc.run_end_encode(arr, run_end_type=pa.int64())
        run_ends = ree.run_ends
        values = ree.values
        vname = values_codec or _child_for(values.type)
        ends_payload, ends_meta = get_codec("delta").encode(run_ends)
        vals_payload, vals_meta = get_codec(vname).encode(values)
        payload = pack_sections([ends_payload, vals_payload])
        meta = {
            "n": len(arr),
            "runs": len(run_ends),
            "ends_meta": ends_meta,
            "values_codec": vname,
            "values_meta": vals_meta,
        }
        return payload, meta

    @classmethod
    def decode(cls, payload: bytes, meta: dict) -> pa.Array:
        # pa.RunEndEncodedArray.from_arrays is broken in pyarrow 16.1
        # ("an integer is required"); expand with a vectorized take instead.
        import numpy as np

        from . import get_codec

        ends_payload, vals_payload = unpack_sections(payload)
        run_ends = get_codec("delta").decode(ends_payload, meta["ends_meta"])
        values = get_codec(meta["values_codec"]).decode(vals_payload, meta["values_meta"])
        ends = run_ends.to_numpy(zero_copy_only=False).astype(np.int64)
        lengths = np.diff(np.concatenate(([0], ends)))
        indices = np.repeat(np.arange(len(values), dtype=np.int64), lengths)
        return pc.take(values, pa.array(indices, pa.int64()))
