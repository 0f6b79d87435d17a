"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (partitioned codec-auto-selected
encode → manifest → decode → verify) on /root/testdata/sf0.001.
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 plus the training-data-pipeline extras (dedup, ANN, text
analysis, multimodal stubs).

Ray is initialised by the driver BEFORE this module is imported — nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import shutil
import tempfile
from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship: encode sf0.001 documents with per-chunk codec selection,
    verify bit-identical decode, and return the decoded rows as a Dataset."""
    import os

    from json_to_parquet_ray.pipelines.encode_job import (
        decode_dataset,
        encode_job,
        verify_job,
    )

    out_dir = os.path.join(tempfile.gettempdir(), "jtpr_entry_out")
    shutil.rmtree(out_dir, ignore_errors=True)
    summary = encode_job(
        os.path.join(SF_SMOKE, "documents.parquet"), out_dir,
        shared_dict_columns=["lang"],
    )
    ver = verify_job(out_dir)
    assert ver["failed"] == [], f"bit-identical verification failed: {ver}"
    return decode_dataset(out_dir)


def queries() -> dict[str, Callable[[str], Any]]:
    from json_to_parquet_ray.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from json_to_parquet_ray.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
