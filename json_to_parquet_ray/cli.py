"""CLI orchestrator — reference parity with Manager.main (Manager.java:8-35),
which took (input JSON file, output dir) and wrote one Parquet file.

    python -m json_to_parquet_ray.cli json2parquet IN... OUT_DIR
    python -m json_to_parquet_ray.cli encode IN... OUT_DIR [--no-resume]
    python -m json_to_parquet_ray.cli verify OUT_DIR
    python -m json_to_parquet_ray.cli decode OUT_DIR PARQUET_OUT_DIR

Only this entry point owns the Ray session (library code never inits).
Designed to be driven by ``ray job submit -- python -m json_to_parquet_ray.cli ...``
on a real cluster; locally it starts a local session.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="json_to_parquet_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    j2p = sub.add_parser("json2parquet", help="reference CLI: JSON docs → parquet")
    j2p.add_argument("inputs", nargs="+")
    j2p.add_argument("out_dir")
    j2p.add_argument("--mode", choices=["engine", "conformance"], default="engine")

    enc = sub.add_parser("encode", help="partitioned codec-auto-selected encode")
    enc.add_argument("inputs", nargs="+")
    enc.add_argument("out_dir")
    enc.add_argument("--no-resume", action="store_true")
    enc.add_argument("--shared-dicts", default=None,
                     help="comma-separated columns, or 'auto'")
    enc.add_argument("--max-rows-per-partition", type=int, default=None)

    ver = sub.add_parser("verify", help="bit-identical decode verification")
    ver.add_argument("out_dir")

    dec = sub.add_parser("decode", help="decode chunks back to parquet")
    dec.add_argument("out_dir")
    dec.add_argument("parquet_out")

    args = p.parse_args(argv)
    ray = _ray_session()
    try:
        if args.cmd == "json2parquet":
            from .json_source import json_to_parquet_job

            schema = json_to_parquet_job(args.inputs, args.out_dir, mode=args.mode)
            print(json.dumps({"out": args.out_dir,
                              "schema": [f"{f.name}:{f.type}" for f in schema]}))
        elif args.cmd == "encode":
            from .pipelines.encode_job import encode_job

            shared = args.shared_dicts
            if shared and shared != "auto":
                shared = shared.split(",")
            summary = encode_job(args.inputs, args.out_dir,
                                 resume=not args.no_resume,
                                 shared_dict_columns=shared,
                                 max_rows_per_partition=args.max_rows_per_partition)
            print(json.dumps(summary))
        elif args.cmd == "verify":
            from .pipelines.encode_job import verify_job

            res = verify_job(args.out_dir)
            print(json.dumps(res))
            return 0 if not res["failed"] else 1
        elif args.cmd == "decode":
            from .pipelines.encode_job import decode_dataset

            decode_dataset(args.out_dir).write_parquet(args.parquet_out)
            print(json.dumps({"out": args.parquet_out}))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
