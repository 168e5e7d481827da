"""Command-line tools over the engine.

Capability mirror of the reference's CLI layer (parquet/src/bin/ — 11 tools:
parquet-read/schema/rowcount/layout/concat/... — SURVEY §2.3):

  python -m arrowtpu.cli cat FILE [--max-rows N] [--columns a,b]
  python -m arrowtpu.cli schema FILE
  python -m arrowtpu.cli rowcount FILE
  python -m arrowtpu.cli convert SRC DST       (format by extension)
  python -m arrowtpu.cli bench [--rows N]      (on-device kernel microbench)

Formats are detected by extension/magic: .parquet, .arrow/.ipc (file),
.arrows (stream), .csv, .json/.jsonl.
"""

from __future__ import annotations

import argparse
import json as _json
import sys
import time


def _detect(path: str) -> str:
    p = path.lower()
    if p.endswith(".parquet") or p.endswith(".pq"):
        return "parquet"
    if p.endswith(".arrow") or p.endswith(".ipc") or p.endswith(".feather"):
        return "ipc-file"
    if p.endswith(".arrows"):
        return "ipc-stream"
    if p.endswith(".csv"):
        return "csv"
    if p.endswith(".json") or p.endswith(".jsonl") or p.endswith(".ndjson"):
        return "json"
    with open(path, "rb") as f:
        head = f.read(8)
    if head[:4] == b"PAR1":
        return "parquet"
    if head[:6] == b"ARROW1":
        return "ipc-file"
    if head[:4] == b"\xff\xff\xff\xff":
        return "ipc-stream"
    return "csv"


def _read(path: str, columns=None):
    from .formats import csv as acsv, ipc as aipc, json as ajson, parquet as apq
    from .ops.concat import concat_batches

    kind = _detect(path)
    if kind == "parquet":
        return apq.read_parquet(open(path, "rb").read(), columns=columns)
    if kind == "ipc-file":
        batches = aipc.read_file(open(path, "rb").read())
    elif kind == "ipc-stream":
        batches = aipc.read_stream(open(path, "rb").read())
    elif kind == "csv":
        b = acsv.read_csv(path)
        return b.project(columns) if columns else b
    else:
        b = ajson.read_json(path)
        return b.project(columns) if columns else b
    out = batches[0] if len(batches) == 1 else concat_batches(batches)
    return out.project(columns) if columns else out


def cmd_cat(args):
    from .utils.pretty import pretty_format_batches

    cols = args.columns.split(",") if args.columns else None
    batch = _read(args.file, cols)
    print(pretty_format_batches(batch, max_rows=args.max_rows))


def cmd_schema(args):
    batch = _read(args.file)
    for f in batch.schema.fields:
        null = "" if f.nullable else " NOT NULL"
        print(f"{f.name}: {f.dtype}{null}")


def cmd_rowcount(args):
    batch = _read(args.file)
    print(int(batch.length))


def cmd_convert(args):
    from .formats import csv as acsv, ipc as aipc, json as ajson, parquet as apq

    batch = _read(args.src)
    kind = _detect(args.dst) if "." in args.dst else "parquet"
    with open(args.dst, "wb") as f:
        if kind == "parquet":
            f.write(apq.write_parquet(batch))
        elif kind == "ipc-file":
            f.write(aipc.write_file(batch))
        elif kind == "ipc-stream":
            f.write(aipc.write_stream(batch))
        elif kind == "csv":
            f.write(acsv.write_csv(batch).encode())
        else:
            f.write(ajson.write_json(batch).encode())
    print(f"wrote {args.dst}")


def cmd_bench(args):
    import jax
    import numpy as np

    from . import ops
    from .utils import datagen

    n = args.rows
    rng = datagen.seedable_rng(0)
    c = datagen.create_primitive_column(n, 0.1, rng=rng)
    f = jax.jit(lambda x: ops.filter_(x, ops.gt(x, 0)))
    out = f(c)
    jax.block_until_ready(out.values)
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        out = f(c)
    jax.block_until_ready(out.values)
    dt = (time.perf_counter() - t0) / reps
    print(
        _json.dumps(
            {
                "op": "filter(gt)",
                "rows": n,
                "seconds": dt,
                "rows_per_s": n / dt,
                "device": str(jax.devices()[0]),
            }
        )
    )


def cmd_json_integration(args):
    """Mirror of the reference's arrow-json-integration-test binary
    (arrow-integration-testing/src/bin/arrow-json-integration-test.rs):
    JSON-to-ARROW, ARROW-to-JSON, and VALIDATE modes over the archery
    JSON test format (integration.py) and the IPC file format."""
    from . import integration as ig
    from .formats import ipc
    from .ops.equal import equal_batches

    mode = args.mode.upper()
    if mode == "JSON_TO_ARROW":
        _, batches = ig.read_json_file(args.json)
        with open(args.arrow, "wb") as f:
            f.write(ipc.write_file(batches))
        print(f"wrote {args.arrow}")
    elif mode == "ARROW_TO_JSON":
        with open(args.arrow, "rb") as f:
            batches = ipc.read_file(f.read())
        ig.write_json_file(batches, args.json)
        print(f"wrote {args.json}")
    elif mode == "VALIDATE":
        _, jb = ig.read_json_file(args.json)
        with open(args.arrow, "rb") as f:
            ab = ipc.read_file(f.read())
        if len(jb) != len(ab):
            raise SystemExit(
                f"batch count mismatch: json={len(jb)} arrow={len(ab)}")
        for i, (x, y) in enumerate(zip(jb, ab)):
            if not bool(equal_batches(x, y)):
                raise SystemExit(f"batch {i} differs")
        print("validation OK")
    else:
        raise SystemExit(f"unknown mode {args.mode}")


def main(argv=None):
    p = argparse.ArgumentParser(prog="arrowtpu", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    for name, fn in [("cat", cmd_cat), ("schema", cmd_schema), ("rowcount", cmd_rowcount)]:
        sp = sub.add_parser(name)
        sp.add_argument("file")
        if name == "cat":
            sp.add_argument("--max-rows", type=int, default=40)
            sp.add_argument("--columns", default=None)
        sp.set_defaults(fn=fn)
    sp = sub.add_parser("convert")
    sp.add_argument("src")
    sp.add_argument("dst")
    sp.set_defaults(fn=cmd_convert)
    sp = sub.add_parser("bench")
    sp.add_argument("--rows", type=int, default=1 << 20)
    sp.set_defaults(fn=cmd_bench)
    sp = sub.add_parser("json-integration")
    sp.add_argument("--mode", required=True,
                    help="JSON_TO_ARROW | ARROW_TO_JSON | VALIDATE")
    sp.add_argument("--json", required=True)
    sp.add_argument("--arrow", required=True)
    sp.set_defaults(fn=cmd_json_integration)
    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
