"""Human-readable table formatting.

Capability mirror of /root/reference/arrow-cast/src/pretty.rs:61
pretty_format_batches (the +---+ ascii grid the arrow ecosystem prints)."""

from __future__ import annotations

from typing import List, Sequence

from ..core import batch as bt


def _fmt(v) -> str:
    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, float):
        return repr(v)
    return str(v)


def pretty_format_batches(batches, max_rows: int = 100) -> str:
    if isinstance(batches, bt.RecordBatch):
        batches = [batches]
    if not batches:
        return "(no batches)"
    names = batches[0].schema.names
    rows: List[List[str]] = []
    for b in batches:
        cols = [c.to_pylist() for c in b.columns]
        for tup in zip(*cols):
            rows.append([_fmt(v) for v in tup])
            if len(rows) >= max_rows:
                break
        if len(rows) >= max_rows:
            break
    widths = [len(n) for n in names]
    for r in rows:
        for i, cell in enumerate(r):
            widths[i] = max(widths[i], len(cell))
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    out = [sep]
    out.append("| " + " | ".join(n.ljust(w) for n, w in zip(names, widths)) + " |")
    out.append(sep)
    for r in rows:
        out.append("| " + " | ".join(c.ljust(w) for c, w in zip(r, widths)) + " |")
    out.append(sep)
    return "\n".join(out)


def print_batches(batches, max_rows: int = 100):
    print(pretty_format_batches(batches, max_rows))
