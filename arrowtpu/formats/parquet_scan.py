"""Parquet scan pushdown: RowSelection algebra, RowFilter predicate
pushdown, and statistics / bloom-filter / page-index pruning on read.

Capability mirror of the reference's most complex call stack (SURVEY
§3.4):
  * RowSelection / RowSelector run-length algebra —
    parquet/src/arrow/arrow_reader/selection/mod.rs:118 (and_then :291,
    intersection :214, union :244, from_filters :160)
  * RowFilter / ArrowPredicate — arrow_reader/filter.rs:29 (predicates
    evaluated in order over their own column projections, each narrowing
    the selection before expensive columns decode)
  * ReadPlan — arrow_reader/read_plan.rs:111-166
  * StatisticsConverter-based row-group pruning —
    arrow_reader/statistics.rs:1463
  * page-index pruning (column index min/max + offset index page row
    ranges) — the reference's `with_row_selection` from page index
  * ArrowReaderMetrics — arrow_reader/metrics.rs:119 (here ScanMetrics:
    tests assert a selective scan provably decodes fewer pages)

TPU-native split: the scan PLAN (selections, pruning, page skipping) is
host/numpy metadata math; the scan DATA PLANE (predicate evaluation on
decoded batches, final row compaction) runs the engine's own device
kernels (ops/cmp + ops/filter -> Pallas compaction on TPU).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from .. import schema as st
from ..core import batch as bt


# ---------------------------------------------------------------------------
# RowSelection (run-length algebra; reference selection/mod.rs:118)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class RowSelector:
    """A run of rows to select or skip (reference RowSelector)."""

    row_count: int
    skip: bool

    @staticmethod
    def select(n: int) -> "RowSelector":
        return RowSelector(n, False)

    @staticmethod
    def skip_(n: int) -> "RowSelector":
        return RowSelector(n, True)


class RowSelection:
    """Ordered run-length selection over a row range."""

    def __init__(self, selectors: Sequence[RowSelector] = ()):
        self.selectors: Tuple[RowSelector, ...] = tuple(
            s for s in _normalize(selectors) if s.row_count > 0
        )

    # -- constructors ------------------------------------------------------

    @staticmethod
    def select_all(n: int) -> "RowSelection":
        return RowSelection([RowSelector.select(n)])

    @staticmethod
    def skip_all(n: int) -> "RowSelection":
        return RowSelection([RowSelector.skip_(n)])

    @staticmethod
    def from_mask(mask: np.ndarray) -> "RowSelection":
        """Boolean mask -> run-length selection (reference from_filters,
        selection/mod.rs:160)."""
        mask = np.asarray(mask, bool)
        if mask.size == 0:
            return RowSelection()
        change = np.nonzero(np.diff(mask))[0] + 1
        bounds = np.concatenate([[0], change, [mask.size]])
        sels = [
            RowSelector(int(b - a), not bool(mask[a]))
            for a, b in zip(bounds[:-1], bounds[1:])
        ]
        return RowSelection(sels)

    @staticmethod
    def from_ranges(ranges: Sequence[Tuple[int, int]], total: int) -> "RowSelection":
        """Sorted, non-overlapping [start, end) ranges -> selection
        (reference from_consecutive_ranges)."""
        sels: List[RowSelector] = []
        pos = 0
        for a, b in ranges:
            if a > pos:
                sels.append(RowSelector.skip_(a - pos))
            sels.append(RowSelector.select(b - a))
            pos = b
        if pos < total:
            sels.append(RowSelector.skip_(total - pos))
        return RowSelection(sels)

    # -- queries -----------------------------------------------------------

    def row_count(self) -> int:
        """Selected rows."""
        return sum(s.row_count for s in self.selectors if not s.skip)

    def total_rows(self) -> int:
        return sum(s.row_count for s in self.selectors)

    def selects_any(self) -> bool:
        return any(not s.skip and s.row_count for s in self.selectors)

    def to_mask(self, total: Optional[int] = None) -> np.ndarray:
        n = total if total is not None else self.total_rows()
        out = np.zeros(n, bool)
        pos = 0
        for s in self.selectors:
            if not s.skip:
                out[pos : pos + s.row_count] = True
            pos += s.row_count
        if pos < n:
            out[pos:] = True  # beyond the selection: selected (ref. trails)
        return out

    def iter_ranges(self):
        pos = 0
        for s in self.selectors:
            if not s.skip:
                yield (pos, pos + s.row_count)
            pos += s.row_count

    # -- algebra -----------------------------------------------------------

    def and_then(self, other: "RowSelection") -> "RowSelection":
        """Compose: `other` is expressed over THIS selection's selected
        rows (reference and_then, selection/mod.rs:291)."""
        assert other.total_rows() == self.row_count(), (
            other.total_rows(), self.row_count())
        mask = self.to_mask(self.total_rows())
        inner = other.to_mask(self.row_count())
        out = np.zeros(self.total_rows(), bool)
        out[np.nonzero(mask)[0]] = inner
        return RowSelection.from_mask(out)

    def intersection(self, other: "RowSelection") -> "RowSelection":
        n = max(self.total_rows(), other.total_rows())
        return RowSelection.from_mask(self.to_mask(n) & other.to_mask(n))

    def union(self, other: "RowSelection") -> "RowSelection":
        n = max(self.total_rows(), other.total_rows())
        return RowSelection.from_mask(self.to_mask(n) | other.to_mask(n))

    def split_off(self, row_count: int) -> Tuple["RowSelection", "RowSelection"]:
        """First `row_count` total rows, rest (reference split_off)."""
        head: List[RowSelector] = []
        tail: List[RowSelector] = []
        remaining = row_count
        for s in self.selectors:
            if remaining <= 0:
                tail.append(s)
            elif s.row_count <= remaining:
                head.append(s)
                remaining -= s.row_count
            else:
                head.append(RowSelector(remaining, s.skip))
                tail.append(RowSelector(s.row_count - remaining, s.skip))
                remaining = 0
        return RowSelection(head), RowSelection(tail)

    def __eq__(self, other):
        return isinstance(other, RowSelection) and self.selectors == other.selectors

    def __repr__(self):
        return "RowSelection(%s)" % ", ".join(
            f"{'skip' if s.skip else 'sel'}({s.row_count})" for s in self.selectors
        )


def _normalize(selectors):
    out: List[RowSelector] = []
    for s in selectors:
        if out and out[-1].skip == s.skip:
            out[-1] = RowSelector(out[-1].row_count + s.row_count, s.skip)
        else:
            out.append(s)
    return out


# ---------------------------------------------------------------------------
# predicates
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class ColumnPredicate:
    """Simple (column op literal) predicate: usable both for pruning
    (against min/max statistics and bloom filters) and for row-level
    evaluation with the engine's comparison kernels."""

    column: str
    op: str  # eq, ne, lt, lt_eq, gt, gt_eq
    value: object

    def may_match_range(self, mn, mx, null_count=None) -> bool:
        """Can any row in [mn, mx] satisfy the predicate?  None bounds
        mean unknown -> must read."""
        if mn is None or mx is None:
            return True
        v = self.value
        try:
            if self.op == "eq":
                return mn <= v <= mx
            if self.op == "ne":
                return not (mn == v == mx)
            if self.op == "lt":
                return mn < v
            if self.op == "lt_eq":
                return mn <= v
            if self.op == "gt":
                return mx > v
            if self.op == "gt_eq":
                return mx >= v
        except TypeError:
            return True
        return True

    def evaluate(self, batch: bt.RecordBatch):
        """Row-level mask via the engine's kernels (device path)."""
        from ..ops import cmp as oc

        c = batch[self.column]
        fn = {"eq": oc.eq, "ne": oc.neq, "lt": oc.lt, "lt_eq": oc.lt_eq,
              "gt": oc.gt, "gt_eq": oc.gt_eq}[self.op]
        return fn(c, self.value)


@dataclasses.dataclass
class ArrowPredicate:
    """General predicate: projection + callable producing a BooleanColumn
    (reference ArrowPredicateFn, filter.rs:100)."""

    columns: Tuple[str, ...]
    fn: Callable[[bt.RecordBatch], object]

    def may_match_range(self, mn, mx, null_count=None) -> bool:
        return True  # opaque: cannot prune

    def evaluate(self, batch: bt.RecordBatch):
        return self.fn(batch)


def _pred_columns(p) -> Tuple[str, ...]:
    return (p.column,) if isinstance(p, ColumnPredicate) else tuple(p.columns)


@dataclasses.dataclass
class RowFilter:
    """Ordered predicate list (reference RowFilter, filter.rs:29): each
    predicate reads only its own columns and narrows the selection before
    later predicates / the final projection decode."""

    predicates: List[object]


# ---------------------------------------------------------------------------
# metrics (reference ArrowReaderMetrics, metrics.rs:119)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class ScanMetrics:
    row_groups_total: int = 0
    row_groups_pruned_statistics: int = 0
    row_groups_pruned_bloom_filter: int = 0
    pages_total: int = 0
    pages_skipped: int = 0
    bytes_decompressed: int = 0
    rows_decoded: int = 0
    rows_matched: int = 0
    predicate_evaluations: int = 0

    def asdict(self):
        return dataclasses.asdict(self)


# ---------------------------------------------------------------------------
# pruning
# ---------------------------------------------------------------------------


def prune_row_groups(pf, predicates: Sequence[object],
                     metrics: Optional[ScanMetrics] = None) -> List[int]:
    """Row groups that may contain matching rows, using chunk statistics
    and (for equality predicates) bloom filters."""
    metrics = metrics if metrics is not None else ScanMetrics()
    keep = []
    for rg in range(len(pf.row_groups)):
        ok = True
        for p in predicates:
            if not isinstance(p, ColumnPredicate):
                continue
            stats = pf.statistics(rg, p.column)
            if stats is not None:
                if not _may_match(p, stats):
                    metrics.row_groups_pruned_statistics += 1
                    ok = False
                    break
            if p.op == "eq" and not pf.bloom_might_contain(rg, p.column, p.value):
                metrics.row_groups_pruned_bloom_filter += 1
                ok = False
                break
        if ok:
            keep.append(rg)
    return keep


def _stat_value(v):
    return v.encode() if isinstance(v, str) else v


def _may_match(p: ColumnPredicate, stats) -> bool:
    mn, mx = stats.get("min"), stats.get("max")
    v = _stat_value(p.value)
    if isinstance(mn, (bytes, bytearray)) and isinstance(v, (bytes, str)):
        v = v.encode() if isinstance(v, str) else v
    return p.may_match_range(mn, mx) if not isinstance(v, bytes) else \
        ColumnPredicate(p.column, p.op, v).may_match_range(mn, mx)


def page_selection(pf, rg: int, predicates: Sequence[object],
                   num_rows: int) -> Optional[RowSelection]:
    """Build a RowSelection from the column index (per-page min/max) and
    offset index (per-page first_row_index) of every predicate column.
    Returns None when no page index is available (read everything)."""
    sel: Optional[RowSelection] = None
    for p in predicates:
        if not isinstance(p, ColumnPredicate):
            continue
        ci = pf.column_index(rg, p.column)
        oi = pf.offset_index(rg, p.column)
        if ci is None or oi is None:
            continue
        phys = _column_phys(pf, rg, p.column)
        firsts = [row for (_, _, row) in oi]
        bounds = firsts[1:] + [num_rows]
        ranges = []
        for k in range(len(firsts)):
            if ci["null_pages"][k]:
                mm = (None, None)
            else:
                mm = (_decode_stat(ci["min_values"][k], phys),
                      _decode_stat(ci["max_values"][k], phys))
            if p.may_match_range(*_coerce(mm, p.value)):
                ranges.append((firsts[k], bounds[k]))
        psel = RowSelection.from_ranges(_merge_ranges(ranges), num_rows)
        sel = psel if sel is None else sel.intersection(psel)
    return sel


def _merge_ranges(ranges):
    out = []
    for a, b in ranges:
        if out and a <= out[-1][1]:
            out[-1] = (out[-1][0], max(out[-1][1], b))
        else:
            out.append((a, b))
    return out


def _coerce(mm, value):
    mn, mx = mm
    if isinstance(value, str) and isinstance(mn, (bytes, bytearray)):
        return mn, mx
    return mn, mx


def _column_phys(pf, rg: int, column: str) -> int:
    idx = pf._leaf_idx(column)
    return pf.row_groups[rg][1][idx][3][1]


def _decode_stat(b, phys):
    import struct as _s

    from .parquet import P_DOUBLE, P_FLOAT, P_I32, P_I64

    if b is None or len(b) == 0:
        return None
    if phys == P_I32:
        return _s.unpack("<i", b)[0]
    if phys == P_I64:
        return _s.unpack("<q", b)[0]
    if phys == P_FLOAT:
        return _s.unpack("<f", b)[0]
    if phys == P_DOUBLE:
        return _s.unpack("<d", b)[0]
    return bytes(b)


# ---------------------------------------------------------------------------
# selective scan
# ---------------------------------------------------------------------------


def scan_parquet(source, columns: Optional[List[str]] = None, *,
                 predicates: Sequence[object] = (),
                 metrics: Optional[ScanMetrics] = None):
    """Read with pushdown: row-group pruning (statistics + bloom), page
    pruning (column/offset index), page-skipping decode, then row-level
    predicate evaluation with the engine's kernels and a final device
    filter.  Returns (RecordBatch, ScanMetrics)."""
    from .parquet import ParquetFile

    pf = source if isinstance(source, ParquetFile) else ParquetFile(source)
    m = metrics if metrics is not None else ScanMetrics()
    m.row_groups_total = len(pf.row_groups)
    preds = list(predicates)
    keep_rgs = prune_row_groups(pf, preds, m) if preds else list(
        range(len(pf.row_groups)))

    out_batches = []
    for rg in keep_rgs:
        b = _scan_row_group(pf, rg, columns, preds, m)
        if b is not None:
            out_batches.append(b)
    if not out_batches:
        names = columns or pf.schema.names
        fields = tuple(pf.schema.fields[pf.schema.index_of(n)] for n in names)
        from ..core import column as ccol

        empty = tuple(
            ccol.from_pylist([], f.dtype) for f in fields
        )
        return bt.RecordBatch(st.Schema(fields), empty), m
    if len(out_batches) == 1:
        return out_batches[0], m
    from ..ops.concat import concat_batches

    return concat_batches(out_batches), m


def _scan_row_group(pf, rg: int, columns, preds, m: ScanMetrics):
    num_rows = pf.row_groups[rg][3]
    sel = page_selection(pf, rg, preds, num_rows) if preds else None
    if sel is not None and not sel.selects_any():
        # every page of some predicate column is excluded
        for name in (columns or pf.schema.names):
            m.pages_total += _count_pages(pf, rg, name)
            m.pages_skipped += _count_pages(pf, rg, name)
        return None

    # 1. decode predicate columns (page-skipped by the selection)
    pred_cols: List[str] = []
    for p in preds:
        for c in _pred_columns(p):
            if c not in pred_cols:
                pred_cols.append(c)

    mask_np = sel.to_mask(num_rows) if sel is not None else None
    batch_cache = {}
    for name in pred_cols:
        batch_cache[name] = _read_column_selected(pf, rg, name, sel, m)

    # 2. evaluate predicates in order on the decoded (page-surviving) rows
    import jax

    import numpy as _np

    from ..core import bitmap as bm

    base = mask_np if mask_np is not None else _np.ones(num_rows, bool)
    surviving = base.copy()
    if preds:
        nrows_dec = int(base.sum())   # rows actually decoded
        pb = bt.RecordBatch(
            st.Schema(tuple(
                pf.schema.fields[pf.schema.index_of(n)] for n in pred_cols)),
            tuple(batch_cache[n] for n in pred_cols),
        )
        for p in preds:
            mcol = p.evaluate(pb)
            m.predicate_evaluations += 1
            ok = _np.asarray(jax.device_get(mcol.valid_bool() &
                                            bm.unpack(mcol.values)))[:nrows_dec]
            inner = _np.zeros(num_rows, bool)
            inner[_np.nonzero(base)[0]] = ok   # decode-row -> global row
            surviving = surviving & inner
        m.rows_matched += int(surviving.sum())
        if not surviving.any():
            return None

    # 3. decode the projection columns under the (page-level) selection,
    #    then compact to exactly the surviving rows with the engine filter
    names = columns or pf.schema.names
    fields = []
    cols = []
    fine = surviving[mask_np] if mask_np is not None else surviving
    for name in names:
        fields.append(pf.schema.fields[pf.schema.index_of(name)])
        if name in batch_cache:
            c = batch_cache[name]
        else:
            c = _read_column_selected(pf, rg, name, sel, m)
        cols.append(c)
    from ..interop.pyarrow_bridge import _equalize

    batch = bt.RecordBatch(st.Schema(tuple(fields)), _equalize(tuple(cols)))
    if preds:
        from ..core import column as ccol
        from ..ops import filter as flt

        mask_col = ccol.boolean(_pad_mask(fine, batch.columns[0].capacity))
        batch = flt.filter_record_batch(batch, mask_col)
    return batch


def _pad_mask(mask: np.ndarray, cap: int) -> np.ndarray:
    out = np.zeros(cap, bool)
    out[: mask.size] = mask
    return out


def _count_pages(pf, rg: int, column: str) -> int:
    oi = pf.offset_index(rg, column)
    return len(oi) if oi is not None else 1


def _read_column_selected(pf, rg: int, name: str, sel: Optional[RowSelection],
                          m: ScanMetrics):
    """Decode one flat column chunk, skipping pages with no selected rows
    (page row ranges from the offset index).  Falls back to full decode
    for nested columns or without an offset index."""
    from .parquet_nested import is_nested

    fi = pf.schema.index_of(name)
    field = pf.schema.fields[fi]
    start = pf._field_leaf_start[fi]
    num_rows = pf.row_groups[rg][3]
    if is_nested(field.dtype):
        b = pf.read_row_group(rg, [name])
        m.rows_decoded += num_rows
        return b.columns[0]
    chunk = pf.row_groups[rg][1][start]
    oi = pf.offset_index(rg, name)
    if sel is None or oi is None:
        m.pages_total += _count_pages(pf, rg, name)
        m.rows_decoded += num_rows
        c = pf._read_chunk(chunk, field.dtype, num_rows, field.nullable,
                           tl=pf._leaf_info[start][4])
        if sel is not None:
            # selection exists but this column lacks an offset index:
            # decode all, then drop unselected rows host-side
            c = _host_take_mask(c, sel.to_mask(num_rows), field.dtype)
        return c
    keep_pages = _pages_with_selected_rows(oi, sel, num_rows)
    m.pages_total += len(oi)
    m.pages_skipped += len(oi) - sum(keep_pages)
    values, valid, rows_dec, page_rows = _decode_pages(
        pf, chunk, oi, keep_pages, field, start, m)
    m.rows_decoded += rows_dec
    # rows decoded = rows of surviving pages; restrict the global mask to
    # those pages, then align to the selection's surviving-row order
    page_mask = np.zeros(num_rows, bool)
    firsts = [row for (_, _, row) in oi] + [num_rows]
    for k, kept in enumerate(keep_pages):
        if kept:
            page_mask[firsts[k]: firsts[k + 1]] = True
    sel_mask = sel.to_mask(num_rows)
    inner = sel_mask[page_mask]  # which decoded rows are selected
    from .parquet import _assemble

    c = _assemble(values, valid, pf.row_groups[rg][1][start][3][1],
                  field.dtype, rows_dec)
    return _host_take_mask(c, inner, field.dtype)


def _host_take_mask(c, mask: np.ndarray, dtype):
    """Drop unselected rows with the engine's filter kernel."""
    del dtype
    if mask.all():
        return c
    from ..core import column as ccol
    from ..ops import filter as flt

    return flt.filter_(c, ccol.boolean(_pad_mask(mask, c.capacity)))


def _pages_with_selected_rows(oi, sel: RowSelection, num_rows: int):
    firsts = [row for (_, _, row) in oi] + [num_rows]
    mask = sel.to_mask(num_rows)
    return [bool(mask[firsts[k]: firsts[k + 1]].any())
            for k in range(len(oi))]


def _decode_pages(pf, chunk, oi, keep_pages, field, leaf_start, m):
    """Decode only the surviving data pages (dictionary page always)."""
    import struct as _s

    from . import thrift
    from .parquet import _decompress

    cm = chunk[3]
    phys = cm[1]
    codec = cm[4]
    tl = pf._leaf_info[leaf_start][4]
    dictionary = None
    # dictionary page (if any) sits before the first data page
    dict_off = cm.get(11)
    if dict_off is not None:
        r = thrift.Reader(pf.buf, dict_off)
        hdr = r.read_struct()
        body = _decompress(codec, pf.buf[r.pos: r.pos + hdr[3]], hdr[2])
        m.bytes_decompressed += hdr[2]
        dph = hdr[7]
        dictionary = pf._decode_dict_page(body, phys, dph[1], tl=tl)
    values = []
    valid_parts = []
    rows = 0
    page_rows = []
    for k, (off, _size, _first) in enumerate(oi):
        if not keep_pages[k]:
            page_rows.append(0)
            continue
        r = thrift.Reader(pf.buf, off)
        hdr = r.read_struct()
        if hdr[1] == 2:  # leading dictionary page shares the offset list
            body = _decompress(codec, pf.buf[r.pos: r.pos + hdr[3]], hdr[2])
            dph = hdr[7]
            dictionary = pf._decode_dict_page(body, phys, dph[1], tl=tl)
            r = thrift.Reader(pf.buf, r.pos + hdr[3])
            hdr = r.read_struct()
        body = _decompress(codec, pf.buf[r.pos: r.pos + hdr[3]], hdr[2])
        m.bytes_decompressed += hdr[2]
        dph = hdr[5]
        nvals = dph[1]
        vals, defs, _reps = pf._decode_data_page(
            body, phys, dph[2], nvals, dictionary,
            1 if field.nullable else 0, 0, tl=tl)
        values.append(vals)
        valid_parts.append(defs == 1 if defs is not None
                           else np.ones(nvals, bool))
        rows += nvals
        page_rows.append(nvals)
    valid = (np.concatenate(valid_parts) if valid_parts
             else np.zeros(0, bool))
    return values, valid, rows, page_rows


# ---------------------------------------------------------------------------
# IO/compute overlap (reference async_reader/mod.rs:704-868 prefetch
# state machine; push_decoder/mod.rs:378 sans-IO loop)
# ---------------------------------------------------------------------------


def scan_batches_overlapped(source, columns: Optional[List[str]] = None, *,
                            predicates: Sequence[object] = (),
                            metrics: Optional[ScanMetrics] = None,
                            prefetch: int = 2):
    """Iterator of per-row-group RecordBatches with host decode overlapped
    against consumer (device) compute: row group N+1..N+prefetch decode on
    a background thread while the caller computes on N — the synchronous
    mirror of the reference's async prefetch state machine
    (parquet/src/arrow/async_reader/mod.rs:704-868).

    The host side (thrift framing, decompression, level decode) runs
    without the GIL for its zlib/zstd/numpy portions, so a device-bound
    consumer genuinely overlaps it; a two-row-group scan's wall clock is
    measurably below the sum of its decode and compute phases
    (tests/test_parquet_scan.py::test_overlapped_scan_wall_clock).
    """
    import queue
    import threading

    from .parquet import ParquetFile

    pf = source if isinstance(source, ParquetFile) else ParquetFile(source)
    m = metrics if metrics is not None else ScanMetrics()
    m.row_groups_total = len(pf.row_groups)
    preds = list(predicates)
    keep_rgs = prune_row_groups(pf, preds, m) if preds else list(
        range(len(pf.row_groups)))

    q: "queue.Queue" = queue.Queue(maxsize=max(prefetch, 1))
    _END = object()
    stop = threading.Event()

    def _put(item) -> bool:
        """Bounded put that gives up when the consumer abandoned the
        generator (round-3 advisor finding: a plain q.put blocked forever
        and leaked the thread + pinned the file buffer)."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for rg in keep_rgs:
                if stop.is_set():
                    return
                b = _scan_row_group(pf, rg, columns, preds, m)
                if b is not None and not _put(b):
                    return
            _put(_END)
        except BaseException as e:  # propagate into the consumer
            _put(e)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        # consumer done or abandoned (GeneratorExit lands here): release
        # the producer, drain anything in flight, and only then hand the
        # (producer-mutated) metrics back via return
        stop.set()
        while not q.empty():
            try:
                q.get_nowait()
            except queue.Empty:
                break
        t.join()
