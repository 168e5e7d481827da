"""Geospatial WKB statistics: bounder, wraparound, parquet
GEOMETRY/GEOGRAPHY logical types + GeospatialStatistics round-trip
(reference parquet-geospatial/src/bounding.rs,
parquet/src/geospatial/)."""

import struct

import pytest

import arrowtpu as at
from arrowtpu import schema as st
from arrowtpu.core import batch as bt
from arrowtpu.core import column as col
from arrowtpu.formats import geospatial as G
from arrowtpu.formats import parquet as apq


def wkb_point(x, y, z=None, big=False):
    e = ">" if big else "<"
    order = b"\x00" if big else b"\x01"
    code = 1001 if z is not None else 1
    out = order + struct.pack(e + "I", code) + struct.pack(e + "dd", x, y)
    if z is not None:
        out += struct.pack(e + "d", z)
    return out


def wkb_linestring(pts):
    out = b"\x01" + struct.pack("<I", 2) + struct.pack("<I", len(pts))
    for x, y in pts:
        out += struct.pack("<dd", x, y)
    return out


def wkb_polygon(rings):
    out = b"\x01" + struct.pack("<I", 3) + struct.pack("<I", len(rings))
    for ring in rings:
        out += struct.pack("<I", len(ring))
        for x, y in ring:
            out += struct.pack("<dd", x, y)
    return out


def wkb_multipoint(pts):
    out = b"\x01" + struct.pack("<I", 4) + struct.pack("<I", len(pts))
    for x, y in pts:
        out += wkb_point(x, y)
    return out


class TestBounder:
    def test_point_bounds(self):
        b = G.GeometryBounder()
        b.update_wkb(wkb_point(1.0, 2.0))
        b.update_wkb(wkb_point(-3.0, 7.0, big=True))  # big-endian
        assert b.x() == (-3.0, 1.0)
        assert (b.y.lo, b.y.hi) == (2.0, 7.0)
        assert b.types_sorted() == [1]

    def test_z_and_types(self):
        b = G.GeometryBounder()
        b.update_wkb(wkb_point(0, 0, z=5.0))
        b.update_wkb(wkb_linestring([(0, 0), (2, 3)]))
        assert b.types_sorted() == [2, 1001]
        assert (b.z.lo, b.z.hi) == (5.0, 5.0)

    def test_polygon_multigeom(self):
        b = G.GeometryBounder()
        b.update_wkb(wkb_polygon([[(0, 0), (4, 0), (4, 4), (0, 0)]]))
        b.update_wkb(wkb_multipoint([(9, -1), (10, 2)]))
        assert b.x() == (0.0, 10.0)
        assert (b.y.lo, b.y.hi) == (-1.0, 4.0)
        assert b.types_sorted() == [3, 4]

    def test_wraparound(self):
        # features hugging the antimeridian: wraparound box is tighter
        b = G.GeometryBounder(wraparound_hint=(-180, 180))
        b.update_wkb(wkb_point(179.0, 0.0))
        b.update_wkb(wkb_point(-179.5, 1.0))
        xmin, xmax = b.x()
        assert xmin == 179.0 and xmax == -179.5  # wraparound (xmin > xmax)

    def test_no_wraparound_when_cartesian_tighter(self):
        b = G.GeometryBounder(wraparound_hint=(-180, 180))
        b.update_wkb(wkb_point(-10.0, 0.0))
        b.update_wkb(wkb_point(20.0, 0.0))
        assert b.x() == (-10.0, 20.0)

    def test_truncated_raises(self):
        with pytest.raises(st.ArrowTpuError):
            G.GeometryBounder().update_wkb(wkb_point(1, 2)[:-3])


class TestParquetGeo:
    def _write(self, geoms, geography=False, crs=None):
        f = G.geometry_field("g", crs=crs, geography=geography)
        c = col.string_view(geoms, st.binary)
        b = bt.RecordBatch(st.Schema((f,)), (c,))
        return apq.write_parquet(b)

    def test_roundtrip_with_stats(self):
        geoms = [wkb_point(1, 2), None, wkb_linestring([(0, -5), (3, 8)])]
        data = self._write(geoms, crs="OGC:CRS84")
        pf = apq.ParquetFile(data)
        ann = G.geo_annotation(pf.schema.fields[0])
        assert ann == ("geometry", "OGC:CRS84")
        stats = pf.geo_statistics(0, "g")
        assert stats.bbox.xmin == 0.0 and stats.bbox.xmax == 3.0
        assert stats.bbox.ymin == -5.0 and stats.bbox.ymax == 8.0
        assert stats.geospatial_types == [1, 2]
        # values survive as plain binary
        assert pf.read()["g"].to_pylist() == geoms
        # geometry chunks carry no ordered min/max statistics
        plain = pf.statistics(0, "g")
        assert plain is None or plain.get("min") is None

    def test_geography_annotation(self):
        data = self._write([wkb_point(0, 0)], geography=True)
        pf = apq.ParquetFile(data)
        assert G.geo_annotation(pf.schema.fields[0])[0] == "geography"

    def test_pruning_predicate(self):
        data = self._write([wkb_point(100, 10), wkb_point(120, 20)])
        stats = apq.ParquetFile(data).geo_statistics(0, "g")
        assert G.bbox_might_intersect(stats, 90, 110, 0, 30)
        assert not G.bbox_might_intersect(stats, -50, 0, 0, 30)
        assert not G.bbox_might_intersect(stats, 90, 110, 40, 50)

    def test_wraparound_pruning(self):
        data = self._write([wkb_point(179, 0), wkb_point(-179, 0)])
        stats = apq.ParquetFile(data).geo_statistics(0, "g")
        assert stats.bbox.xmin > stats.bbox.xmax  # wraparound stored
        assert G.bbox_might_intersect(stats, 179.5, 180, -1, 1)
        assert G.bbox_might_intersect(stats, -180, -179.5, -1, 1)
        assert not G.bbox_might_intersect(stats, -10, 10, -1, 1)

    def test_pyarrow_can_read_values(self):
        pa = pytest.importorskip("pyarrow")
        import io

        import pyarrow.parquet as pq

        geoms = [wkb_point(1, 2), wkb_point(3, 4)]
        data = self._write(geoms)
        t = pq.read_table(io.BytesIO(data))
        assert t.column("g").to_pylist() == geoms
