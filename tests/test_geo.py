"""Geo family (SURVEY §2.10): WKB codec round-trip, shoelace area,
ray-cast containment, Geo1 explode ratios, Geo3 dissolve, and the
grid-blocked point-in-polygon join (Geo7)."""

from __future__ import annotations

import math

import pytest

from pudl_spark.functions.geo import (
    add_area, dissolve, envelope, explode_parts, geometry_area,
    geometry_contains, multipolygon_wkb, parse_wkb, point_wkb,
    points_in_polygons_join, polygon_wkb,
)

UNIT_SQ = [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)]
BIG_SQ = [(10.0, 10.0), (14.0, 10.0), (14.0, 14.0), (10.0, 14.0)]
HOLE = [(0.25, 0.25), (0.75, 0.25), (0.75, 0.75), (0.25, 0.75)]


def test_wkb_roundtrip_and_area():
    poly = polygon_wkb(UNIT_SQ, [HOLE])
    kind, rings = parse_wkb(poly)
    assert kind == "polygon" and len(rings) == 2
    assert geometry_area(("polygon", rings)) == pytest.approx(1.0 - 0.25)
    mp = multipolygon_wkb([polygon_wkb(UNIT_SQ), polygon_wkb(BIG_SQ)])
    kind, parts = parse_wkb(mp)
    assert kind == "multipolygon" and len(parts) == 2
    assert geometry_area(("multipolygon", parts)) == pytest.approx(17.0)
    assert parse_wkb(point_wkb(2.0, 3.0)) == ("point", (2.0, 3.0))


def test_containment_with_hole():
    geom = parse_wkb(polygon_wkb(UNIT_SQ, [HOLE]))
    assert geometry_contains(geom, 0.1, 0.1)          # in shell
    assert not geometry_contains(geom, 0.5, 0.5)      # in hole
    assert not geometry_contains(geom, 2.0, 2.0)      # outside
    assert envelope(geom) == (0.0, 0.0, 1.0, 1.0)


def test_explode_parts_ratio(spark):
    mp = multipolygon_wkb([polygon_wkb(UNIT_SQ), polygon_wkb(BIG_SQ)])
    df = spark.createDataFrame([("a", bytearray(mp))],
                               "gid string, geom binary")
    out = explode_parts(df, "geom").collect()
    assert len(out) == 2
    ratios = sorted(r["part_area_ratio"] for r in out)
    assert ratios == pytest.approx([1 / 17, 16 / 17])
    # each part round-trips as a single polygon
    assert all(parse_wkb(r["geom"])[0] == "polygon" for r in out)


def test_dissolve_disjoint_union(spark):
    df = spark.createDataFrame(
        [("u1", bytearray(polygon_wkb(UNIT_SQ)), 5.0),
         ("u1", bytearray(polygon_wkb(BIG_SQ)), 7.0),
         ("u2", bytearray(polygon_wkb(HOLE)), 1.0)],
        "utility string, geom binary, demand double")
    out = {r["utility"]: r
           for r in dissolve(df, ["utility"], "geom", ["demand"]).collect()}
    assert out["u1"]["demand"] == 12.0
    kind, parts = parse_wkb(out["u1"]["geom"])
    assert kind == "multipolygon" and len(parts) == 2
    assert geometry_area(("multipolygon", parts)) == pytest.approx(17.0)
    assert geometry_area(parse_wkb(out["u2"]["geom"])) \
        == pytest.approx(0.25)


def test_points_in_polygons_join(spark):
    polys = spark.createDataFrame(
        [("zone_small", bytearray(polygon_wkb(UNIT_SQ))),
         ("zone_big", bytearray(polygon_wkb(BIG_SQ)))],
        "zone string, geom binary")
    pts = spark.createDataFrame(
        [(1, 0.5, 0.5), (2, 11.0, 13.0), (3, 5.0, 5.0), (4, 0.9, 0.1)],
        "pid long, x double, y double")
    got = {(r["pid"], r["zone"])
           for r in points_in_polygons_join(pts, polys, "x", "y", "geom",
                                            cell=2.0).collect()}
    assert got == {(1, "zone_small"), (4, "zone_small"), (2, "zone_big")}


def test_area_column(spark):
    df = spark.createDataFrame(
        [(1, bytearray(polygon_wkb(UNIT_SQ, [HOLE]))), (2, None)],
        "gid long, geom binary")
    rows = {r["gid"]: r["area"] for r in add_area(df, "geom").collect()}
    assert rows[1] == pytest.approx(0.75) and rows[2] is None


def test_clip_kernel_convex_square_overlap():
    from pudl_spark.functions.geo import (
        clip_kernel, geometry_area, parse_wkb)

    a = parse_wkb(polygon_wkb([(0, 0), (2, 0), (2, 2), (0, 2)]))
    b = parse_wkb(polygon_wkb([(1, 1), (3, 1), (3, 3), (1, 3)]))
    got = clip_kernel(a, b)
    assert got is not None and geometry_area(got) == pytest.approx(1.0)
    # commutes
    assert geometry_area(clip_kernel(b, a)) == pytest.approx(1.0)
    # disjoint -> None
    c = parse_wkb(polygon_wkb([(10, 10), (11, 10), (11, 11), (10, 11)]))
    assert clip_kernel(a, c) is None


def test_clip_kernel_concave_subject_and_holes():
    from pudl_spark.functions.geo import (
        clip_kernel, geometry_area, parse_wkb)

    # L-shaped (concave) subject clipped by a convex square: area of
    # the L inside x<=1 is 1x2 = 2.
    ell = parse_wkb(polygon_wkb(
        [(0, 0), (2, 0), (2, 1), (1, 1), (1, 2), (0, 2)]))
    clip = parse_wkb(polygon_wkb([(0, 0), (1, 0), (1, 2), (0, 2)]))
    assert geometry_area(clip_kernel(ell, clip)) == pytest.approx(2.0)
    # subject with a hole: hole survives the clip where it overlaps
    holed = parse_wkb(polygon_wkb(
        [(0, 0), (4, 0), (4, 4), (0, 4)],
        [[(1, 1), (3, 1), (3, 3), (1, 3)]]))
    half = parse_wkb(polygon_wkb([(0, 0), (2, 0), (2, 4), (0, 4)]))
    # left half: 2*4 = 8 minus clipped hole 1x2 = 2 -> 6
    assert geometry_area(clip_kernel(holed, half)) == pytest.approx(6.0)
    # concave x concave now routes through triangulated clipping;
    # ell sits entirely inside ell2 so the intersection is ell itself
    ell2 = parse_wkb(polygon_wkb(
        [(0, 0), (3, 0), (3, 1), (1, 1), (1, 3), (0, 3)]))
    assert geometry_area(clip_kernel(ell, ell2)) == pytest.approx(3.0)


def test_overlay_area_proportional_allocation(spark):
    from pudl_spark.functions.geo import overlay

    left = spark.createDataFrame(
        [(1, bytearray(polygon_wkb([(0, 0), (2, 0), (2, 2), (0, 2)])),
          100.0)],
        "gid long, geom binary, load_mwh double")
    right = spark.createDataFrame(
        [("east", bytearray(polygon_wkb([(1, 0), (3, 0), (3, 2), (1, 2)]))),
         ("west", bytearray(polygon_wkb([(-1, 0), (1, 0), (1, 2), (-1, 2)]))),
         ("far", bytearray(polygon_wkb([(9, 9), (10, 9), (10, 10), (9, 10)])))],
        "zone string, zone_geom binary")
    out = overlay(left, right, "gid", "zone", ["load_mwh"], cell=1.5)
    rows = {r["zone"]: r for r in out.collect()}
    assert set(rows) == {"east", "west"}
    assert rows["east"]["load_mwh"] == pytest.approx(50.0)
    assert rows["west"]["load_mwh"] == pytest.approx(50.0)
    assert rows["east"]["intersection_area"] == pytest.approx(2.0)
    assert rows["east"]["area_ratio"] == pytest.approx(0.5)


# --------------------------- concave x concave (triangulated clip)

def _poly(pts):
    import numpy as np

    ring = np.array(pts + [pts[0]], dtype="float64")
    return ("polygon", [ring])


def _clip_area(a, b):
    from pudl_spark.functions.geo import clip_kernel, geometry_area

    out = clip_kernel(a, b)
    return 0.0 if out is None else geometry_area(out)


L_A = [(0, 0), (4, 0), (4, 2), (2, 2), (2, 4), (0, 4)]       # area 12
L_B = [(1, 1), (5, 1), (5, 3), (3, 3), (3, 5), (1, 5)]       # A shifted


def test_triangulate_ring_covers_polygon():
    import numpy as np

    from pudl_spark.functions.geo import ring_area, triangulate_ring

    ring = np.array(L_A, dtype="float64")
    tris = triangulate_ring(ring)
    assert len(tris) == len(L_A) - 2
    total = sum(abs(ring_area(np.vstack([t, t[:1]]))) for t in tris)
    assert total == pytest.approx(12.0)


def test_concave_concave_rectilinear_exact():
    # two interlocking L-shapes; intersection decomposes into
    # [1,4]x[1,2] + [1,2]x[2,3] + [1,2]x[3,4] = 3 + 1 + 1 = 5
    a, b = _poly(L_A), _poly(L_B)
    assert _clip_area(a, b) == pytest.approx(5.0, abs=1e-9)
    # intersection commutes
    assert _clip_area(b, a) == pytest.approx(5.0, abs=1e-9)
    # self-intersection is the polygon itself
    assert _clip_area(a, a) == pytest.approx(12.0, abs=1e-9)


def test_concave_concave_nonaxis_grid_checked():
    # a concave arrow vs its rotated copy: verify the triangulated
    # area against dense-grid containment integration
    import numpy as np

    from pudl_spark.functions.geo import geometry_contains_many

    arrow = [(0, 0), (4, 1), (8, 0), (7, 4), (4, 2.5), (1, 4)]
    rot = [(8 - x, 4 - y) for (x, y) in arrow]       # 180-degree spin
    a, b = _poly(arrow), _poly(list(rot))
    got = _clip_area(a, b)
    xs, ys = np.meshgrid(np.linspace(0, 8, 801), np.linspace(0, 4, 401))
    xs, ys = xs.ravel(), ys.ravel()
    inside = (geometry_contains_many(a, xs, ys)
              & geometry_contains_many(b, xs, ys))
    approx = inside.mean() * 8.0 * 4.0
    assert got == pytest.approx(approx, rel=0.02)
    assert got > 0


def test_concave_with_holes_still_gated():
    import numpy as np

    outer = np.array(L_A + [L_A[0]], dtype="float64")
    hole = np.array([(0.5, 0.5), (1.0, 0.5), (1.0, 1.0), (0.5, 1.0),
                     (0.5, 0.5)], dtype="float64")
    holey = ("polygon", [outer, hole])
    with pytest.raises(NotImplementedError):
        _clip_area(holey, _poly(L_B))
