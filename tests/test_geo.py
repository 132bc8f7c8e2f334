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
    # concave x concave still gated
    ell2 = parse_wkb(polygon_wkb(
        [(0, 0), (3, 0), (3, 1), (1, 1), (1, 3), (0, 3)]))
    with pytest.raises(NotImplementedError):
        clip_kernel(ell, ell2)


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
