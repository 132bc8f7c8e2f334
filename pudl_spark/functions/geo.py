"""Geospatial operators over WKB BinaryType columns (SURVEY §2.10).

Ref: src/pudl/analysis/spatial.py:15-289 (explode/self_union/dissolve/
overlay), service_territory.py:286, and the point-in-timezone lookup
find_timezone (src/pudl/transform/eia.py:80). The reference runs
geopandas/shapely single-node; the container for this engine has no
geometry library, so this module implements the geometry kernels that
are exactly computable in pure NumPy — WKB codec, shoelace area,
ray-cast point-in-polygon, envelopes — and keeps the Spark-side shape
(grid-cell blocked spatial joins, mapInPandas batching, area-ratio
allocation) real and tested. The one kernel that genuinely needs a
computational-geometry library (arbitrary polygon-polygon intersection
for Geo2/Geo4 overlays) is isolated behind ``clip_kernel`` and raises
NotImplementedError until Sedona/shapely is available; everything
around it runs.

Scale notes: geometry never shuffles raw unless matched — spatial
joins block on integer grid-cell keys (equi-join, hash-partitionable,
skew-salvageable like any hot key), and the verify step runs
Arrow-batched on candidate pairs only. This is the same
block-then-verify shape as the dedup/linkage family.
"""

from __future__ import annotations

import math
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

_WKB_POINT = 1
_WKB_POLYGON = 3
_WKB_MULTIPOLYGON = 6

# ----------------------------------------------------------- WKB codec


def point_wkb(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, _WKB_POINT, x, y)


def polygon_wkb(exterior: list[tuple[float, float]],
                holes: list[list[tuple[float, float]]] | None = None) -> bytes:
    """Little-endian WKB POLYGON. Rings are closed automatically."""
    rings = [exterior] + list(holes or [])
    out = [struct.pack("<BII", 1, _WKB_POLYGON, len(rings))]
    for ring in rings:
        pts = list(ring)
        if pts[0] != pts[-1]:
            pts.append(pts[0])
        out.append(struct.pack("<I", len(pts)))
        for x, y in pts:
            out.append(struct.pack("<dd", x, y))
    return b"".join(out)


def multipolygon_wkb(polys: list[bytes]) -> bytes:
    out = [struct.pack("<BII", 1, _WKB_MULTIPOLYGON, len(polys))]
    out.extend(polys)
    return b"".join(out)


def _read_ring(buf: bytes, off: int) -> tuple[np.ndarray, int]:
    (n,) = struct.unpack_from("<I", buf, off)
    off += 4
    pts = np.frombuffer(buf, dtype="<f8", count=2 * n, offset=off)
    return pts.reshape(n, 2), off + 16 * n


def parse_wkb(buf: bytes):
    """-> ("point", (x, y)) | ("polygon", [rings]) |
    ("multipolygon", [[rings], ...]); rings are (n, 2) float arrays,
    ring 0 is the exterior.
    """
    if buf is None:
        return None
    buf = bytes(buf)

    def _geom(off: int):
        byte_order, gtype = struct.unpack_from("<BI", buf, off)
        if byte_order != 1:
            raise ValueError("big-endian WKB not supported")
        gtype &= 0xFF
        off += 5
        if gtype == _WKB_POINT:
            x, y = struct.unpack_from("<dd", buf, off)
            return ("point", (x, y)), off + 16
        if gtype == _WKB_POLYGON:
            (nrings,) = struct.unpack_from("<I", buf, off)
            off += 4
            rings = []
            for _ in range(nrings):
                ring, off = _read_ring(buf, off)
                rings.append(ring)
            return ("polygon", rings), off
        if gtype == _WKB_MULTIPOLYGON:
            (nparts,) = struct.unpack_from("<I", buf, off)
            off += 4
            parts = []
            for _ in range(nparts):
                (kind, rings), off = _geom(off)
                assert kind == "polygon"
                parts.append(rings)
            return ("multipolygon", parts), off
        raise ValueError(f"unsupported WKB geometry type {gtype}")

    geom, _ = _geom(0)
    return geom


# ----------------------------------------------------- scalar kernels


def ring_area(ring: np.ndarray) -> float:
    """Signed shoelace area (positive = CCW)."""
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def polygon_area(rings: list[np.ndarray]) -> float:
    """Exterior area minus hole areas (orientation-insensitive)."""
    if not rings:
        return 0.0
    area = abs(ring_area(rings[0]))
    for hole in rings[1:]:
        area -= abs(ring_area(hole))
    return area


def geometry_area(geom) -> float:
    if geom is None:
        return None
    kind, data = geom
    if kind == "point":
        return 0.0
    if kind == "polygon":
        return polygon_area(data)
    return sum(polygon_area(rings) for rings in data)


def _ring_contains(ring: np.ndarray, x: float, y: float) -> bool:
    """Ray casting; boundary points count as inside."""
    x1, y1 = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    crosses = ((y1 > y) != (y2 > y))
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
    return bool(np.sum(crosses & (x < xint)) % 2)


def polygon_contains(rings: list[np.ndarray], x: float, y: float) -> bool:
    if not rings or not _ring_contains(rings[0], x, y):
        return False
    return not any(_ring_contains(h, x, y) for h in rings[1:])


def geometry_contains(geom, x: float, y: float) -> bool:
    if geom is None:
        return False
    kind, data = geom
    if kind == "polygon":
        return polygon_contains(data, x, y)
    if kind == "multipolygon":
        return any(polygon_contains(rings, x, y) for rings in data)
    return False


def envelope(geom) -> tuple[float, float, float, float]:
    kind, data = geom
    if kind == "point":
        x, y = data
        return (x, y, x, y)
    rings = data if kind == "polygon" else [r for p in data for r in p]
    allpts = np.vstack(rings)
    return (float(allpts[:, 0].min()), float(allpts[:, 1].min()),
            float(allpts[:, 0].max()), float(allpts[:, 1].max()))


def clip_kernel(geom_a, geom_b):
    """Polygon-polygon intersection — the one kernel that needs a real
    computational-geometry library (ref: spatial.py:118,207 uses
    shapely via geopandas). Swap in Sedona's ST_Intersection or
    shapely here when available; the blocking/allocation machinery
    around it (candidate generation, area ratios) is library-agnostic.
    """
    raise NotImplementedError(
        "polygon clipping requires shapely/Sedona; plug a kernel into "
        "pudl_spark.functions.geo.clip_kernel")


# ------------------------------------------------- DataFrame operators


def add_area(df: DataFrame, geom_col: str,
             area_col: str = "area") -> DataFrame:
    """Shoelace area per row — Arrow-batched, no shuffle."""
    @pandas_udf("double")
    def _area(s: pd.Series) -> pd.Series:
        return s.map(lambda b: geometry_area(parse_wkb(b))
                     if b is not None else None)

    return df.withColumn(area_col, _area(F.col(geom_col)))


def explode_parts(df: DataFrame, geom_col: str,
                  ratio_col: str = "part_area_ratio") -> DataFrame:
    """Geo1: multi-part geometry -> one row per single-part polygon,
    with each part's share of the total area (ref: spatial.py:85 —
    callers multiply data columns by the ratio to allocate). Runs as
    mapInPandas: a narrow 1->N generate, no shuffle.
    """
    fields = df.schema.fieldNames()

    def _explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                geom = parse_wkb(row[geom_col])
                if geom is None:
                    continue
                kind, data = geom
                parts = [data] if kind == "polygon" else data
                areas = [polygon_area(p) for p in parts]
                total = sum(areas) or float("nan")
                for part, area in zip(parts, areas):
                    out = {c: row[c] for c in fields}
                    out[geom_col] = polygon_wkb(
                        [tuple(p) for p in part[0]],
                        [[tuple(q) for q in h] for h in part[1:]])
                    out[ratio_col] = area / total
                    rows.append(out)
            if rows:
                yield pd.DataFrame(rows, columns=fields + [ratio_col])

    from pyspark.sql import types as T

    # fresh StructType — StructType.add mutates in place, which would
    # corrupt the input DataFrame's cached schema
    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(ratio_col, T.DoubleType())])
    return df.mapInPandas(_explode, schema)


def dissolve(df: DataFrame, keys: list[str], geom_col: str,
             sum_cols: list[str] | None = None) -> DataFrame:
    """Geo3 dissolve (ref: spatial.py:173): groupBy + geometric union
    + sum of data columns. The union here is part-concatenation into a
    MULTIPOLYGON, which equals the true geometric union exactly when
    the inputs are disjoint — true for the reference's use (counties
    are a planar partition being dissolved into utility territories).
    Overlapping inputs need ``clip_kernel``. One shuffle on the keys.
    """
    sum_cols = sum_cols or []
    out_fields = keys + [geom_col] + sum_cols
    schema = ", ".join(
        f"{c} {dict(df.dtypes)[c]}" for c in out_fields)

    def _dissolve(pdf: pd.DataFrame) -> pd.DataFrame:
        parts: list[bytes] = []
        for b in pdf[geom_col]:
            geom = parse_wkb(b)
            if geom is None:
                continue
            kind, data = geom
            if kind == "polygon":
                parts.append(bytes(b))
            else:
                for rings in data:
                    parts.append(polygon_wkb(
                        [tuple(p) for p in rings[0]],
                        [[tuple(q) for q in h] for h in rings[1:]]))
        row = {k: [pdf[k].iloc[0]] for k in keys}
        row[geom_col] = [multipolygon_wkb(parts) if parts else None]
        for c in sum_cols:
            row[c] = [pdf[c].sum()]
        return pd.DataFrame(row)

    return df.groupBy(*keys).applyInPandas(_dissolve, schema)


def _grid_cells_expr(xmin, ymin, xmax, ymax, cell: float):
    """All (cx, cy) integer grid cells an envelope touches, as an
    array<struct> column expression — stays JVM-side.
    """
    cxs = F.sequence(F.floor(xmin / cell), F.floor(xmax / cell))
    cys = F.sequence(F.floor(ymin / cell), F.floor(ymax / cell))
    return F.flatten(F.transform(
        cxs, lambda cx: F.transform(
            cys, lambda cy: F.struct(cx.alias("cx"), cy.alias("cy")))))


def add_envelope(df: DataFrame, geom_col: str) -> DataFrame:
    """Envelope columns (__xmin..__ymax) via one Arrow batch pass."""
    @pandas_udf("xmin double, ymin double, xmax double, ymax double")
    def _env(s: pd.Series) -> pd.DataFrame:
        rows = [envelope(parse_wkb(b)) if b is not None
                else (None, None, None, None) for b in s]
        return pd.DataFrame(rows, columns=["xmin", "ymin", "xmax", "ymax"])

    return (
        df.withColumn("__env", _env(F.col(geom_col)))
        .select("*", "__env.*").drop("__env")
    )


def points_in_polygons_join(points: DataFrame, polygons: DataFrame,
                            x_col: str, y_col: str, geom_col: str,
                            cell: float = 1.0,
                            how: str = "inner") -> DataFrame:
    """Geo7 (point-in-timezone / point-in-territory): blocked spatial
    join. Polygons explode to the grid cells their envelope touches;
    points compute one cell each; the candidate join is a plain
    equi-join on (cx, cy); ray-casting verifies exact containment on
    candidates only. All-JVM blocking, Arrow-batched verify.
    """
    polys = add_envelope(polygons, geom_col)
    poly_cells = polys.withColumn(
        "__cell",
        F.explode(_grid_cells_expr(
            F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"),
            cell)),
    ).drop("xmin", "ymin", "xmax", "ymax")
    pts = points.withColumn(
        "__cell",
        F.struct(F.floor(F.col(x_col) / cell).alias("cx"),
                 F.floor(F.col(y_col) / cell).alias("cy")))
    cand = pts.join(poly_cells, on="__cell", how="inner").drop("__cell")

    @pandas_udf("boolean")
    def _contains(geom: pd.Series, x: pd.Series, y: pd.Series) -> pd.Series:
        return pd.Series([
            geometry_contains(parse_wkb(g), float(px), float(py))
            if g is not None else False
            for g, px, py in zip(geom, x, y)])

    if how != "inner":
        raise ValueError("only inner spatial joins are supported; outer "
                         "semantics compose as a left join on the point "
                         "key against this result")
    return cand.filter(_contains(F.col(geom_col), F.col(x_col),
                                 F.col(y_col)))
