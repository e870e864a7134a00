"""Roof-polygon ground-truth tilt/azimuth — the reference's
``pvsystemprofiler/ground_truth_estimator.py:1-107`` re-expressed as a
DataFrame operator.

The reference reads a KML file of roof polygons (pykml), takes the first
three outer-ring vertices of each polygon, converts them to local
Cartesian coordinates via haversine distances, derives the roof plane's
normal vector, and reports per-home mean/median/std of the polygon
tilt/azimuth angles. Here the same computation is split Spark-first:

* :func:`parse_kml_polygons` — driver-side KML → pandas frame of vertex
  triples, using only stdlib ``xml.etree`` (no pykml dependency); KML
  files are KB-scale site metadata, not data-plane input.
* :func:`ground_truth_tilt_azimuth` — the geometry as ONE codegen
  projection over a (home, polygon, 3x(lon,lat,alt)) DataFrame plus one
  groupBy for the per-home statistics. No UDFs; a fleet of millions of
  roof polygons is a single narrow pass + one aggregate shuffle.

Faithfully replicated reference quirks (ground_truth_estimator.py):

* haversine distances are UNSIGNED, so vertex displacements lose their
  sign and the azimuth is only recovered up to the reference's fold
  into [-90, 90] (``tiltAz``, :63-74) — correct for the
  south-ish-facing roofs the tool targets;
* altitudes are divided by 1000 (meters → km) to match the km-scale
  haversine outputs (:27-31);
* the normal's z is flipped positive with x, y negated (:52-57).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_EARTH_KM = 6371.0088


def _haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km (the ``haversine`` package's default
    mean-earth radius), as a codegen expression."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dphi = F.radians(lat2 - lat1) / 2.0
    dlmb = F.radians(lon2 - lon1) / 2.0
    a = F.sin(dphi) * F.sin(dphi) + F.cos(p1) * F.cos(p2) * F.sin(
        dlmb
    ) * F.sin(dlmb)
    return 2.0 * _EARTH_KM * F.asin(F.sqrt(a))


def parse_kml_polygons(kml_bytes: bytes) -> pd.DataFrame:
    """Three outer-boundary vertices of every ``<Polygon>`` in a KML
    document (reference readCoordinates_onepolygon, :7-21), via stdlib
    ElementTree. Matching the reference exactly, the FIRST coordinate
    token is SKIPPED and tokens 1-3 are used (its loop assigns c1/c2/c3
    at j==1,2,3 only — identical for planar roofs, kept verbatim so
    non-planar polygons reproduce too). Returns columns
    polygon_id, lon1..alt3 — feed through ``spark.createDataFrame``
    into :func:`ground_truth_tilt_azimuth`."""
    import re
    import xml.etree.ElementTree as ET

    root = ET.fromstring(kml_bytes)
    rows = []
    # namespace-agnostic: match on local tag names
    for pid, poly in enumerate(
        el for el in root.iter() if el.tag.split("}")[-1] == "Polygon"
    ):
        coords_el = next(
            (
                el
                for el in poly.iter()
                if el.tag.split("}")[-1] == "coordinates"
            ),
            None,
        )
        if coords_el is None or not coords_el.text:
            continue
        triples = []
        for token in re.split(r"\s+", coords_el.text.strip())[1:4]:
            parts = token.split(",")
            if len(parts) < 2:
                break
            lon, lat = float(parts[0]), float(parts[1])
            alt = float(parts[2]) if len(parts) > 2 else 0.0
            triples.append((lon, lat, alt))
        if len(triples) == 3:
            rows.append(
                (pid, *triples[0], *triples[1], *triples[2])
            )
    return pd.DataFrame(
        rows,
        columns=[
            "polygon_id",
            "lon1", "lat1", "alt1",
            "lon2", "lat2", "alt2",
            "lon3", "lat3", "alt3",
        ],
    )


def polygon_tilt_azimuth(polygons: DataFrame) -> DataFrame:
    """Per-polygon roof tilt/azimuth from three vertices — the
    coordinatesToCartesian → normalVec → tiltAz chain
    (ground_truth_estimator.py:23-74) as one codegen projection.

    Input columns: lon1,lat1,alt1,lon2,lat2,alt2,lon3,lat3,alt3 (alt in
    meters); every other column is carried through. Adds tilt_deg,
    azimuth_deg."""
    lat1, lon1 = F.col("lat1"), F.col("lon1")
    # local Cartesian (km): p1 at origin; displacement of p_k measured
    # along the meridian/parallel through p1 (reference :23-40; the
    # haversine legs are unsigned — documented quirk)
    y1 = _haversine_km(lat1, lon1, F.col("lat2"), lon1)
    x1 = _haversine_km(F.col("lat2"), lon1, F.col("lat2"), F.col("lon2"))
    y2 = _haversine_km(lat1, lon1, F.col("lat3"), lon1)
    x2 = _haversine_km(F.col("lat3"), lon1, F.col("lat3"), F.col("lon3"))
    z1 = F.col("alt1") / 1000.0
    dz1 = F.col("alt2") / 1000.0 - z1
    dz2 = F.col("alt3") / 1000.0 - z1
    # normal = (p2-p1) x (p3-p1); v1=(x1,y1,dz1), v2=(x2,y2,dz2)
    nx = y1 * dz2 - dz1 * y2
    ny = dz1 * x2 - x1 * dz2
    nz = x1 * y2 - y1 * x2
    # flip z positive, negating x and y (reference normalVec :52-57)
    flip = nz < 0
    nx = F.when(flip, -nx).otherwise(nx)
    ny = F.when(flip, -ny).otherwise(ny)
    nz = F.abs(nz)
    r = F.sqrt(nx * nx + ny * ny)
    tilt = F.degrees(F.atan2(r, nz))
    az_raw = F.lit(90.0) - F.degrees(F.atan2(ny, nx))
    az = (
        F.when(az_raw < -90.0, az_raw + 180.0)
        .when(az_raw > 90.0, F.lit(180.0) - az_raw)
        .otherwise(az_raw)
    )
    return polygons.withColumn("tilt_deg", tilt).withColumn(
        "azimuth_deg", az
    )


def ground_truth_tilt_azimuth(
    polygons: DataFrame, home_col: str = "home_id",
    exact_digits: int | None = None,
) -> DataFrame:
    """Per-home ground-truth summary — the reference's return tuple
    (ave/med/std of tilt and azimuth over the home's roof polygons,
    ground_truth_estimator.py:100-107) as one groupBy. ``std`` is the
    population std (numpy ``np.std`` default, ddof=0).

    ``exact_digits`` (round 9, certified q136 path): means become
    order-free integer tick sums (``canonical.tick_avg``) and the
    population std is computed from tick moments —
    ``sqrt(greatest(E[x^2] - mean^2, 0))`` with both expectations
    tick-exact — instead of the engines' (different) streaming
    variance algorithms. The cancellation error of the moment form is
    ~0.5e-6/std per term, far inside q136's 1e-4 certification round;
    ``greatest(.,0)`` guards the degenerate all-equal group where
    cancellation could go epsilon-negative."""
    per_poly = polygon_tilt_azimuth(polygons)
    if exact_digits is None:
        return per_poly.groupBy(home_col).agg(
            F.avg("tilt_deg").alias("ave_tilt"),
            F.expr("percentile(tilt_deg, 0.5)").alias("med_tilt"),
            F.stddev_pop("tilt_deg").alias("std_tilt"),
            F.avg("azimuth_deg").alias("ave_azimuth"),
            F.expr("percentile(azimuth_deg, 0.5)").alias("med_azimuth"),
            F.stddev_pop("azimuth_deg").alias("std_azimuth"),
            F.count(F.lit(1)).alias("n_polygons"),
        )
    from solar_data_tools_spark.operators.canonical import tick_avg

    d = exact_digits
    t, a = F.col("tilt_deg"), F.col("azimuth_deg")
    agg = per_poly.groupBy(home_col).agg(
        tick_avg(t, d).alias("ave_tilt"),
        F.expr("percentile(tilt_deg, 0.5)").alias("med_tilt"),
        tick_avg(t * t, d).alias("_ex2_tilt"),
        tick_avg(a, d).alias("ave_azimuth"),
        F.expr("percentile(azimuth_deg, 0.5)").alias("med_azimuth"),
        tick_avg(a * a, d).alias("_ex2_azimuth"),
        F.count(F.lit(1)).alias("n_polygons"),
    )

    def _std(ex2, m):
        return F.sqrt(F.greatest(ex2 - m * m, F.lit(0.0)))

    return agg.select(
        home_col,
        "ave_tilt",
        "med_tilt",
        _std(F.col("_ex2_tilt"), F.col("ave_tilt")).alias("std_tilt"),
        "ave_azimuth",
        "med_azimuth",
        _std(F.col("_ex2_azimuth"), F.col("ave_azimuth")).alias(
            "std_azimuth"
        ),
        "n_polygons",
    )


def ground_truth_from_kml(spark, kml_bytes: bytes) -> DataFrame:
    """End-to-end single-file path matching the reference's
    ``ground_truth_estimate(filename)``: parse (driver, KB-scale) →
    compute (executors)."""
    pdf = parse_kml_polygons(kml_bytes)
    if pdf.empty:
        raise ValueError("no 3-vertex polygons found in KML document")
    polys = spark.createDataFrame(pdf.assign(home_id=0))
    return ground_truth_tilt_azimuth(polys)


def plant_polygon(
    lat0: float,
    lon0: float,
    tilt_deg: float,
    azimuth_deg: float,
    size_km: float = 0.02,
) -> tuple:
    """Test helper: three vertices of a plane with the given tilt whose
    downhill direction points at ``azimuth_deg`` (east-of-north, the
    reference's 90 - atan2(y, x) convention). Returns the 9-tuple
    (lon1, lat1, alt1, ..., alt3) with altitudes in meters."""
    km_per_deg_lat = math.pi * _EARTH_KM / 180.0
    km_per_deg_lon = km_per_deg_lat * math.cos(math.radians(lat0))
    # plane z = -(tan(tilt)) * (x*sin(az) + y*cos(az)) in km
    g = math.tan(math.radians(tilt_deg))
    ax = math.sin(math.radians(azimuth_deg))
    ay = math.cos(math.radians(azimuth_deg))

    def vert(x_km: float, y_km: float) -> tuple:
        z_km = -g * (x_km * ax + y_km * ay)
        return (
            lon0 + x_km / km_per_deg_lon,
            lat0 + y_km / km_per_deg_lat,
            z_km * 1000.0 + 100.0,  # meters, arbitrary 100 m base
        )

    v1 = vert(0.0, 0.0)
    v2 = vert(size_km, 0.0)
    v3 = vert(0.0, size_km)
    return (*v1, *v2, *v3)
