"""Ground-truth roof tilt/azimuth tests: planted-plane recovery through
the codegen geometry chain, per-home aggregation, KML round-trip via the
stdlib parser, and a plan audit (no UDFs, one aggregate shuffle)."""

from __future__ import annotations

import pytest

from solar_data_tools_spark.algorithms.ground_truth import (
    ground_truth_from_kml,
    ground_truth_tilt_azimuth,
    parse_kml_polygons,
    plant_polygon,
    polygon_tilt_azimuth,
)

COLS = [
    "lon1", "lat1", "alt1",
    "lon2", "lat2", "alt2",
    "lon3", "lat3", "alt3",
]


def _poly_df(spark, specs):
    rows = [
        (home, *plant_polygon(37.4, -122.1, tilt, az))
        for (home, tilt, az) in specs
    ]
    return spark.createDataFrame(rows, ["home_id", *COLS])


def test_polygon_tilt_azimuth_recovers_planted_planes(spark):
    specs = [(0, 20.0, 30.0), (0, 35.0, 60.0), (1, 5.0, 45.0)]
    df = _poly_df(spark, specs)
    out = polygon_tilt_azimuth(df).collect()
    assert len(out) == 3
    for r, (_, tilt, az) in zip(out, specs):
        assert r["tilt_deg"] == pytest.approx(tilt, abs=0.1)
        assert r["azimuth_deg"] == pytest.approx(az, abs=0.5)


def test_flat_roof_tilt_zero(spark):
    df = _poly_df(spark, [(0, 0.0, 0.0)])
    r = polygon_tilt_azimuth(df).collect()[0]
    assert r["tilt_deg"] == pytest.approx(0.0, abs=1e-6)


def test_ground_truth_per_home_stats(spark):
    df = _poly_df(spark, [(0, 20.0, 30.0), (0, 24.0, 30.0), (1, 10.0, 50.0)])
    out = {
        r["home_id"]: r.asDict()
        for r in ground_truth_tilt_azimuth(df).collect()
    }
    assert out[0]["n_polygons"] == 2 and out[1]["n_polygons"] == 1
    assert out[0]["ave_tilt"] == pytest.approx(22.0, abs=0.2)
    assert out[0]["med_tilt"] == pytest.approx(22.0, abs=0.2)
    assert out[0]["std_tilt"] == pytest.approx(2.0, abs=0.2)  # ddof=0
    assert out[1]["std_tilt"] == pytest.approx(0.0, abs=1e-9)
    assert out[0]["ave_azimuth"] == pytest.approx(30.0, abs=0.5)


def test_kml_round_trip(spark):
    # real KML LinearRings are CLOSED (first vertex repeated last); the
    # parser mirrors the reference's token slicing, skipping token 0 and
    # reading tokens 1-3 — write the ring starting at v3 (v3 v1 v2 v3)
    # so the parsed triple is exactly (v1, v2, v3): the reference's
    # haversine projection anchors on the first parsed vertex, so the
    # planted expectation needs the planted anchor
    v = plant_polygon(37.4, -122.1, 25.0, 10.0)
    coords1 = " ".join(
        f"{v[i]},{v[i + 1]},{v[i + 2]}" for i in (6, 0, 3, 6)
    )
    v2 = plant_polygon(37.4, -122.1, 30.0, 80.0)
    coords2 = " ".join(
        f"{v2[i]},{v2[i + 1]},{v2[i + 2]}" for i in (6, 0, 3, 6)
    )
    kml = f"""<?xml version="1.0" encoding="UTF-8"?>
<kml xmlns="http://www.opengis.net/kml/2.2"><Document><Folder>
<Placemark><Polygon><outerBoundaryIs><LinearRing>
<coordinates>{coords1}</coordinates>
</LinearRing></outerBoundaryIs></Polygon></Placemark>
<Placemark><Polygon><outerBoundaryIs><LinearRing>
<coordinates>{coords2}</coordinates>
</LinearRing></outerBoundaryIs></Polygon></Placemark>
<Placemark><name>no polygon here</name></Placemark>
</Folder></Document></kml>""".encode()
    pdf = parse_kml_polygons(kml)
    assert len(pdf) == 2
    r = ground_truth_from_kml(spark, kml).collect()[0]
    assert r["n_polygons"] == 2
    assert r["ave_tilt"] == pytest.approx(27.5, abs=0.2)
    assert r["ave_azimuth"] == pytest.approx(45.0, abs=0.5)


def test_ground_truth_plan_is_codegen_only(spark):
    """The geometry must be pure built-in expressions (no Python eval
    nodes) and the per-home stats exactly one aggregate."""
    df = _poly_df(spark, [(0, 20.0, 30.0)])
    plan = (
        ground_truth_tilt_azimuth(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan and "mapInPandas" not in plan
