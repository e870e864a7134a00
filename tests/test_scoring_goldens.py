"""End-to-end scoring parity with the reference's published fixtures.

Mirrors reference tests/solardatatools/test_data_handler.py:9-49: load the
raw 5-min CSV, fix DST, run the pipeline, and compare the five 193-day
score vectors plus the scalar metrics at the reference's own tolerances.
This is the ingest -> standardize -> fill -> score parity gate.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

FIXTURES = "/root/reference/tests/fixtures"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{FIXTURES}/data_transforms/timeseries.csv"),
    reason="reference fixtures not available",
)


@pytest.fixture(scope="module")
def scored(spark):
    from pyspark.sql import functions as F

    from solar_data_tools_spark.algorithms.scoring import daily_quality_scores
    from solar_data_tools_spark.operators.time_axis import standardize_time_axis

    df = pd.read_csv(
        f"{FIXTURES}/data_transforms/timeseries.csv",
        parse_dates=[0],
        index_col=0,
    )
    # fix_dst (reference data_handler.py:842-858): localize US/Pacific with
    # NaT on ambiguous/nonexistent stamps, convert to fixed UTC-8, strip tz
    idx = (
        df.index.tz_localize("US/Pacific", ambiguous="NaT", nonexistent="NaT")
        .tz_convert("Etc/GMT+8")
        .tz_localize(None)
    )
    df = df.set_index(idx)
    df = df[df.index.notnull()]
    pdf = df.reset_index().rename(columns={"index": "ts"})
    pdf.columns = ["ts", "value"]
    meas = (
        spark.createDataFrame(pdf)
        .select(
            F.lit(1).alias("site"),
            "ts",
            F.monotonically_increasing_id().alias("seq"),
            "value",
        )
        .where(F.col("ts").isNotNull())
    )
    std = standardize_time_axis(meas, 300)
    out = daily_quality_scores(std, slots_per_day=288).orderBy("date").toPandas()
    return out


def _golden(name):
    return np.loadtxt(f"{FIXTURES}/scoring/{name}.csv", delimiter=",")


def test_scalar_metrics(scored):
    # reference test_data_handler.py:17-21
    assert scored.capacity_estimate.iloc[0] == pytest.approx(
        6.7453649044036865, abs=5e-3
    )
    assert scored.data_quality_score.iloc[0] == pytest.approx(
        0.9948186528497409, abs=5e-4
    )
    assert scored.data_clearness_score.iloc[0] == pytest.approx(
        0.49222797927461137, abs=5e-4
    )
    assert bool(scored.inverter_clipping.iloc[0]) is True


def test_density_scores_golden(scored):
    np.testing.assert_allclose(
        scored.density.to_numpy(), _golden("density"), atol=1e-3
    )


def test_linearity_scores_golden(scored):
    np.testing.assert_allclose(
        scored.linearity.to_numpy(), _golden("linearity"), atol=2e-2
    )


def test_clipping_scores_golden(scored):
    np.testing.assert_allclose(
        scored.clipping_1.to_numpy(), _golden("clipping_1"), atol=1e-3
    )
    np.testing.assert_allclose(
        scored.clipping_2.to_numpy(), _golden("clipping_2"), atol=2e-3
    )


def test_quality_clustering_golden(scored):
    np.testing.assert_allclose(
        scored.quality_clustering.to_numpy(),
        _golden("quality_clustering"),
        atol=1e-3,
    )
