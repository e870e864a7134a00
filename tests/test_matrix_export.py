"""Day-matrix export parity with the reference's make_2d fixture
(reference test: tests/solardatatools/test_data_transforms.py:24-54 —
standardized series in, power_mat.csv out, trim_start=trim_end=True)."""

from pathlib import Path

import numpy as np
import pandas as pd
import pytest

FIXDIR = Path("/root/reference/tests/fixtures/data_transforms")


@pytest.mark.skipif(not FIXDIR.exists(), reason="reference fixtures absent")
def test_to_matrix_pandas_matches_power_mat(spark):
    from solar_data_tools_spark.operators.matrix import to_matrix_pandas

    data = pd.read_csv(
        FIXDIR / "timeseries_standardized.csv", index_col=0, parse_dates=True
    )
    expected = np.genfromtxt(FIXDIR / "power_mat.csv", delimiter=",")

    key = data.columns[0]
    long = pd.DataFrame(
        {"site": 1, "ts": data.index, "value": data[key].to_numpy()}
    )
    sdf = spark.createDataFrame(long)
    out = to_matrix_pandas(sdf, 1, trim_start=True, trim_end=True)
    np.testing.assert_array_almost_equal(out.to_numpy(), expected)
    # day columns are real dates and slot index spans one day
    assert out.shape == expected.shape
    assert out.index[0] == pd.Timedelta(0)
