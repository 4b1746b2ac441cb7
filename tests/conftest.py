import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pytod_spark.session import get_spark  # noqa: E402
from pytod_spark.oracle import generate_data  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="pytod_spark-tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "4g"},
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def f1_fixture():
    """FIXTURES.md F1: n=200, d=2, contamination=0.1, seed 42."""
    X, y = generate_data(n_train=200, n_features=2, contamination=0.1,
                         train_only=True, random_state=42)
    return X, y


@pytest.fixture(scope="session")
def f1_df(spark, f1_fixture):
    X, y = f1_fixture
    rows = [(int(i), [float(v) for v in X[i]], int(y[i])) for i in range(X.shape[0])]
    return spark.createDataFrame(rows, "row_id bigint, features array<double>, y int")


def assert_scores_close(actual: dict, expected: np.ndarray, rtol=1e-6, atol=1e-9):
    """actual: {row_id: score}; expected indexed by row_id."""
    assert len(actual) == len(expected)
    got = np.array([actual[i] for i in range(len(expected))])
    np.testing.assert_allclose(got, expected, rtol=rtol, atol=atol)
