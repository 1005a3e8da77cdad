from __future__ import annotations

import pytest

from pybiodatafuse_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # 4 shuffle partitions: every superstep stage schedules half the tasks
    # of the old 8 — results are partition-count-independent (asserted by
    # the oracle-differential tests themselves), and on the tiny test graphs
    # task dispatch, not compute, is the wall-clock
    s = get_spark("pybiodatafuse-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def pages_df(spark):
    """Deterministic 400-page fixture table (cached)."""
    from pybiodatafuse_spark.datagen import generate_pages

    df = generate_pages(spark, 400, partitions=8).cache()
    df.count()
    return df
