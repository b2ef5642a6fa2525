import pytest

from bigquery_delta_plugins_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("bdps-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


def rows_set(df, cols=None):
    """Order-insensitive materialization for assertions."""
    cols = cols or df.columns
    return {tuple(r[c] for c in cols) for r in df.collect()}
