import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gridmet_etl_spark.session import get_spark  # noqa: E402

FIXDIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="gridmet_etl_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def fixdir():
    assert os.path.exists(os.path.join(FIXDIR, "grid.parquet")), (
        "run `python -m gridmet_etl_spark.fixtures fixtures` first"
    )
    return FIXDIR


@pytest.fixture(scope="session")
def grid(spark, fixdir):
    from gridmet_etl_spark.sources.readers import read_grid

    return read_grid(spark, os.path.join(fixdir, "grid.parquet")).cache()


@pytest.fixture(scope="session")
def grid_ens(spark, fixdir):
    from gridmet_etl_spark.sources.readers import read_grid

    return read_grid(spark, os.path.join(fixdir, "grid_ens.parquet")).cache()


@pytest.fixture(scope="session")
def weights(spark, fixdir):
    from gridmet_etl_spark.sources.readers import read_weights_parquet

    return read_weights_parquet(spark, os.path.join(fixdir, "weights.parquet")).cache()


@pytest.fixture(scope="session")
def weights_ens(spark, fixdir):
    from gridmet_etl_spark.sources.readers import read_weights_parquet

    return read_weights_parquet(spark, os.path.join(fixdir, "weights_ens.parquet")).cache()


@pytest.fixture(scope="session")
def features(spark, fixdir):
    from gridmet_etl_spark.sources.readers import read_features

    return read_features(spark, os.path.join(fixdir, "features.parquet")).cache()


@pytest.fixture(scope="session")
def elevation(spark, fixdir):
    return spark.read.parquet(os.path.join(fixdir, "elevation.parquet")).cache()
