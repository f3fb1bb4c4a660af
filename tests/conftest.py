import pytest

from mysteryann_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"
SF_TINY = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="mysteryann-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def emb(spark):
    from mysteryann_spark.sources.tables import load_table

    return load_table(spark, "embeddings", SF_DIR).cache()
