import pytest

from odibi_spark import Context, EngineContext, get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def ctx(spark):
    return Context(spark)


@pytest.fixture()
def make_ec(ctx):
    def _make(df):
        return EngineContext(ctx, df)

    return _make


SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"
