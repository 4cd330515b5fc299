import pytest


@pytest.fixture(scope="session")
def spark():
    from sketchlib.session import get_spark

    s = get_spark(app="sketchlib-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def seq_small(spark):
    """FIXTURES.md `seq_small`: sequences @ N_DOCS=2000, cached."""
    from sketchlib.gen import sequences_df

    df = sequences_df(spark, 2000, partitions=8).cache()
    df.count()
    return df
