import pytest

from autoprepad_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("autoprepad-tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tokens_df(spark):
    from autoprepad_spark.datagen import generate_tokens

    return generate_tokens(spark, 40_000, seed=42, n_parts=8).cache()


@pytest.fixture(scope="session")
def dim_df(spark):
    from autoprepad_spark.datagen import source_dim

    return source_dim(spark)
