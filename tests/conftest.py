import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


def null_mask(n: int) -> np.ndarray:
    """The reference's canonical null pattern: i%5==0 or i%17==0
    (/root/reference/src/utils/test_utils.rs:60,111,158,293,330)."""
    i = np.arange(n)
    return ~((i % 5 == 0) | (i % 17 == 0))


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("boltspark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "4g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()
