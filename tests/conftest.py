import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pcompress_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="pcompress-spark-tests",
        master="local[4]",
        shuffle_partitions=8,
        arrow_batch_rows=512,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def smoke_data():
    from pcompress_spark import datagen

    return datagen.generate(seed=42, n_conv=200, dup_frac=0.30)


@pytest.fixture(scope="session")
def smoke_transcripts(spark, smoke_data):
    df = spark.createDataFrame(smoke_data.transcripts)
    return df.repartition(8).cache()
