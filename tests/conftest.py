import shutil
import tempfile

import pytest

from scrapy_cluster_spark.session import get_spark
from scrapy_cluster_spark.store import SnapshotStore
from scrapy_cluster_spark.synth import generate_pages


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cores=4, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages(spark):
    df = generate_pages(spark, n_domains=4, base_pages=30).cache()
    df.count()
    return df


@pytest.fixture()
def store(spark):
    tmp = tempfile.mkdtemp(prefix="scs-test-")
    yield SnapshotStore(spark, tmp)
    shutil.rmtree(tmp, ignore_errors=True)
