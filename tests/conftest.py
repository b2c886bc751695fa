import os
import shutil
import tempfile

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # small & fast for unit tests

from crawler_news_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture()
def tmp_catalog():
    d = tempfile.mkdtemp(prefix="crawlcat_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
