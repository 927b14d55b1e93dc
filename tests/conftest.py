import shutil
import tempfile

import pytest

from gxdindexer_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="gxdindexer-tests", master="local[4]",
                  shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture()
def tmpdir_idx():
    d = tempfile.mkdtemp(prefix="gxdidx_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
