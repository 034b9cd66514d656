from __future__ import annotations

import shutil
import tempfile

import pytest

from logminer_kafka_connect_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="lmkc-tests",
        master="local[4]",
        shuffle_partitions=4,
        driver_memory="6g",
    )
    yield s
    s.stop()


@pytest.fixture()
def tmpdir_path():
    d = tempfile.mkdtemp(prefix="lmkc-test-")
    yield d
    shutil.rmtree(d, ignore_errors=True)
