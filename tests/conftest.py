from __future__ import annotations

import pytest

from go_pkg_spider_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def clips_path(tmp_path_factory):
    from go_pkg_spider_spark import datagen

    p = tmp_path_factory.mktemp("clips") / "clips.parquet"
    datagen.write_clips_parquet(str(p), 300)
    return str(p)
