from __future__ import annotations

import pytest

from gazetteer_search_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("gss-tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()
