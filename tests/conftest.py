from __future__ import annotations

import pytest

from cnics_to_fhir_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session("tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
