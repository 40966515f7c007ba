from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ontology_mapper_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    # small local session for tests; prod settings live in session.get_spark
    s = get_spark(app_name="omx-tests", master="local[4]", shuffle_partitions=4,
                  driver_memory="4g")
    yield s
