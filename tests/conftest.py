import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hematite_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("hematite_spark_tests")
    yield spark


@pytest.fixture()
def store(spark, tmp_path):
    from hematite_spark.store import EventStore

    return EventStore(spark, str(tmp_path / "store"))


def minimal_event(eid: str = "e-1", source: str = "", type_: str = "") -> dict:
    """F1 fixture — reference Event::default() (FIXTURES.md §1)."""
    return {"specversion": "1.0", "id": eid, "source": source, "type": type_}
