import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from kgmwcp.session import get_spark

    spark = get_spark(app_name="kgmwcp-tests", master="local[4]")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    yield spark
