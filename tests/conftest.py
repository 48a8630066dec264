import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from ccer.session import get_spark

    spark = get_spark(app_name="ccer-tests", cores=8, shuffle_partitions=8)
    yield spark
