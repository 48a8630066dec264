import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Test data is tiny: the per-task fresh-Python-worker default exists for
# multi-GB Arrow batches at bench scale and only adds spawn latency here.
os.environ.setdefault("CCER_PY_WORKER_REUSE", "true")
os.environ.setdefault("CCER_DRIVER_MEM", "8g")


@pytest.fixture(scope="session")
def spark():
    from ccer.session import get_spark

    spark = get_spark(app_name="ccer-tests", cores=8, shuffle_partitions=8)
    yield spark
