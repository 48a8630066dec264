"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship ER clustering over pages derived from the
sf0.001 documents table; ``queries``/``oracle_sql`` expose the full
operator inventory (ccer/plans/driver_queries.py) for the DuckDB
correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Pin worker Python past any version-manager shim (pyenv's bash trampoline
# costs ~0.3-0.5s per exec; sys.executable is the resolved real binary).
# Only effective if this import happens before the JVM starts — harmless
# otherwise; ccer.session.get_spark applies the same pin for its sessions.
if os.environ.get("PYSPARK_PYTHON", "python") in ("python", "python3"):
    os.environ["PYSPARK_PYTHON"] = sys.executable


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: documents → pages →
    blocking → pairwise scoring → connected components → cluster summary."""
    from ccer.plans.driver_queries import q_er_cluster_documents

    return q_er_cluster_documents(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from ccer.plans.driver_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for the
    non-SQL-expressible LSH / iterative-clustering operators)."""
    from ccer.plans.driver_queries import ORACLES

    return dict(ORACLES)
