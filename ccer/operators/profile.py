"""Table verification / profiling (reference build_db/utils/verify_db.py:
28-147): row counts, distinct counts, null checks, samples — one
aggregation pass per table instead of verify_db's query-per-metric loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile_table(df: DataFrame, distinct_cols: list[str] | None = None) -> DataFrame:
    """One-row profile: n_rows + per-column null counts + distinct counts
    for the named columns (Catalyst expands multi-distinct into one
    expand + aggregate; approx_count_distinct is the 10^12-row variant).
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in df.columns:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"nulls_{c}"))
    for c in distinct_cols or []:
        aggs.append(F.countDistinct(c).alias(f"distinct_{c}"))
    return df.agg(*aggs)


def profile_table_approx(df: DataFrame, distinct_cols: list[str]) -> DataFrame:
    """Sketch-based profile for tables where exact countDistinct would
    shuffle too much (verify at crawl scale)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in distinct_cols:
        aggs.append(F.approx_count_distinct(c).alias(f"approx_distinct_{c}"))
    return df.agg(*aggs)


def sample_rows(df: DataFrame, n: int = 5) -> list:
    """Deterministic sample (verify_db.py:104-112 LIMIT analog): first n
    rows under a stable ordering of the first column."""
    first = df.columns[0]
    return df.orderBy(first).limit(n).collect()
