"""Temporal joins Spark lacks as built-ins: as-of (point-in-time) join
and bounded range (interval) self-join.

Both are implemented as compositions of existing DataFrame ops — the
union+window trick for as-of, time-bucketing for range — because at
10^12 rows the naive formulations are non-starters: a theta join
``l.ts >= r.ts`` becomes BroadcastNestedLoopJoin (quadratic, unusable),
and Spark has no native ASOF. The compositions below shuffle once on
the join key and stay linear per key.

- ``asof_join``   every left row picks the latest right row with
                  ``right.ts <= left.ts`` per key (backward as-of, the
                  feature-store / trades-vs-quotes semantics). Union
                  both sides, one window sorted by (ts, side), carry
                  the last right payload forward with
                  ``last(..., ignorenulls)`` — one shuffle on the key,
                  O(n log n) per key, no pair explosion. DuckDB's
                  native ASOF JOIN is the oracle.
- ``range_join``  all pairs within ``max_gap`` seconds per key,
                  bucketed: each row joins only its own and the
                  adjacent time bucket, then the exact bound filters —
                  candidate count is O(pairs within ~2×max_gap), never
                  O(n² per key). A plain theta join is the (small-data)
                  oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    payload_cols: tuple[str, ...] = ("value",),
    prefix: str = "r_",
) -> DataFrame:
    """Backward as-of join: left rows gain ``{prefix}{payload}`` and
    ``{prefix}ts`` from the latest right row at-or-before their
    timestamp (NULL when no right row precedes).

    Spark-first shape: tag and union the two sides, then ONE window per
    key ordered by (ts, right-before-left at ties) carrying the right
    payload forward — equivalent to the merge phase of a sort-merge
    as-of, expressed declaratively so Catalyst handles the sort and AQE
    the skew. One shuffle total; contrast with the ``l.ts >= r.ts``
    theta join Spark would otherwise plan as a nested-loop.
    """
    lcols = left.columns
    tagged_r = right.select(
        F.col(key),
        F.col(ts_col).alias("_t"),
        F.lit(1).alias("_is_r"),
        *[F.col(c).alias(f"{prefix}{c}") for c in payload_cols],
        F.col(ts_col).alias(f"{prefix}ts"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != key],
    )
    tagged_l = left.select(
        F.col(key),
        F.col(ts_col).alias("_t"),
        F.lit(0).alias("_is_r"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"{prefix}{c}")
            for c in payload_cols
        ],
        F.lit(None).cast(right.schema[ts_col].dataType).alias(f"{prefix}ts"),
        *[F.col(c) for c in lcols if c != key],
    )
    # at equal timestamps the right row sorts first (desc on _is_r), so
    # a same-instant quote IS visible to the trade — the <= semantics
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_t").asc(), F.col("_is_r").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_r.unionByName(tagged_l).select(
        "*",
        *[
            F.last(f"{prefix}{c}", ignorenulls=True).over(w).alias(f"_c_{c}")
            for c in payload_cols
        ],
        F.last(f"{prefix}ts", ignorenulls=True).over(w).alias("_c_ts"),
    )
    return carried.filter(F.col("_is_r") == 0).select(
        F.col(key),
        F.col("_t").alias(ts_col),
        *[F.col(c) for c in lcols if c != key and c != ts_col],
        *[F.col(f"_c_{c}").alias(f"{prefix}{c}") for c in payload_cols],
        F.col("_c_ts").alias(f"{prefix}ts"),
    )


def range_join(
    events: DataFrame,
    max_gap_sec: int = 900,
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """All ordered pairs (a, b) of same-key events with
    ``0 < b.ts - a.ts <= max_gap_sec``: (key, id_a, id_b, gap_sec).

    Scale path: assign each row to a ``max_gap``-wide time bucket; a
    qualifying pair is always in the same or adjacent bucket, so the
    equi-join key (key, bucket) with a two-bucket fan-out on one side
    bounds candidates to the rows within ~2×max_gap — the standard
    banding that keeps a 10^12-row interval join from going quadratic
    per key. The exact inequality then filters; ties at identical ts
    order by id to keep pairs unique and deterministic.
    """
    # NTZ timestamps refuse a direct long cast; go through timestamp
    sec = F.col(ts_col).cast("timestamp").cast("long")
    base = events.select(
        F.col(key),
        F.col(id_col),
        sec.alias("_sec"),
        F.floor(sec / max_gap_sec).alias("_bkt"),
    )
    # side a fans out to its own and the NEXT bucket, so every b within
    # max_gap ahead of it shares an equi-join key exactly once
    a = base.select(
        key,
        F.col(id_col).alias("id_a"),
        F.col("_sec").alias("_sec_a"),
        F.explode(F.array(F.col("_bkt"), F.col("_bkt") + 1)).alias("_jb"),
    )
    b = base.select(
        key,
        F.col(id_col).alias("id_b"),
        F.col("_sec").alias("_sec_b"),
        F.col("_bkt").alias("_jb"),
    )
    gap = F.col("_sec_b") - F.col("_sec_a")
    # no dedup needed: a same-bucket b matches only via a's own-bucket
    # fan-out row and an adjacent-bucket b only via the +1 row, so each
    # qualifying pair meets exactly once (uniqueness is test-asserted —
    # a dropDuplicates here would add a pointless shuffle)
    return (
        a.join(b, [key, "_jb"])
        .filter(
            (gap > 0) & (gap <= max_gap_sec)
            | ((gap == 0) & (F.col("id_a") < F.col("id_b")))
        )
        .select(key, "id_a", "id_b", gap.cast("long").alias("gap_sec"))
    )
