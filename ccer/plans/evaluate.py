"""Pairwise precision / recall / F1 of predicted clusters vs labels.

The BASELINE.json gate: pairwise F1 ≥ 0.99 on labeled pairs. Truth and
prediction are both reduced to intra-cluster record pairs and compared
with joins — fully distributed, no driver-side set building.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _pairs_by_label(df: DataFrame, label_col: str) -> DataFrame:
    """Intra-cluster record pairs keyed by (url, warc_ts) composite."""
    keyed = df.select(
        F.col(label_col).alias("c"),
        F.concat_ws("@", "url", F.col("warc_ts").cast("string")).alias("k"),
    )
    a = keyed.select("c", F.col("k").alias("k_a"))
    b = keyed.select("c", F.col("k").alias("k_b"))
    return (
        a.join(b, "c")
        .filter(F.col("k_a") < F.col("k_b"))
        .select("k_a", "k_b")
        .distinct()
    )


def pairwise_scores(clusters: DataFrame, labeled: DataFrame) -> dict:
    """clusters: (url, warc_ts, cluster_id, ...); labeled: (url, warc_ts,
    true_cluster_id). Returns {tp, fp, fn, precision, recall, f1}."""
    pred = _pairs_by_label(clusters, "cluster_id")
    truth = _pairs_by_label(labeled, "true_cluster_id")
    tp = pred.join(truth, ["k_a", "k_b"], "inner").count()
    n_pred = pred.count()
    n_truth = truth.count()
    fp = n_pred - tp
    fn = n_truth - tp
    precision = tp / n_pred if n_pred else 1.0
    recall = tp / n_truth if n_truth else 1.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if (precision + recall) > 0
        else 0.0
    )
    return {
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "precision": precision,
        "recall": recall,
        "f1": f1,
    }
