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
cluster, ``table_format="iceberg"`` writes ``writeTo(...).partitionedBy(
bucket(N, id)).createOrReplace()`` so every stage lands bucketed on ``id``
and the downstream self-joins read co-located buckets. Lineage rows
(per-partition counts + wall time) land next to each stage.

Resume safety: the manifest records a ``fingerprint`` per stage (caller-
supplied config/input digest). ``exists`` requires (a) the manifest entry,
(b) the stage data to still be present on disk / in the catalog, and
(c) the fingerprint to match when the caller supplies one — so editing the
config or swapping the input invalidates stale checkpoints instead of
silently reusing them.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession, functions as F


class StageStore:
    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        table_format: str = "auto",
        fingerprint: str | None = None,
        bucket_count: int = 64,
    ):
        self.spark = spark
        self.base_dir = base_dir
        os.makedirs(base_dir, exist_ok=True)
        self.manifest_path = os.path.join(base_dir, "_manifest.json")
        if table_format == "auto":
            table_format = "iceberg" if self._iceberg_available() else "parquet"
        self.table_format = table_format
        self.fingerprint = fingerprint
        self.bucket_count = bucket_count

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
        return [name for name in self._load_manifest()["stages"] if self.exists(name)]

    # --------------------------------------------------------------- stages
    def path(self, name: str) -> str:
        return os.path.join(self.base_dir, name)

    def _table_name(self, name: str) -> str:
        """Session-catalog name for a bucketed stage — keyed by workdir so
        two pipelines in one session never collide."""
        digest = hashlib.md5(self.base_dir.encode()).hexdigest()[:8]
        return f"ccer_{name}_{digest}"

    def _data_present(self, name: str) -> bool:
        if self.table_format == "iceberg":
            try:
                return self.spark.catalog.tableExists(f"ccer.{name}")
            except Exception:
                return False
        # parquet: the directory must exist and hold a _SUCCESS marker
        # (a killed write leaves part files without one)
        return os.path.exists(os.path.join(self.path(name), "_SUCCESS"))

    def exists(self, name: str) -> bool:
        meta = self._load_manifest()["stages"].get(name, {})
        if not meta.get("complete", False):
            return False
        if not self._data_present(name):
            return False
        if self.fingerprint is not None and meta.get("fingerprint") != self.fingerprint:
            return False
        return True

    def write(
        self,
        df: DataFrame,
        name: str,
        partition_by: list[str] | None = None,
        bucket_by: str | None = None,
        start: float | None = None,
    ) -> DataFrame:
        """Materialize a stage; records lineage (row count, per-partition
        counts, duration) and marks it complete in the manifest. Returns
        the re-read DataFrame so downstream plans start from the scan.

        ``bucket_by``: hash-bucket the stage on a join key. Downstream
        equi-joins on that key then read co-located, pre-sorted buckets
        and skip the stage-side exchange entirely (the heavy features
        payload — signatures + sketches — is shuffled once at write time
        instead of once per consuming join). Same-session reads resolve
        through the catalog table; a resume in a fresh session falls back
        to the plain parquet path (correct, just unbucketed)."""
        # ``start``: pass the timestamp from BEFORE the stage's plan was
        # built when the plan construction itself executes work (the
        # scorer's eager localCheckpoint materializes the whole pairwise
        # crossing at plan-build time) — otherwise duration_sec silently
        # excludes the stage's dominant cost (measured: ~50 s of scoring
        # invisible between 'pairs' and 'edges' at 960k pages).
        start = time.time() if start is None else start
        if self.table_format == "iceberg":
            writer = df.writeTo(f"ccer.{name}")
            if partition_by:
                writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
            elif bucket_by or "id" in df.columns:
                # bucket on the join/shuffle key so stage reads are
                # co-located for the downstream self-joins
                writer = writer.partitionedBy(
                    F.bucket(self.bucket_count, F.col(bucket_by or "id"))
                )
            writer.createOrReplace()
        elif bucket_by:
            tbl = self._table_name(name)
            self.spark.sql(f"DROP TABLE IF EXISTS {tbl}")
            shutil.rmtree(self.path(name), ignore_errors=True)
            (
                # one shuffle to bucket layout now; one file per bucket
                # (repartition first), sorted within — consuming sort-merge
                # joins skip both their exchange and their sort
                df.repartition(self.bucket_count, F.col(bucket_by))
                .write.mode("overwrite")
                .bucketBy(self.bucket_count, bucket_by)
                .sortBy(bucket_by)
                .option("path", self.path(name))
                .format("parquet")
                .saveAsTable(tbl)
            )
        else:
            writer = df.write.mode("overwrite")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(self.path(name))
        out = self.read(name)
        per_partition = self._lineage_counts(name, out)
        rows = sum(p["rows"] for p in per_partition)
        manifest = self._load_manifest()
        manifest["stages"][name] = {
            "complete": True,
            "rows": rows,
            "n_partitions": len(per_partition),
            "duration_sec": round(time.time() - start, 3),
            "format": self.table_format,
            "fingerprint": self.fingerprint,
            "bucket_by": bucket_by,
            "bucket_count": self.bucket_count if bucket_by else None,
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

    def _lineage_counts(self, name: str, out: DataFrame) -> list[dict]:
        """Per-partition lineage rows. For parquet stages the counts come
        straight from the file footers (driver-side, zero Spark jobs —
        the previous groupBy(spark_partition_id) re-read every stage it
        had just written, a full extra table scan per stage); the Iceberg
        branch counts through the engine."""
        if self.table_format == "parquet":
            try:
                import glob

                import pyarrow.parquet as pq

                files = sorted(glob.glob(os.path.join(self.path(name), "*.parquet")))
                if files:
                    return [
                        {
                            "partition": i,
                            "file": os.path.basename(f),
                            "rows": pq.ParquetFile(f).metadata.num_rows,
                        }
                        for i, f in enumerate(files)
                    ]
            except Exception:
                pass
        return [
            {"partition": r["p"], "rows": r["rows"]}
            for r in out.groupBy(F.spark_partition_id().alias("p"))
            .agg(F.count(F.lit(1)).alias("rows"))
            .collect()
        ]

    def read(self, name: str) -> DataFrame:
        if self.table_format == "iceberg":
            return self.spark.read.table(f"ccer.{name}")
        try:
            tbl = self._table_name(name)
            if self.spark.catalog.tableExists(tbl):
                return self.spark.read.table(tbl)
            meta = self._load_manifest()["stages"].get(name, {})
            if meta.get("bucket_by"):
                # resume in a fresh session: re-register the external
                # bucketed table over the existing files (bucket ids are
                # encoded in the part-file name suffixes), so resumed
                # plans keep the exchange-free joins
                ddl = self.spark.read.parquet(self.path(name)).schema.toDDL()
                key = meta["bucket_by"]
                self.spark.sql(
                    f"CREATE TABLE {tbl} ({ddl}) USING parquet "
                    f"CLUSTERED BY ({key}) SORTED BY ({key}) "
                    f"INTO {meta.get('bucket_count') or self.bucket_count} BUCKETS "
                    f"LOCATION '{self.path(name)}'"
                )
                return self.spark.read.table(tbl)
        except Exception:
            pass
        return self.spark.read.parquet(self.path(name))

    def invalidate_from(self, name: str, order: list[str]) -> None:
        """Mark ``name`` and all later stages incomplete (re-run policy)."""
        manifest = self._load_manifest()
        if name in order:
            for stage in order[order.index(name):]:
                if stage in manifest["stages"]:
                    manifest["stages"][stage]["complete"] = False
        self._save_manifest(manifest)
