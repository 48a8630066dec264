"""Error-tolerant sources + partitioned sinks (SURVEY §2.1).

The reference's scan layer is: recursive gz-JSONL with per-line error
tolerance (openalex main.rs:546-685), CSV auto-ingest with
ignore_errors/all_varchar (build_db.py:206-245), and an
``import_errors(error_message, row_content, timestamp)`` side table
(build_db.py:113-121). Spark equivalents:

- gzip JSONL: ``spark.read.json("dir/**/*.gz")`` decodes gzip natively;
  PERMISSIVE mode + a corrupt-record column replaces the per-line skip
  counters.
- CSV: PERMISSIVE all-string schema-on-read; malformed rows land in the
  corrupt-record column instead of aborting the scan.
- The error side-channel becomes a real DataFrame split off the same
  scan — one pass, two outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl_tolerant(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None
) -> tuple[DataFrame, DataFrame]:
    """Gz/plain JSONL scan with per-line error tolerance.

    Returns (good_rows, import_errors) where import_errors has the
    reference's side-table shape (error_message, row_content, timestamp).
    """
    reader = spark.read.option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", CORRUPT_COL
    )
    if schema is not None:
        if isinstance(schema, str):
            schema = T.StructType.fromDDL(schema)
        schema = T.StructType(schema.fields + [T.StructField(CORRUPT_COL, T.StringType())])
        reader = reader.schema(schema)
    df = reader.json(path)
    if CORRUPT_COL not in df.columns:
        errors = spark.createDataFrame(
            [], "error_message string, row_content string, timestamp timestamp"
        )
        return df, errors
    df = df.cache()  # one scan, two outputs (Spark requires caching to
    # split corrupt-record rows deterministically)
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    errors = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.lit("CAST failed or malformed JSON").alias("error_message"),
        F.col(CORRUPT_COL).alias("row_content"),
        F.current_timestamp().alias("timestamp"),
    )
    return good, errors


def read_csv_tolerant(
    spark: SparkSession,
    path: str,
    header: bool = True,
    all_varchar: bool = True,
    max_chars_per_column: int = 10_485_760,
    column_mapping: dict[str, str] | None = None,
) -> DataFrame:
    """CSV auto-ingest, error-tolerant (build_db.py:206-221 semantics):
    all-string schema, huge-field tolerance, malformed rows kept as nulls
    rather than failing the scan. ``column_mapping`` applies the
    config-driven rename (config_sample.yaml:9-12 → workflows.py:35-41).
    """
    reader = (
        spark.read.option("header", header)
        .option("mode", "PERMISSIVE")
        .option("maxCharsPerColumn", max_chars_per_column)
        .option("multiLine", True)
        .option("escape", '"')
    )
    if not all_varchar:
        reader = reader.option("inferSchema", True)
    df = reader.csv(path)
    for src, dst in (column_mapping or {}).items():
        if src in df.columns:
            df = df.withColumnRenamed(src, dst)
    return df


def write_partitioned_csv(
    df: DataFrame, path: str, partition_by: list[str], header: bool = True
) -> None:
    """Partitioned CSV sink — the Spark replacement for the reference's
    one-file-per-source_id writer with its LRU handle cache
    (openalex main.rs:973-1135); Spark's committer manages file handles.
    """
    df.write.mode("overwrite").partitionBy(*partition_by).option(
        "header", header
    ).csv(path)


def write_ordered_csv(
    df: DataFrame, path: str, order_by: list[str], header: bool = True
) -> None:
    """Deterministically ordered CSV export (repository.py:182-187
    ``COPY ... ORDER BY``): a range-partitioned total sort; single file
    only when small (coalesce(1) is a deliberate scale tradeoff)."""
    df.orderBy(*order_by).coalesce(1).write.mode("overwrite").option(
        "header", header
    ).csv(path)
