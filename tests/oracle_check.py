"""Local replica of the driver's correctness gate: run every
``queries()[name]`` on Spark and its ``oracle_sql()[name]`` on DuckDB at
sf0.01, compare row count + column names + order-insensitive value hash.

Usage:  python tests/oracle_check.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def value_hash(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted(
        "\x1f".join(_norm_cell(row[i]) for i in order) for row in rows
    )
    digest = hashlib.sha256()
    for line in lines:
        digest.update(line.encode("utf-8"))
        digest.update(b"\n")
    return digest.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # resolve bare names like "sf0.01" against the test-data root so the
    # documented invocation works from any cwd (DuckDB resolves relative
    # paths against the process cwd, which silently broke them before)
    if not os.path.isabs(sf_dir) and not os.path.isdir(sf_dir):
        candidate = os.path.join("/root/testdata", sf_dir)
        if os.path.isdir(candidate):
            sf_dir = candidate
    sf_dir = os.path.abspath(sf_dir)
    only = set(sys.argv[2:])

    from ccer.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(app_name="oracle-check", cores=16, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results = {}
    failed = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            entry = {
                "spark_rows": len(srows),
                "spark_cols": scols,
                "spark_sec": round(time.time() - t0, 2),
            }
            if name in oracles:
                cur = con.execute(oracles[name])
                ocols = [d[0] for d in cur.description]
                orows = cur.fetchall()
                entry.update(
                    oracle_rows=len(orows),
                    rows_match=len(srows) == len(orows),
                    cols_match=sorted(scols) == sorted(ocols),
                    hash_match=value_hash(srows, scols) == value_hash(orows, ocols),
                )
                ok = entry["rows_match"] and entry["cols_match"] and entry["hash_match"]
            else:
                entry["rows_only"] = True
                ok = True
            entry["ok"] = ok
            if not ok:
                failed.append(name)
        except Exception as exc:  # noqa: BLE001
            entry = {"ok": False, "error": f"{type(exc).__name__}: {exc}"[:400]}
            failed.append(name)
        results[name] = entry
        status = "OK " if entry.get("ok") else "FAIL"
        print(f"{status} {name}: {json.dumps(entry, default=str)[:220]}", flush=True)

    # full (untruncated) per-query results for artifact generation — the
    # console lines above clip each entry to 220 chars for readability
    dump_path = os.environ.get("CCER_ORACLE_JSON")
    if dump_path:
        with open(dump_path, "w") as fh:
            json.dump(
                {"sf_dir": sf_dir, "n": len(results), "failed": failed, "queries": results},
                fh,
                indent=1,
                default=str,
            )
    print(json.dumps({"n": len(results), "failed": failed}))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
