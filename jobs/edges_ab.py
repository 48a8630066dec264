"""One-off A/B harness: time the edges stage alone under different Spark
memory/GC configs, resuming from a workdir whose features/blocks/pairs
stages are already checkpointed. Diagnostic tool for the scaling
protocol (BENCH/BASELINE.md) — not part of the engine.

Usage: python jobs/edges_ab.py BASE_WORKDIR CORES VARIANT_NAME 'k=v;k2=v2' [JAVA_OPTS]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    base, cores, name = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    extra = sys.argv[4] if len(sys.argv) > 4 else ""
    java_opts = sys.argv[5] if len(sys.argv) > 5 else None

    work = f"/dev/shm/ccer_ab/{name}"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)
    for stage in ("features", "blocks", "pairs"):
        shutil.copytree(os.path.join(base, stage), os.path.join(work, stage))
    manifest = json.load(open(os.path.join(base, "_manifest.json")))
    manifest["stages"] = {
        k: v for k, v in manifest["stages"].items()
        if k in ("features", "blocks", "pairs")
    }
    json.dump(manifest, open(os.path.join(work, "_manifest.json"), "w"))

    if java_opts:
        os.environ["CCER_DRIVER_JAVA_OPTS"] = java_opts
    if extra:
        os.environ["CCER_EXTRA_CONF"] = extra

    from ccer.plans.pipeline import PipelineConfig, run_pipeline
    from ccer.session import get_spark, task_metrics

    spark = get_spark(
        app_name=f"edges-ab-{name}", cores=cores,
        extra_conf={"spark.ui.enabled": "true"},
    )
    pages = spark.createDataFrame([], "url string, warc_ts timestamp, text string, lang string")
    t0 = time.time()
    clusters = run_pipeline(spark, pages, work, config=PipelineConfig(), resume=True)
    n = clusters.count()
    m = json.load(open(os.path.join(work, "_manifest.json")))
    print(json.dumps({
        "variant": name,
        "rows": n,
        "edges_sec": m["stages"]["edges"]["duration_sec"],
        "total_sec": round(time.time() - t0, 1),
        "task_metrics": task_metrics(spark),
    }))
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
