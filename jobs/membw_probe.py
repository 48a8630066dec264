"""Host memory-bandwidth probe: does aggregate DRAM throughput scale
with worker count on this box?

Why this exists: the N-vs-4N executor-mode scaling runs
(BENCH/SCALING_RUNS_EXECUTORS.md) show the CPU-heavy stages scaling
near-perfectly (features 3.9x at 4x cores) while the shuffle/
checkpoint-heavy stages stay flat (edges 66.7 -> 64.1 s). The CPU
capacity bracket cannot explain that split: it measures deliverable
ALU throughput, not memory-system throughput. On this sandbox every
"executor" shares one guest's DRAM controllers, so a stage whose cost
is dominated by moving bytes (shuffle ser/de, Arrow IPC, localCheckpoint
block writes) is bounded by aggregate bandwidth, which saturates long
before 16 cores. On a real 4-node cluster each node brings its own
memory system, so this ceiling is an artifact of single-host evidence,
not of the plan.

The probe: each worker repeatedly copies a buffer sized far beyond L3
(256 MiB) with numpy (memcpy-grade streaming). Workers are released
together through a Barrier after allocating/warming their buffers, and
the aggregate rate is total bytes moved divided by the wall-clock of
the overlapped window — summing per-worker rates over unsynchronized
windows overstates bandwidth at high worker counts (pool startup skew
means the timed loops don't fully overlap), which would bias the very
saturation number the probe exists to demonstrate. Aggregate GiB/s at
1, 4, and 16 workers shows how much of the 4x -> 16x core step the
memory system actually delivers. Run it SOLO (no concurrent Spark)
like the CPU bursts.

Memory footprint is workers * 2 * mib (each worker holds a src and a
dst buffer) — e.g. 16 GiB at --workers 16 --mib 512. The probe refuses
to start a level whose footprint exceeds 60% of MemAvailable, because
swapping would corrupt the bandwidth numbers being measured.

Usage: python jobs/membw_probe.py [--mib 256] [--reps 8] [--workers 1,4,16]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time

_BARRIER = None


def _init_worker(barrier) -> None:
    global _BARRIER
    _BARRIER = barrier


def _copy_burst(args):
    """Return (gib_moved, t_start, t_end) for one worker's copy loop.

    The worker allocates and warms its buffers FIRST, then waits at the
    shared barrier, so every worker's timed loop starts together and the
    parent can divide total bytes by the overlapped wall-clock.
    """
    mib, reps = args
    import numpy as np

    src = np.ones(mib * 1024 * 1024 // 8, dtype=np.int64)
    dst = np.empty_like(src)
    # warm both buffers so page faults don't count against bandwidth
    dst[:] = src
    if _BARRIER is not None:
        _BARRIER.wait()
    t0 = time.perf_counter()
    for _ in range(reps):
        dst[:] = src
    t1 = time.perf_counter()
    # a copy moves ~2 bytes per byte of buffer (read src + write dst);
    # report GiB moved with that factor so numbers are comparable to
    # STREAM-copy conventions
    return 2.0 * reps * mib / 1024.0, t0, t1


def _mem_available_mib() -> int | None:
    try:
        with open("/proc/meminfo") as fh:
            for line in fh:
                if line.startswith("MemAvailable:"):
                    return int(line.split()[1]) // 1024
    except OSError:
        pass
    return None


def aggregate_bw(workers: int, mib: int, reps: int) -> float:
    """Aggregate GiB/s across ``workers`` barrier-synchronized streaming
    copies: total GiB moved / wall-clock from first start to last end.
    perf_counter is CLOCK_MONOTONIC (machine-wide on Linux), so worker
    timestamps are directly comparable across processes."""
    avail = _mem_available_mib()
    footprint = workers * 2 * mib
    if avail is not None and footprint > 0.6 * avail:
        raise SystemExit(
            f"refusing --workers {workers} --mib {mib}: footprint "
            f"{footprint} MiB > 60% of MemAvailable ({avail} MiB); "
            "swapping would corrupt the bandwidth measurement"
        )
    ctx = mp.get_context("fork")
    barrier = ctx.Barrier(workers)
    with ctx.Pool(workers, initializer=_init_worker, initargs=(barrier,)) as pool:
        results = pool.map(_copy_burst, [(mib, reps)] * workers)
    total_gib = sum(r[0] for r in results)
    wall = max(r[2] for r in results) - min(r[1] for r in results)
    return total_gib / wall


def main() -> None:
    ap = argparse.ArgumentParser(
        description=__doc__.splitlines()[0],
        epilog="memory footprint per level: workers * 2 * mib MiB",
    )
    ap.add_argument("--mib", type=int, default=256)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--workers", default="1,4,16")
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()
    levels = [int(w) for w in args.workers.split(",")]

    out = {"mib": args.mib, "reps": args.reps, "rounds": args.rounds, "levels": {}}
    for w in levels:
        samples = sorted(
            aggregate_bw(w, args.mib, args.reps) for _ in range(args.rounds)
        )
        out["levels"][str(w)] = {
            "aggregate_gib_s_median": round(samples[len(samples) // 2], 2),
            "samples": [round(s, 2) for s in samples],
        }
    lv = out["levels"]
    if "4" in lv and "16" in lv:
        out["bw_scaling_4_to_16"] = round(
            lv["16"]["aggregate_gib_s_median"] / lv["4"]["aggregate_gib_s_median"], 3
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
