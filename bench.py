#!/usr/bin/env python
"""Benchmark harness: runs every registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion via a count-style action that forces
full materialization of the result (collect for small results) — wall-clock
includes Catalyst planning + execution but excludes session startup.

Timings are STEADY-STATE: before the timed passes, every query runs once
untimed at sf0.001 (env SPARK_GRAFT_WARM_DIR) so whole-stage-codegen
compilation, JIT, and parquet-footer caches are warm — the timed numbers
measure the plans, not one-time JVM warm-up, mirroring a long-running
cluster. Set SPARK_GRAFT_WARM_DIR="" to benchmark cold.

Each query is timed over SPARK_GRAFT_BENCH_RUNS (default 5) interleaved
full passes; the reported per-query number — and the total — is the
MEDIAN, with per-query [min, max] spread alongside. Round 3 showed
single-shot numbers move +-40-65% on unchanged code purely from host
load; medians of 5 separate noise from drift.

A host-speed anchor (scripts/host_anchor.py — fixed CPU work, no
Spark) BRACKETS the suite (r14): the full anchor runs before the first
timed pass and after the last, and the fast par32-only leg runs between
every interleaved pass, so the anchor integrates over the same window
the suite does. r11 traced a 1.3x uniform suite swing to hypervisor
parallel throttling visible ONLY in the 32-process leg; r12 and r13
then both hit windows where a SINGLE-instant anchor read "quiet" while
the suite ran under load, producing phantom normalized drift that took
a per-query uniformity analysis to dismiss. The result now carries
"anchor_bracket" (all par32 samples + min/median/max); the normalized
suite value divides by the bracket MEDIAN (BASELINE.md rule).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


def _anchor_sample(par32_only: bool) -> dict | None:
    """One host-anchor subprocess run (scripts/host_anchor.py); the
    par32-only form costs ~2-3 s and is the leg that sees hypervisor
    parallel throttling. Failure is non-fatal (returns None)."""
    import subprocess

    args = [
        sys.executable,
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "scripts",
            "host_anchor.py",
        ),
    ]
    if par32_only:
        args.append("--par32-only")
    try:
        a_out = subprocess.run(
            args, capture_output=True, text=True, timeout=180
        )
        return json.loads(a_out.stdout.strip().splitlines()[-1])
    except Exception as e:  # pragma: no cover
        print(f"bench: host anchor failed: {e}", file=sys.stderr)
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5")))
    from weather_monitoring_spark.plans.registry import all_queries
    from weather_monitoring_spark.session import get_spark

    spark = get_spark(app_name="wms-bench")
    # Silence executor WARN spam (WindowExec single-partition notices etc.):
    # round 4's driver capture lost the result line because warnings pushed
    # the JSON head out of the captured tail. Belt: quiet logs. Suspenders:
    # the result is ALSO written to bench_result.json next to this script.
    spark.sparkContext.setLogLevel("ERROR")

    specs = all_queries()
    # Steady-state warm-up: every plan shape once at the tiny SF (compiles
    # whole-stage codegen + JIT per query), plus a trivial Arrow round-trip
    # for the Python UDF workers.
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    try:
        spark.range(32).mapInPandas(lambda it: it, "id long").collect()
    except Exception:
        pass
    if warm_dir and os.path.isdir(warm_dir):
        for name, spec in sorted(specs.items()):
            try:
                spec.spark(spark, warm_dir).write.format("noop").mode("overwrite").save()
            except Exception:
                pass

    # Anchor bracketing (r14): full anchor before the first timed pass,
    # par32-only between passes, full anchor after — min/median/max of
    # the par32 samples describes the host over the WHOLE suite window,
    # not one instant (the r12/r13 failure mode).
    anchor_pre = _anchor_sample(par32_only=False)

    # Interleaved passes: pass i runs every query once, so a transient
    # host-load spike lands on ONE sample of many queries rather than all
    # samples of one query — exactly what the median then rejects.
    samples: dict[str, list[float]] = {name: [] for name in specs}
    mid_anchors: list[dict | None] = []
    for run_i in range(n_runs):
        if run_i > 0:
            mid_anchors.append(_anchor_sample(par32_only=True))
        for name, spec in sorted(specs.items()):
            t0 = time.perf_counter()
            try:
                df = spec.spark(spark, sf_dir)
                # noop sink: full distributed execution of every result
                # row, no driver-side transfer — measures the engine,
                # not Arrow IPC.
                df.write.format("noop").mode("overwrite").save()
                samples[name].append(time.perf_counter() - t0)
            except Exception as e:  # pragma: no cover
                print(f"bench: {name} failed: {e}", file=sys.stderr)
                samples[name].append(-1.0)

    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name, ts in samples.items():
        ok = [t for t in ts if t >= 0]
        if not ok:
            timings[name] = -1.0
            spread[name] = [-1.0, -1.0]
        else:
            timings[name] = round(statistics.median(ok), 4)
            spread[name] = [round(min(ok), 4), round(max(ok), 4)]

    # Closing full anchor (the pre-r14 single sample, kept as
    # "host_anchor" for cross-round row compatibility).
    anchor = _anchor_sample(par32_only=False)

    # Assemble the bracket: every par32 sample taken across the window.
    par32_samples = [
        s["anchor"]["par32_s"]
        for s in [anchor_pre, *mid_anchors, anchor]
        if s and s.get("anchor", {}).get("par32_s")
    ]
    bracket = None
    if par32_samples:
        bracket = {
            "par32_samples": par32_samples,
            "par32_min": round(min(par32_samples), 4),
            "par32_median": round(statistics.median(par32_samples), 4),
            "par32_max": round(max(par32_samples), 4),
        }

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "query_suite_wall_clock",
        "value": round(sum(t for t in timings.values() if t > 0), 4),
        "unit": "sec",
        "queries": timings,
        "runs": n_runs,
        "spread": spread,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "host_anchor": anchor,
        "host_anchor_pre": anchor_pre,
        "anchor_bracket": bracket,
    }
    # Load-normalized suite value (r12 rule, r14 bracket revision —
    # BASELINE.md): norm = suite / median(par32 over the bracket)
    # divides out hypervisor parallel throttling as it actually was
    # DURING the suite, not at one instant after it.
    par32 = (bracket or {}).get("par32_median") or (anchor or {}).get(
        "anchor", {}
    ).get("par32_s")
    if par32:
        result["norm_suite_over_par32"] = round(result["value"] / par32, 1)
    line = json.dumps(result)
    # Headline line. The full result line is ~6 KB; the driver keeps the
    # TAIL of stdout and r15 showed its capture retains only ~3 KB, so
    # whatever is printed LAST must be small enough to survive whole.
    # r5 printed the headline first — truncation ate it and left the
    # unparseable tail of the full line (r6 verdict #1). Order therefore:
    # full line FIRST, headline LAST. r15's verdict #1: the headline
    # carried no "queries" key, so the driver's per-query comparison was
    # blind (PERF_r15 n_common=0). The headline now carries the per-query
    # MEDIANS (~1.9 KB incl. base keys — fits the capture with margin);
    # min/max spread + host anchors remain in the full line and in
    # bench_result.json. Additions-only: every pre-r16 headline key is
    # kept; "partial" stays true because spread/anchor detail is still
    # elsewhere.
    headline = json.dumps(
        {
            "metric": result["metric"],
            "value": result["value"],
            "unit": "sec",
            "queries": timings,
            "runs": n_runs,
            "sf": result["sf"],
            # the parallel-throttle anchor leg (bracket median), inline
            # so a tail-truncated capture still carries the normalizer
            "par32_s": par32,
            "partial": True,
            "detail": "bench_result.json",
        }
    )
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_result.json")
    try:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")
    except OSError as e:  # pragma: no cover
        print(f"bench: could not write {out_path}: {e}", file=sys.stderr)
    print(line, flush=True)
    print(headline, flush=True)


if __name__ == "__main__":
    main()
