#!/usr/bin/env python
"""Scale probe for the round-9 operators:

1. c4_rules              — line-level C4 cleaning (expected: zero shuffle,
                           scan-speed);
2. gopher_repetition_rules — the A1.2 table; the heaviest row-local array
                           algebra in the repo (per-n sort-adjacency +
                           interval folds) — the probe question is wall
                           per doc, not shuffle (expected zero);
3. fix_mojibake (table)  — one JVM replace chain (expected: scan-speed);
4. read_warc             — records/s through the binaryFile + mapInPandas
                           parse on generated .warc.gz files (per-record
                           gzip members, the Common Crawl layout).

Corpus: the scale_probe.py md5-word construction, extended with line
breaks every 10 words and a planted repeated-paragraph class (10% of
docs) so the repetition signals have real work. Wall + Spark-UI shuffle
byte deltas per stage, one JSON line per size; appends to
scripts/probe_r9_ops.json.

Usage: python scripts/probe_r9_ops.py [n_docs ...] [--stages=a,b]
       (default: 2000000 5000000)
Env: SPARK_GRAFT_PROBE_MEM (90g), SPARK_GRAFT_PROBE_PARTS (256).
"""

from __future__ import annotations

import gzip
import json
import os
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stage_totals(ui: str) -> dict[str, int]:
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages")
    )
    tot = {"shuffle_write": 0, "shuffle_read": 0, "mem_spill": 0, "disk_spill": 0}
    for s in stages:
        if s.get("status") not in ("COMPLETE", "FAILED"):
            continue
        tot["shuffle_write"] += s.get("shuffleWriteBytes", 0)
        tot["shuffle_read"] += s.get("shuffleReadBytes", 0)
        tot["mem_spill"] += s.get("memoryBytesSpilled", 0)
        tot["disk_spill"] += s.get("diskBytesSpilled", 0)
    return tot


def _make_warc_files(root: str, n_files: int, recs_per_file: int) -> int:
    """Per-record-gzip .warc.gz fixtures (~1 KB HTML bodies)."""
    total = 0
    for f in range(n_files):
        parts = []
        for r in range(recs_per_file):
            body = (
                "<html><body><p>"
                + " ".join(f"w{f}x{r}x{i}" for i in range(100))
                + "</p></body></html>"
            ).encode()
            http = (
                f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode() + body
            hdr = (
                "WARC/1.0\r\nWARC-Type: response\r\n"
                f"WARC-Record-ID: <urn:uuid:{f}-{r}>\r\n"
                "WARC-Date: 2026-08-15T00:00:00Z\r\n"
                f"WARC-Target-URI: http://probe.example/{f}/{r}\r\n"
                "Content-Type: application/http; msgtype=response\r\n"
                f"Content-Length: {len(http)}\r\n\r\n"
            ).encode()
            parts.append(gzip.compress(hdr + http + b"\r\n\r\n", 1))
            total += 1
        with open(os.path.join(root, f"seg{f:04d}.warc.gz"), "wb") as fh:
            fh.write(b"".join(parts))
    return total


def main() -> None:
    stage_filter = None
    sizes = []
    for a in sys.argv[1:]:
        if a.startswith("--stages="):
            stage_filter = a.split("=", 1)[1].split(",")
        else:
            sizes.append(int(a))
    sizes = sizes or [2_000_000, 5_000_000]

    from pyspark.sql import functions as F

    from weather_monitoring_spark.operators.quality import (
        c4_rules,
        gopher_repetition_rules,
    )
    from weather_monitoring_spark.operators.textops import fix_mojibake
    from weather_monitoring_spark.session import get_spark
    from weather_monitoring_spark.sources.warc import read_warc

    spark = get_spark(
        app_name="probe-r9-ops",
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_PROBE_MEM", "90g"),
            "spark.sql.shuffle.partitions": os.environ.get(
                "SPARK_GRAFT_PROBE_PARTS", "256"
            ),
            "spark.ui.enabled": "true",
        },
    )
    ui = spark.sparkContext.uiWebUrl
    results = []

    for n_docs in sizes:
        out: dict = {"n_docs": n_docs}
        # scale_probe.py word construction + a newline every 10 words +
        # paragraph breaks; 10% of docs repeat their own first paragraph
        # 3x (the repetition class), 5% carry planted mojibake.
        docs = (
            spark.range(n_docs)
            .select(
                F.col("id").alias("doc_id"),
                F.expr(
                    "concat_ws('\\n', transform(sequence(1, 6), l -> "
                    "concat_ws(' ', transform(sequence(1, 10), i -> "
                    "substring(md5(concat(id, ':', l, ':w', i)), 1, 8)))))"
                ).alias("base"),
            )
            .select(
                "doc_id",
                F.when(
                    F.col("doc_id") % 10 == 0,
                    F.expr(
                        "concat(base, '\\n\\n', split(base, '\\n')[0], "
                        "'\\n', split(base, '\\n')[0], '\\n', "
                        "split(base, '\\n')[0])"
                    ),
                )
                .when(
                    F.col("doc_id") % 20 == 1,
                    F.concat(F.col("base"), F.lit(" cafÃ© â€™end")),
                )
                .otherwise(F.col("base"))
                .alias("text"),
            )
            .localCheckpoint(eager=True)
        )

        def timed(name, fn):
            if stage_filter is not None and not any(
                s in name for s in stage_filter
            ):
                return
            before = _stage_totals(ui)
            t0 = time.time()
            extra = fn()
            wall = round(time.time() - t0, 1)
            after = _stage_totals(ui)
            row = {
                "wall_s": wall,
                **{
                    k: after[k] - before[k]
                    for k in ("shuffle_write", "shuffle_read", "mem_spill", "disk_spill")
                },
            }
            if extra:
                row.update(extra)
            out[name] = row
            print(f"  {name} @ {n_docs}: {row}", flush=True)

        timed(
            "c4_rules",
            lambda: {
                "n_kept": c4_rules(docs)
                .filter("verdict = 'kept'")
                .count()
            },
        )
        timed(
            "gopher_repetition",
            lambda: dict(
                zip(
                    ("n_flagged", "n_kept"),
                    [
                        r["n"]
                        for r in gopher_repetition_rules(docs)
                        .select(
                            F.when(F.col("verdict") == "kept", "kept")
                            .otherwise("flagged")
                            .alias("v")
                        )
                        .groupBy("v")
                        .agg(F.count("*").alias("n"))
                        .orderBy("v")
                        .collect()
                    ],
                )
            ),
        )
        timed(
            "fix_mojibake_table",
            lambda: {
                "n_changed": fix_mojibake(docs)
                .filter("changed")
                .count()
            },
        )
        results.append(out)
        print(json.dumps(out), flush=True)

    # WARC parse throughput (size-independent of the doc corpus)
    if stage_filter is None or any("warc" in s for s in stage_filter):
        root = tempfile.mkdtemp(prefix="warcprobe-")
        n_rec = _make_warc_files(root, n_files=64, recs_per_file=2000)
        t0 = time.time()
        parsed = read_warc(spark, root).count()
        wall = round(time.time() - t0, 1)
        row = {
            "n_files": 64,
            "n_records": n_rec,
            "parsed": parsed,
            "wall_s": wall,
            "records_per_s": round(parsed / wall, 0),
        }
        results.append({"warc_parse": row})
        print(json.dumps({"warc_parse": row}), flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "probe_r9_ops.json")
    existing = []
    if os.path.exists(path):
        existing = json.load(open(path))
    json.dump(existing + results, open(path, "w"), indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
