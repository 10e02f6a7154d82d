#!/usr/bin/env python
"""Charset-decode stage: measure the r12 two-phase routed sniff
(verdict #2) against the pure WHATWG ladder and the JVM default.

Shipped design (operators/charset.py, sniffed_text_col two_phase=True):
the routing predicate runs JVM-side; fast rows cross the Arrow boundary
as NULLs (no page bytes to Python) and decode as a plain cast — the
predicate has already proven UTF-8 validity. Two rejected designs and
why (measured r12, interleaved best-of-5 at local[32] + single-core
control):

- filter/filter/UNION split: 1.4x on a cached source but re-scans the
  source twice — behind the WARC parse that doubles the most expensive
  stage of the crawl path;
- single-pass mapInArrow router (vectorized Arrow cast for flagged
  rows): 0.5-0.9x — the Arrow machinery + predicate cost exceeds the
  per-row boxing it avoids.

Corpus mirrors the r11 BASELINE.md measurement row (500k pages /
~1.5 GB; the non-UTF-8 remainder splits 62.5% declared latin-1 /
25% undeclared 1252 / 12.5% BOM) at TWO mixes: 60% UTF-8 (the r11
fixture shape, the adversarial floor for routing) and 95% UTF-8 (the
real-crawl shape). Synthesis is distributed and localCheckpoint-pinned;
variants are timed INTERLEAVED (best-of-5 per variant) because the
host's parallel-throttling band drifts on a seconds scale and
back-to-back blocks attribute the band to whichever variant ran last.
``sum(length(html))`` forces full evaluation without letting Catalyst
prune the decode column. Fidelity (two-phase == one-phase, whole-corpus
hash) is asserted inline. The host anchor embeds in the result.

Prints one JSON line:
  {"pages", "anchor", "mixes": {"60": {...}, "95": {...}}}
  each mix: {"corpus_mb", "jvm_s", "one_phase_s", "two_phase_s",
             "one_phase_mb_s", "two_phase_mb_s", "speedup",
             "fidelity_identical"}

Usage: python scripts/probe_charset_routing.py [n_pages]  (default 500000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000


def _synth(utf8_frac):
    def synth(batches):
        import random

        import pandas as pd

        base = (
            "Café déjà vu — naïve “fiancée” résumé. The quick brown fox "
            "jumps over the lazy dog while enumerating charset rungs. "
        )
        rest = 1.0 - utf8_frac
        for pdf in batches:
            rows_p, rows_c = [], []
            for i in pdf["id"]:
                rng = random.Random(int(i))
                body = (base * rng.randint(8, 40)).encode("utf-8")
                r = rng.random()
                if r < utf8_frac:  # utf-8, declared
                    rows_p.append(body)
                    rows_c.append("text/html; charset=utf-8")
                elif r < utf8_frac + rest * 0.625:  # declared latin-1
                    rows_p.append(
                        body.decode("utf-8").encode("windows-1252", "replace")
                    )
                    rows_c.append("text/html; charset=iso-8859-1")
                elif r < utf8_frac + rest * 0.875:  # undeclared 1252
                    rows_p.append(
                        body.decode("utf-8").encode("windows-1252", "replace")
                    )
                    rows_c.append("text/html")
                else:  # BOM
                    rows_p.append(b"\xef\xbb\xbf" + body)
                    rows_c.append("text/html")
            yield pd.DataFrame({"payload": rows_p, "ct": rows_c})

    return synth


def main() -> None:
    from pyspark.sql import functions as F

    from weather_monitoring_spark.operators.charset import sniffed_text_col
    from weather_monitoring_spark.session import get_spark

    # 8g driver so the localCheckpoint actually pins the corpus —
    # evicted partitions would re-synthesize per run and time synthesis
    spark = get_spark(
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "8g"},
    )
    p, c = F.col("payload"), F.col("ct")
    mixes = {}
    for frac in (0.60, 0.95):
        df = (
            spark.range(N)
            .repartition(32)
            .mapInPandas(_synth(frac), "payload binary, ct string")
            .localCheckpoint()
        )
        mb = df.select(F.sum(F.length("payload"))).first()[0] / 1e6
        frames = {
            "jvm": df.withColumn(
                "html", F.make_valid_utf8(p.cast("string"))
            ),
            "one": df.withColumn(
                "html", sniffed_text_col(p, c, two_phase=False)
            ),
            "two": df.withColumn(
                "html", sniffed_text_col(p, c, two_phase=True)
            ),
        }
        best = {k: float("inf") for k in frames}
        for _ in range(5):
            for k, fr in frames.items():
                t0 = time.monotonic()
                fr.agg(F.sum(F.length("html"))).collect()
                best[k] = min(best[k], time.monotonic() - t0)

        def corpus_hash(fr):
            return (
                fr.select(
                    F.sha2(
                        F.coalesce(F.col("html"), F.lit("\0NULL")), 256
                    ).alias("h")
                )
                .agg(
                    F.sum(
                        F.conv(F.substring("h", 1, 15), 16, 10).cast(
                            "decimal(38,0)"
                        )
                    )
                )
                .first()[0]
            )

        same = corpus_hash(frames["two"]) == corpus_hash(frames["one"])
        mixes[f"{frac:.0%}"] = {
            "corpus_mb": round(mb, 1),
            "jvm_s": round(best["jvm"], 3),
            "one_phase_s": round(best["one"], 3),
            "two_phase_s": round(best["two"], 3),
            "one_phase_mb_s": round(mb / best["one"], 1),
            "two_phase_mb_s": round(mb / best["two"], 1),
            "speedup": round(best["one"] / best["two"], 2),
            "fidelity_identical": bool(same),
        }
        df.unpersist()

    anchor = None
    try:
        import subprocess

        out = subprocess.run(
            [
                sys.executable,
                os.path.join(os.path.dirname(os.path.abspath(__file__)), "host_anchor.py"),
            ],
            capture_output=True,
            text=True,
            timeout=120,
        )
        anchor = json.loads(out.stdout.strip().splitlines()[-1])
    except Exception:
        pass
    print(json.dumps({"pages": N, "anchor": anchor, "mixes": mixes}))


if __name__ == "__main__":
    main()
