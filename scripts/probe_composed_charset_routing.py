#!/usr/bin/env python
"""Composed-path cost of the r12 two-phase charset routing (VERDICT r12
#7): the isolated decode stage measured 1.38x/1.24x (probe_charset_
routing.py), but the shipped composition is

    read_warc -> warc_responses_to_documents(charset="sniff")
              -> pipelines.curate_crawl

where the WARC parse and the curation stages dilute the decode stage's
share. This probe runs THAT composition end-to-end on a synthetic
on-disk WARC corpus at the two standing mixes (60% / 95% valid-UTF-8
pages, remainder split declared-latin-1 / undeclared-1252), toggling
ONLY the two_phase flag, interleaved best-of-3 per variant (the host
band drifts on a seconds scale; back-to-back blocks attribute the band
to whichever ran last). The curation runs at the
engine's checkpoint=True default: each stage materializes once, so the
decode stage runs exactly once per variant — under checkpoint=False the
lazy DAG re-evaluates the decode for every downstream shuffle branch
and the measurement smears both variants by the re-evaluation count. Fidelity is asserted: both
variants must produce identical survivor sets.

Prints one JSON line; writes scripts/probe_composed_charset_routing.json.

Usage: python scripts/probe_composed_charset_routing.py [n_pages]
(default 32000)
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

N_PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 32_000
N_FILES = 16
RUNS = 3

_WORDS = (
    "the of and to in a is that for it as was with be by on not he this are "
    "or his from at which but have an they you were her all she there would "
    "their we him been has when who will more no if out so said what up its "
    "café déjà naïve résumé fiancée jalapeño señor crème brûlée touché"
).split()


def _page_bytes(rng: random.Random, kind: str, i: int) -> tuple[bytes, str]:
    """(payload bytes, content-type header value) for one page."""
    body = f"<html><p>doc {i}</p><p>" + " ".join(
        rng.choices(_WORDS, k=420)
    ) + "</p></html>"
    if kind == "utf8":
        return body.encode("utf-8"), "text/html"
    if kind == "latin1":
        return body.encode("latin-1", "replace"), "text/html; charset=iso-8859-1"
    # undeclared windows-1252: smart quotes + euro force the 1252 rung
    body = body.replace("doc", "“doc” €")
    return body.encode("cp1252", "replace"), "text/html"


def synth_warc_dir(utf8_frac: float, n_pages: int) -> str:
    d = tempfile.mkdtemp(prefix=f"composed_charset_{int(utf8_frac*100)}_")
    rng = random.Random(42)
    per_file = n_pages // N_FILES
    doc = 0
    for f_idx in range(N_FILES):
        recs = []
        for _ in range(per_file):
            r = rng.random()
            if r < utf8_frac:
                kind = "utf8"
            elif r < utf8_frac + (1 - utf8_frac) * 0.625:
                kind = "latin1"
            else:
                kind = "cp1252"
            # ~10% URL re-crawls + ~5% exact-dup bodies keep the dedup
            # stages honest
            url_id = doc if rng.random() > 0.10 else max(0, doc - 7)
            body_id = doc if rng.random() > 0.05 else max(0, doc - 13)
            payload, ctype = _page_bytes(rng, kind, body_id)
            http = (
                f"HTTP/1.1 200 OK\r\nContent-Type: {ctype}\r\n"
                f"Content-Length: {len(payload)}\r\n\r\n"
            ).encode() + payload
            recs.append(
                (
                    f"WARC/1.0\r\nWARC-Type: response\r\n"
                    f"WARC-Record-ID: <urn:uuid:{doc:032x}>\r\n"
                    f"WARC-Date: 2026-08-16T00:00:00Z\r\n"
                    f"WARC-Target-URI: http://ex.com/p/{url_id}\r\n"
                    f"Content-Type: application/http; msgtype=response\r\n"
                    f"Content-Length: {len(http)}\r\n\r\n"
                ).encode()
                + http
                + b"\r\n\r\n"
            )
            doc += 1
        with open(os.path.join(d, f"part-{f_idx:03d}.warc"), "wb") as fh:
            fh.write(b"".join(recs))
    return d


def ingest_only(spark, warc_dir: str, two_phase: bool):
    """The extraction-only composition (read_warc -> decode -> force):
    the common 'text out of a crawl' pass, where parse+decode ARE the
    pipeline and the decode share is material. sum(length(html))
    forces full decode without letting Catalyst prune the column."""
    from weather_monitoring_spark.operators.charset import with_sniffed_text
    from weather_monitoring_spark.sources.warc import read_warc

    records = read_warc(spark, warc_dir)
    pages = records.filter(
        (F.col("warc_type") == "response")
        & F.col("http_status").between(200, 299)
    )
    return with_sniffed_text(pages, "html", two_phase=two_phase).select(
        F.sum(F.length("html"))
    )


def composed_clean(spark, warc_dir: str, two_phase: bool):
    from weather_monitoring_spark.operators.charset import with_sniffed_text
    from weather_monitoring_spark.pipelines import curate_crawl
    from weather_monitoring_spark.sources.warc import read_warc

    records = read_warc(spark, warc_dir)
    pages = records.filter(
        (F.col("warc_type") == "response")
        & F.col("http_status").between(200, 299)
        & F.coalesce(F.lower("content_type").contains("html"), F.lit(True))
    )
    pages = with_sniffed_text(pages, "html", two_phase=two_phase)
    docs = pages.select(
        F.col("asset_id").alias("doc_id"),
        F.col("target_uri").alias("url"),
        F.col("html"),
    )
    return curate_crawl(docs).clean


def main():
    import subprocess

    from weather_monitoring_spark.session import get_spark

    spark = get_spark(
        master="local[8]",
        shuffle_partitions=16,
        extra_conf={
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_PROBE_MEM", "48g"
            )
        },
    )
    a = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "host_anchor.py")],
        capture_output=True, text=True, timeout=180,
    )
    anchor = json.loads(a.stdout.strip().splitlines()[-1]) if a.returncode == 0 else None
    out = {"n_pages": N_PAGES, "runs": RUNS, "anchor": anchor}
    for frac, label in ((0.60, "60%"), (0.95, "95%")):
        d = synth_warc_dir(frac, N_PAGES)
        try:
            raw_mb = sum(
                os.path.getsize(os.path.join(d, f)) for f in os.listdir(d)
            ) / 1e6
            # fidelity first (also warms codegen for both variants)
            two = {r.doc_id for r in composed_clean(spark, d, True).select("doc_id").collect()}
            one = {r.doc_id for r in composed_clean(spark, d, False).select("doc_id").collect()}
            fidelity = two == one
            t_two, t_one, i_two, i_one = [], [], [], []
            for _ in range(RUNS):  # interleaved
                t0 = time.perf_counter()
                ingest_only(spark, d, True).collect()
                i_two.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                ingest_only(spark, d, False).collect()
                i_one.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                composed_clean(spark, d, True).select(
                    F.count(F.lit(1))
                ).collect()
                t_two.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                composed_clean(spark, d, False).select(
                    F.count(F.lit(1))
                ).collect()
                t_one.append(time.perf_counter() - t0)
            out[label] = {
                "raw_mb": round(raw_mb, 1),
                "clean_docs": len(two),
                "ingest_two_phase_s": round(min(i_two), 3),
                "ingest_one_phase_s": round(min(i_one), 3),
                "ingest_speedup": round(min(i_one) / min(i_two), 3),
                "curation_two_phase_s": round(min(t_two), 3),
                "curation_one_phase_s": round(min(t_one), 3),
                "curation_speedup": round(min(t_one) / min(t_two), 3),
                "decode_share_of_curation": round(
                    min(i_two) / min(t_two), 4
                ),
                "fidelity_identical": fidelity,
            }
            print(label, out[label], flush=True)
        finally:
            shutil.rmtree(d, ignore_errors=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "probe_composed_charset_routing.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
