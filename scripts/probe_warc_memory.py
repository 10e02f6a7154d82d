#!/usr/bin/env python
"""Peak-memory probe for the WARC parser's task-memory shape (the r9
verdict's only `weak` component, What's-wrong #1).

The hazard: a Common Crawl shard is ~1 GB gzipped / 3-5 GB raw, and
Spark bin-packs several small-enough files into one binaryFile task —
so a parse that accumulates every record of every file in the batch in
one Python list peaks at sum(compressed + decompressed + pandas copy)
over the WHOLE batch. The fix (sources/warc.py::_make_parse_batches)
yields one DataFrame per FILE (chunked at WARC_YIELD_RECORDS within a
file), so peak is ONE file's working set no matter how many files the
task packed; `responses_only=True` additionally drops non-kept records'
payload bytes inside the parse.

Method: the memory shape is a pure-Python property of the parse
generator, so the probe measures it directly — build N plain-WARC files
of M MB payload each (html responses + an equal-size png response that
responses_only drops), feed them to the generator as ONE pandas batch
(exactly what one mapInPandas task sees), consume the yields one at a
time, and read peak RSS from /proc/self/status VmHWM. Each variant runs
in a fresh subprocess so the high-water mark is its own. A legacy
"accumulate the whole batch in one list" twin quantifies what the r9
shape would have peaked at.

Prints one JSON line per variant:
  {"variant": ..., "files": N, "payload_mb_per_file": M,
   "yields": k, "records": r, "peak_rss_mb": ...}

Usage: python scripts/probe_warc_memory.py [n_files] [mb_per_file]
(defaults 3 x 256 MB — multi-file batch with >=256 MB members, the
verdict's prescribed probe point).
"""

from __future__ import annotations

import json
import subprocess
import sys

WORKER = r"""
import json, sys
import pandas as pd

variant, n_files, mb = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

def record(uri, body, ctype):
    http = (
        "HTTP/1.1 200 OK\r\nContent-Type: %s\r\n"
        "Content-Length: %d\r\n\r\n" % (ctype, len(body))
    ).encode() + body
    hdr = (
        "WARC/1.0\r\nWARC-Type: response\r\n"
        "WARC-Record-ID: <urn:uuid:0>\r\n"
        "WARC-Date: 2026-08-15T00:00:00Z\r\n"
        "WARC-Target-URI: %s\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        "Content-Length: %d\r\n\r\n" % (uri, len(http))
    ).encode()
    return hdr + http + b"\r\n\r\n"

# one file = M MB of kept html + M MB of dropped png, in 4 MB records
chunk = 4 * 1024 * 1024
per_side = max(1, mb // 4)
gz = variant.startswith("gz_")
def build_file(i):
    import gzip
    parts = []
    for j in range(per_side):
        parts.append(record("http://h/%d/%d" % (i, j),
                            b"<html>" + b"x" * chunk + b"</html>",
                            "text/html"))
        parts.append(record("http://p/%d/%d" % (i, j),
                            b"\x89PNG" + b"y" * chunk, "image/png"))
    if gz:
        # per-record gzip members, exactly the CC layout
        return b"".join(gzip.compress(p, compresslevel=1) for p in parts)
    return b"".join(parts)

batch = pd.DataFrame({
    "path": ["f%d" % i for i in range(n_files)],
    "content": [build_file(i) for i in range(n_files)],
})
input_mb = sum(len(c) for c in batch["content"]) / 1e6

# reset the RSS high-water mark so the probe measures the PARSE phase,
# not the synthetic batch construction (kernel: "5" -> clear_refs)
open("/proc/self/clear_refs", "w").write("5")

from weather_monitoring_spark.sources import warc as W

yields = records = 0
if variant == "legacy_accumulate":
    # the r9 shape: every record of every file in one list, one frame
    cols = [f.split(" ")[0] for f in W.WARC_SCHEMA.split(", ")]
    rows = [rec for p, c in zip(batch["path"], batch["content"])
            for rec in W._parse_warc(p, bytes(c))]
    frames = [pd.DataFrame(rows, columns=cols)]
    del rows
elif variant == "gz_eager_gunzip":
    # the pre-incremental gz shape: whole-file decompression before the
    # parse (compressed + full raw image resident simultaneously),
    # per-file yields otherwise identical to the shipped path
    cols = [f.split(" ")[0] for f in W.WARC_SCHEMA.split(", ")]
    def eager():
        for p, c in zip(batch["path"], batch["content"]):
            raw = W._gunzip_members(bytes(c))
            yield pd.DataFrame(list(W._parse_warc(p, raw)), columns=cols)
    frames = eager()
else:  # per_file / per_file_responses_only / gz_incremental
    frames = W._make_parse_batches(variant == "per_file_responses_only")(
        [batch]
    )
for f in frames:
    yields += 1
    records += len(f)
    del f  # consume like Arrow serialization does: one frame at a time

hwm_kb = 0
for line in open("/proc/self/status"):
    if line.startswith("VmHWM:"):
        hwm_kb = int(line.split()[1])
print(json.dumps({
    "variant": variant, "files": n_files, "payload_mb_per_file": mb * 2,
    "input_mb": round(input_mb, 1), "yields": yields, "records": records,
    "peak_rss_mb": round(hwm_kb / 1024.0, 1),
}))
"""


def main() -> None:
    import os

    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    mb = int(sys.argv[2]) if len(sys.argv) > 2 else 128  # per side; x2 total
    # the -c worker has no __file__ to derive the repo root from — hand
    # it the import path explicitly so the probe runs from any cwd
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ}
    env["PYTHONPATH"] = repo + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
    )
    for variant in (
        "legacy_accumulate",
        "per_file",
        "per_file_responses_only",
        "gz_eager_gunzip",
        "gz_incremental",
    ):
        out = subprocess.run(
            [sys.executable, "-c", WORKER, variant, str(n_files), str(mb)],
            capture_output=True,
            text=True,
            check=True,
            env=env,
        )
        print(out.stdout.strip())


if __name__ == "__main__":
    main()
