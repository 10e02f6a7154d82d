#!/usr/bin/env python
"""Full-scale WARC probe at the real Common Crawl shard shape (r10
verdict #4): ~3 GB raw / ~1 GB gz of ~128 KB html response records —
the shape ``sources/warc.py``'s docstring promises to bound — in the
three on-disk forms a crawl actually ships:

- ``cc_members``: per-record gzip members (the CC layout);
- ``cc_single_member``: the SAME raw stream as ONE gzip member (the
  degenerate form the r10 chunk-streamed decompressor exists for);
- ``cc_plain``: uncompressed (exercises the r11 sliced plain path —
  peak must be input + largest record, not 2x input).

Method (the probe_warc_memory.py discipline): the memory shape is a
pure-Python property of the parse generator, so each variant runs in a
fresh subprocess, builds the synthetic shard, resets the RSS high-water
mark (clear_refs), parses through ``_make_parse_batches`` consuming one
yielded frame at a time, and reads VmHWM. Record bodies are random-word
text (~2.5-3x gzip ratio, the html norm) so compressed sizes are
honest. Two timed passes: the second ("warm") is the steady-state
throughput number.

Prints one JSON line per variant:
  {"variant", "records", "raw_mb", "input_mb", "rss_before_mb",
   "peak_rss_mb", "parse_overhead_mb", "cold_s", "warm_s",
   "warm_rec_s", "warm_raw_mb_s"}

Usage: python scripts/probe_warc_fullscale.py [raw_gb]   (default 3.0)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r"""
import json, sys, time, zlib
import numpy as np
import pandas as pd

variant, raw_gb = sys.argv[1], float(sys.argv[2])

# ~1.2 MB block of random-word text: per-record slices compress at the
# html-typical ~2.5-3x, unlike b"x"*N (1000x) or urandom (1x)
rng = np.random.default_rng(42)
vocab = np.array(
    "the of and to in a is that for it as was with be by on not he i this "
    "are or his from at which but have an they you were her all she there "
    "would their we him been has when who will more no if out so said what "
    "up its about into than them can only other new some could time these "
    "two may then do first any my now such like our over man me even most "
    "made after also did many before must through back years where much "
    "your way well down should because each just those people how too "
    "little state good very make world still own see men work long get "
    "here between both life being under never day same another know while "
    "last might us great old year off come since against go came right "
    "used take three states himself few house use during without again "
    "place american around however home small found mrs thought went say "
    "part once general high upon school every don't does got united left "
    "number course war until always away something fact though water less "
    "public put thing almost hand enough far took head yet government "
    "system better set told nothing night end why called didn't eyes find "
    "going look asked later knew point next city business".split()
)
block = (" ".join(rng.choice(vocab, 200_000))).encode()

BODY = 128 * 1024  # ~the CC mean page size
def record(i):
    # unique prefix + rotating block slice: every record differs
    off = (i * 7919) % (len(block) - BODY)
    body = (b"<html><p>doc %d</p>" % i) + block[off : off + BODY] + b"</html>"
    http = (
        "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        "Content-Length: %d\r\n\r\n" % len(body)
    ).encode() + body
    hdr = (
        "WARC/1.0\r\nWARC-Type: response\r\n"
        "WARC-Record-ID: <urn:uuid:%d>\r\n"
        "WARC-Date: 2026-08-15T00:00:00Z\r\n"
        "WARC-Target-URI: http://h/%d\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        "Content-Length: %d\r\n\r\n" % (i, i, len(http))
    ).encode()
    return hdr + http + b"\r\n\r\n"

n_rec = int(raw_gb * (1 << 30)) // (BODY + 512)
parts = [record(i) for i in range(n_rec)]
raw_mb = sum(len(p) for p in parts) / 1e6

if variant == "cc_members":
    import gzip
    content = b"".join(gzip.compress(p, compresslevel=1) for p in parts)
elif variant == "cc_single_member":
    co = zlib.compressobj(1, zlib.DEFLATED, 31)
    content = b"".join([co.compress(p) for p in parts] + [co.flush()])
elif variant == "cc_plain":
    content = b"".join(parts)
else:
    raise SystemExit("unknown variant " + variant)
del parts
input_mb = len(content) / 1e6

batch = pd.DataFrame({"path": ["shard0"], "content": [content]})
del content

from weather_monitoring_spark.sources import warc as W

def one_pass():
    t0 = time.monotonic()
    records = 0
    for f in W._make_parse_batches(False)([batch]):
        records += len(f)
        del f
    return records, time.monotonic() - t0

# return freed build-phase arena pages to the OS so rss_before is the
# clean resident-input baseline (retained allocator pages otherwise
# make the parse-overhead numbers incomparable across variants), then
# reset the high-water mark so the probe measures the PARSE phase
import ctypes
ctypes.CDLL("libc.so.6").malloc_trim(0)
open("/proc/self/clear_refs", "w").write("5")
rss_before = 0
for line in open("/proc/self/status"):
    if line.startswith("VmRSS:"):
        rss_before = int(line.split()[1])

records, cold_s = one_pass()
_, warm_s = one_pass()

hwm_kb = 0
for line in open("/proc/self/status"):
    if line.startswith("VmHWM:"):
        hwm_kb = int(line.split()[1])
print(json.dumps({
    "variant": variant, "records": records,
    "raw_mb": round(raw_mb, 1), "input_mb": round(input_mb, 1),
    "rss_before_mb": round(rss_before / 1024.0, 1),
    "peak_rss_mb": round(hwm_kb / 1024.0, 1),
    "parse_overhead_mb": round((hwm_kb - rss_before) / 1024.0, 1),
    "cold_s": round(cold_s, 2), "warm_s": round(warm_s, 2),
    "warm_rec_s": round(records / warm_s),
    "warm_raw_mb_s": round(raw_mb / warm_s, 1),
}))
"""


def main() -> None:
    raw_gb = float(sys.argv[1]) if len(sys.argv) > 1 else 3.0
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ}
    env["PYTHONPATH"] = repo + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
    )
    for variant in ("cc_members", "cc_single_member", "cc_plain"):
        out = subprocess.run(
            [sys.executable, "-c", WORKER, variant, str(raw_gb)],
            capture_output=True,
            text=True,
            check=True,
            env=env,
        )
        print(out.stdout.strip())


if __name__ == "__main__":
    main()
