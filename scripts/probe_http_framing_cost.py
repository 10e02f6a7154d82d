#!/usr/bin/env python
"""Price the r12 capture-time HTTP framing decode at a realistic shape.

Three on-wire variants of the SAME ~24 KB-html corpus are parsed with
`_parse_warc` (driver-side, single thread — the honest per-core price;
the Spark path adds only distribution):

  identity       — CC's shape: headers carry no TE/CE, the decode walk
                   never runs (two header-name compares per response)
  chunked        — wget --warc shape: every body chunked at 4 KB
  chunked+gzip   — worst case: gzip content-coding inside chunked

Interleaved best-of-N walls + MB/s (raw-entity bytes), plus a
correctness guard: all three variants must yield byte-identical
entity payloads. Prints one JSON line.

Usage: python scripts/probe_http_framing_cost.py [n_records]
"""

from __future__ import annotations

import gzip
import hashlib
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from weather_monitoring_spark.sources.warc import _parse_warc  # noqa: E402

RUNS = 4
CHUNK = 4096


def _page(i: int, rng: random.Random) -> bytes:
    words = " ".join(f"w{rng.randrange(5000)}" for _ in range(3500))
    return (
        f"<html><head><title>page {i}</title></head><body><p>{words}"
        "</p></body></html>"
    ).encode()


def _chunked(body: bytes) -> bytes:
    out = bytearray()
    for lo in range(0, len(body), CHUNK):
        part = body[lo : lo + CHUNK]
        out += f"{len(part):x}".encode() + b"\r\n" + part + b"\r\n"
    out += b"0\r\n\r\n"
    return bytes(out)


def _record(i: int, body: bytes, hdrs: dict[str, str]) -> bytes:
    hdr_lines = "".join(f"{k}: {v}\r\n" for k, v in hdrs.items())
    http = f"HTTP/1.1 200 OK\r\n{hdr_lines}\r\n".encode() + body
    return (
        (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:{i:032x}>\r\n"
            "WARC-Date: 2026-08-16T00:00:00Z\r\n"
            f"WARC-Target-URI: http://probe.example/{i}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode()
        + http
        + b"\r\n\r\n"
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    rng = random.Random(12)
    pages = [_page(i, rng) for i in range(n)]
    raw_mb = sum(map(len, pages)) / 1e6

    ct = {"Content-Type": "text/html; charset=utf-8"}
    variants = {
        "identity": b"".join(
            _record(i, p, ct) for i, p in enumerate(pages)
        ),
        "chunked": b"".join(
            _record(i, _chunked(p), {**ct, "Transfer-Encoding": "chunked"})
            for i, p in enumerate(pages)
        ),
        "chunked_gzip": b"".join(
            _record(
                i,
                _chunked(gzip.compress(p, compresslevel=6)),
                {
                    **ct,
                    "Content-Encoding": "gzip",
                    "Transfer-Encoding": "chunked",
                },
            )
            for i, p in enumerate(pages)
        ),
    }

    # correctness guard: identical entity payloads from every variant
    digests = {}
    for name, blob in variants.items():
        h = hashlib.md5()
        for r in _parse_warc(f"mem://{name}", blob):
            h.update(r["payload"])
        digests[name] = h.hexdigest()
    assert len(set(digests.values())) == 1, digests

    walls: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(RUNS):  # interleaved: same host window for all
        for name, blob in variants.items():
            t0 = time.monotonic()
            cnt = sum(1 for _ in _parse_warc(f"mem://{name}", blob))
            walls[name].append(time.monotonic() - t0)
            assert cnt == n
    best = {k: min(v) for k, v in walls.items()}
    out = {
        "n_records": n,
        "raw_entity_mb": round(raw_mb, 1),
        "on_wire_mb": {
            k: round(len(b) / 1e6, 1) for k, b in variants.items()
        },
        "best_wall_s": {k: round(v, 3) for k, v in best.items()},
        "entity_mb_per_s": {
            k: round(raw_mb / v, 1) for k, v in best.items()
        },
        "overhead_vs_identity": {
            k: round(best[k] / best["identity"], 2) for k in best
        },
        "payloads_byte_identical": True,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
