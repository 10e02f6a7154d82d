"""Differential law for the WARC boundary splitter (r15): parsing the
chunks of ``_split_warc_stream`` with their base offsets must yield
records BYTE-IDENTICAL to the whole-file parse — asset ids, offsets,
payloads, everything — for every chunk target, on-disk encoding
(plain / per-record gzip / single gzip member), damage class
(inter-record junk, truncation), and through the full Spark readers.
The splitter exists purely to parallelize; any observable difference
is a bug."""

from __future__ import annotations

import gzip
import hashlib
import os
import zlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.test_pipeline_paths import _warc_record
from weather_monitoring_spark.sources import warc as W


def _rows(it):
    return [
        (
            r["asset_id"], r["record_offset"], r["warc_type"],
            r["target_uri"], r["http_status"], r["content_type"],
            r["n_bytes"], hashlib.md5(r["payload"]).hexdigest(),
        )
        for r in it
    ]


def _split_parse_rows(blob: bytes, target: int):
    out = []
    chunks = list(W._split_warc_stream(blob, target))
    for off, chunk in chunks:
        out.extend(_rows(W._parse_warc("p", chunk, base_offset=off)))
    return out, chunks


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(data=st.data())
def test_split_parse_equals_whole_parse(data):
    n = data.draw(st.integers(min_value=1, max_value=6))
    parts = []
    for i in range(n):
        wtype = data.draw(
            st.sampled_from(["response", "request", "warcinfo", "conversion"])
        )
        body = data.draw(st.binary(min_size=0, max_size=400))
        status = data.draw(st.sampled_from([200, 204, 301, 404, 500]))
        ctype = data.draw(st.sampled_from(["text/html", "text/plain", None]))
        parts.append(
            _warc_record(
                f"http://h/{i}", body, warc_type=wtype, status=status,
                ctype=ctype,
            )
        )
        junk = data.draw(
            st.binary(min_size=0, max_size=24).filter(
                lambda b: b"WARC/" not in b
            )
        )
        parts.append(junk)
    blob = b"".join(parts)
    target = data.draw(st.sampled_from([1, 64, 300, 1 << 20]))

    whole = _rows(W._parse_warc("p", blob))
    got, chunks = _split_parse_rows(blob, target)
    assert got == whole, (target, len(chunks))
    # chunk concatenation reproduces the stream byte-for-byte, and each
    # base_offset is the running length of everything before it
    assert b"".join(c for _, c in chunks) == blob
    running = 0
    for off, c in chunks:
        assert off == running
        running += len(c)

    # same law on both gzip encodings (offsets are decompressed-stream
    # coordinates, so the expected rows are the PLAIN ones)
    per_member = b"".join(
        gzip.compress(p, compresslevel=1) for p in parts if p
    )
    co = zlib.compressobj(1, zlib.DEFLATED, 31)
    single = co.compress(blob) + co.flush()
    for enc in (per_member, single):
        got_enc, _ = _split_parse_rows(enc, target)
        assert got_enc == whole

    # truncation anywhere: split parse == whole parse of the SAME
    # damaged bytes (prefix-of-records, never a raise)
    if len(blob) > 2:
        cut = data.draw(st.integers(min_value=1, max_value=len(blob) - 1))
        damaged = blob[:cut]
        got_dmg, _ = _split_parse_rows(damaged, target)
        assert got_dmg == _rows(W._parse_warc("p", damaged))


def test_read_warc_chunked_equals_default(spark, tmp_path):
    """Full Spark path: read_warc(chunk_bytes=...) returns the same
    rows as the default per-file parse — and the streaming reader's
    split path feeds warc_responses_to_documents identically."""
    recs = [
        _warc_record(f"http://ex.example/p{i}",
                     f"<html><body>page {i} body</body></html>".encode())
        for i in range(20)
    ]
    for fname, blob in (
        ("a.warc", b"".join(recs[:12])),
        ("b.warc.gz", b"".join(gzip.compress(r, 1) for r in recs[12:])),
    ):
        with open(os.path.join(tmp_path, fname), "wb") as f:
            f.write(blob)

    def key(df):
        return sorted(
            (r.asset_id, r.record_offset, r.target_uri, r.n_bytes)
            for r in df.collect()
        )

    base = key(W.read_warc(spark, str(tmp_path)))
    assert key(W.read_warc(spark, str(tmp_path), chunk_bytes=256)) == base
    assert len(base) == 20

    # streaming reader, one availableNow pass through the split path
    docs = W.warc_responses_to_documents(
        W.read_warc_stream(
            spark, str(tmp_path), max_files_per_trigger=1, chunk_bytes=256
        )
    )
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        docs.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(r.doc_id for r in spark.read.parquet(out_dir).collect())
    want = sorted(
        r.doc_id
        for r in W.warc_responses_to_documents(
            W.read_warc(spark, str(tmp_path))
        ).collect()
    )
    assert got == want and len(got) == 20
