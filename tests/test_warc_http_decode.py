"""HTTP payload framing decode in the WARC parse path (r12 extension).

ISO 28500 stores a response record's block "as received over the
network": Common Crawl ships identity bodies, but wget --warc and
Heritrix captures preserve ``Transfer-Encoding: chunked`` framing and
``Content-Encoding`` compression inside the block (warcio's
``decode_content=`` exists for exactly this). Without undoing them, a
chunked page reaches the charset ladder with hex size lines spliced
into the text and a gzip'd page reads as binary garbage — silently
poisoned documents, not visibly failed ones.

Contract under test (all damage-local, never job-fatal):
- chunked framing is removed; trailers and extensions dropped;
- gzip / x-gzip / deflate (zlib-wrapped AND raw) content-codings
  inflate, multi-member streams concatenate, output bomb-capped;
- a LYING header (framing/bytes that do not decode) keeps raw bytes;
- an unknown coding (br / zstd / compress — no codec here) stops the
  decode walk with bytes as-is;
- mid-stream damage keeps the decoded prefix and invents nothing.
"""

from __future__ import annotations

import gzip
import zlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from weather_monitoring_spark.sources.warc import (
    _HTTP_INFLATE_CAP,
    _dechunk,
    _decode_http_payload,
    _inflate,
    _parse_warc,
)


def _chunked(body: bytes, sizes: list[int], ext: bool = False) -> bytes:
    """RFC 9112 chunked-encode ``body`` split at ``sizes`` (remainder in
    a final chunk), optional chunk extension on the first size line."""
    out = bytearray()
    pos = 0
    for s in list(sizes) + [len(body)]:
        part = body[pos : pos + max(s, 0)]
        pos += len(part)
        if not part:
            continue
        line = f"{len(part):x}".encode()
        if ext and not out:
            line += b";name=value"
        out += line + b"\r\n" + part + b"\r\n"
    out += b"0\r\n\r\n"
    return bytes(out)


def _http_record(
    uri: str, body: bytes, headers: dict[str, str], status: int = 200
) -> bytes:
    """WARC 1.0 response record with caller-controlled HTTP headers."""
    hdr_lines = "".join(f"{k}: {v}\r\n" for k, v in headers.items())
    http = f"HTTP/1.1 {status} OK\r\n{hdr_lines}\r\n".encode() + body
    return (
        (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:{abs(hash(uri)):032x}>\r\n"
            "WARC-Date: 2026-08-16T00:00:00Z\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode()
        + http
        + b"\r\n\r\n"
    )


BODY = "<html><body>café — chunked crawl page</body></html>".encode()


# ---------------------------- unit: dechunk ------------------------------


def test_dechunk_round_trip_with_extension_and_trailer_drop():
    assert _dechunk(_chunked(BODY, [5, 7, 11], ext=True)) == BODY
    # trailer fields after the 0 chunk are dropped, not appended
    enc = _chunked(BODY, [9]) [:-2] + b"X-Trailer: v\r\n\r\n"
    assert _dechunk(enc) == BODY


def test_dechunk_lying_header_returns_none():
    assert _dechunk(b"<html>not chunked at all</html>") is None
    assert _dechunk(b"") is None
    assert _dechunk(b"f" * 20 + b"\r\ndata") is None  # giant size token
    assert _dechunk(b"-5\r\nhello\r\n0\r\n\r\n") is None  # negative size


def test_dechunk_damage_keeps_decoded_prefix():
    assert _dechunk(b"5\r\nhello\r\nZZZZ junk not framing") == b"hello"
    # truncated mid-chunk: keep the bytes that arrived
    assert _dechunk(b"ff\r\nonly-a-few-bytes") == b"only-a-few-bytes"


# ---------------------------- unit: inflate ------------------------------


def test_inflate_gzip_deflate_both_window_forms():
    assert _inflate(gzip.compress(BODY), "gzip") == BODY
    assert _inflate(gzip.compress(BODY), "x-gzip") == BODY
    co = zlib.compressobj(wbits=15)
    assert _inflate(co.compress(BODY) + co.flush(), "deflate") == BODY
    co = zlib.compressobj(wbits=-15)  # raw deflate, the noted server bug
    assert _inflate(co.compress(BODY) + co.flush(), "deflate") == BODY


def test_inflate_multi_member_and_damage():
    two = gzip.compress(b"aa") + gzip.compress(b"bb")
    assert _inflate(two, "gzip") == b"aabb"
    assert _inflate(gzip.compress(b"aa") + b"trailing junk", "gzip") == b"aa"
    assert _inflate(b"garbage bytes", "gzip") is None
    assert _inflate(b"", "gzip") is None


def test_inflate_bomb_capped():
    bomb = gzip.compress(b"\x00" * (_HTTP_INFLATE_CAP + (1 << 20)))
    out = _inflate(bomb, "gzip")
    assert out is not None and len(out) == _HTTP_INFLATE_CAP


# ----------------------- unit: coding composition ------------------------


def test_decode_order_content_then_transfer():
    # sender applies CE first then TE; decoder must undo TE first
    enc = _chunked(gzip.compress(BODY), [10, 20])
    assert _decode_http_payload(enc, "chunked", "gzip") == BODY


def test_unknown_coding_stops_walk_keeping_bytes():
    assert _decode_http_payload(b"zs-bytes", "", "zstd") == b"zs-bytes"
    # chunked outer is undone even when the inner coding is undecodable
    assert (
        _decode_http_payload(_chunked(b"zs-bytes", [4]), "chunked", "zstd")
        == b"zs-bytes"
    )
    assert _decode_http_payload(BODY, "", "identity") == BODY


def test_br_coding_fenced_on_optional_brotli():
    """'br' decodes when the optional brotli lib is importable; without
    it the walk stops with bytes as-is (this environment's fence)."""
    from weather_monitoring_spark.sources import warc as W

    if W.brotli is None:
        assert _decode_http_payload(b"br-bytes", "", "br") == b"br-bytes"
    else:
        enc = W.brotli.compress(BODY)
        assert _decode_http_payload(enc, "", "br") == BODY
        assert _decode_http_payload(b"not brotli", "", "br") == b"not brotli"


# --------------------------- parser integration --------------------------


def _parse_payloads(data: bytes) -> dict[str, bytes]:
    return {
        r["target_uri"]: bytes(r["payload"])
        for r in _parse_warc("mem://f.warc", data)
        if r["warc_type"] == "response"
    }


def test_parse_warc_decodes_capture_time_framing():
    gz = gzip.compress(BODY)
    recs = b"".join(
        [
            _http_record("http://id.example/", BODY, {"Content-Type": "text/html"}),
            _http_record(
                "http://chunked.example/",
                _chunked(BODY, [8, 3]),
                {"Content-Type": "text/html", "Transfer-Encoding": "chunked"},
            ),
            _http_record(
                "http://gzip.example/",
                gz,
                {"Content-Type": "text/html", "Content-Encoding": "gzip"},
            ),
            _http_record(
                "http://both.example/",
                _chunked(gz, [10]),
                {
                    "Content-Type": "text/html",
                    "Content-Encoding": "gzip",
                    "Transfer-Encoding": "chunked",
                },
            ),
            _http_record(
                "http://br.example/",
                b"opaque-brotli-bytes",
                {"Content-Type": "text/html", "Content-Encoding": "br"},
            ),
            _http_record(
                "http://liar.example/",
                BODY,
                {"Content-Type": "text/html", "Transfer-Encoding": "chunked"},
            ),
        ]
    )
    for on_disk in (recs, gzip.compress(recs)):  # plain AND gz member path
        by = _parse_payloads(on_disk)
        assert by["http://id.example/"] == BODY
        assert by["http://chunked.example/"] == BODY
        assert by["http://gzip.example/"] == BODY
        assert by["http://both.example/"] == BODY
        assert by["http://br.example/"] == b"opaque-brotli-bytes"
        assert by["http://liar.example/"] == BODY  # lying header: raw kept


def test_n_bytes_reflects_decoded_entity():
    rec = _http_record(
        "http://g.example/",
        gzip.compress(BODY),
        {"Content-Type": "text/html", "Content-Encoding": "gzip"},
    )
    rows = [r for r in _parse_warc("mem://g.warc", rec)]
    assert rows[0]["n_bytes"] == len(BODY)


def test_responses_only_skip_never_pays_decode():
    # a 404 chunked page is dropped by the parse-time keep predicate;
    # the yielded set is exactly the kept record, decoded
    recs = _http_record(
        "http://gone.example/",
        _chunked(b"not found", [4]),
        {"Content-Type": "text/html", "Transfer-Encoding": "chunked"},
        status=404,
    ) + _http_record(
        "http://keep.example/",
        _chunked(BODY, [6]),
        {"Content-Type": "text/html", "Transfer-Encoding": "chunked"},
    )
    rows = list(_parse_warc("mem://s.warc", recs, responses_only=True))
    assert [r["target_uri"] for r in rows] == ["http://keep.example/"]
    assert bytes(rows[0]["payload"]) == BODY


# ------------------------------ properties -------------------------------


@settings(max_examples=60, deadline=None, suppress_health_check=list(HealthCheck))
@given(payload=st.binary(max_size=2048))
def test_dechunk_total_over_arbitrary_bytes(payload: bytes):
    out = _dechunk(payload)
    assert out is None or len(out) <= len(payload)


@settings(max_examples=60, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    body=st.binary(min_size=1, max_size=4096),
    sizes=st.lists(st.integers(min_value=1, max_value=512), max_size=8),
    ext=st.booleans(),
)
def test_dechunk_round_trip_property(body: bytes, sizes, ext: bool):
    assert _dechunk(_chunked(body, sizes, ext=ext)) == body


@settings(max_examples=60, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    payload=st.binary(max_size=1024),
    te=st.sampled_from(["", "chunked", "gzip, chunked", "zstd"]),
    ce=st.sampled_from(["", "gzip", "deflate", "br", "zstd", "identity", "gzip, gzip"]),
)
def test_decode_http_payload_total(payload: bytes, te: str, ce: str):
    out = _decode_http_payload(payload, te, ce)
    assert isinstance(out, bytes)


# ------------------------- spark e2e composition -------------------------


def test_chunked_gzip_page_reaches_curation_as_text(tmp_path, spark):
    """read_warc -> warc_responses_to_documents on a capture-time-framed
    file: the chunked+gzip'd page and the identity page yield identical
    html text (framing is transport, not content)."""
    from weather_monitoring_spark.sources.warc import (
        read_warc,
        warc_responses_to_documents,
    )

    d = tmp_path / "crawl"
    d.mkdir()
    (d / "cap.warc.gz").write_bytes(
        gzip.compress(
            _http_record(
                "http://plain.example/",
                BODY,
                {"Content-Type": "text/html; charset=utf-8"},
            )
        )
        + gzip.compress(
            _http_record(
                "http://framed.example/",
                _chunked(gzip.compress(BODY), [7, 13]),
                {
                    "Content-Type": "text/html; charset=utf-8",
                    "Content-Encoding": "gzip",
                    "Transfer-Encoding": "chunked",
                },
            )
        )
    )
    docs = warc_responses_to_documents(read_warc(spark, str(d)))
    by = {r.url: r.html for r in docs.collect()}
    assert by["http://framed.example/"] == by["http://plain.example/"]
    assert "café" in by["http://framed.example/"]


def test_dechunk_rejects_python_only_hex_forms():
    """int(x, 16) accepts '0x' prefixes, '_' separators, and a leading
    sign — none are valid RFC 9112 chunk-size tokens. A non-chunked
    payload whose first line matches one must take the lying-header
    keep-raw path (None), not be misread as framing and mangled."""
    for tok in (b"0x10", b"+5", b"-0", b"1_0", b" 0X2 "):
        assert _dechunk(tok + b"\r\npayload bytes here\r\n") is None
    # strict-hex tokens still decode
    assert _dechunk(b"5\r\nhello\r\n0\r\n\r\n") == b"hello"
    assert _dechunk(b"A\r\n0123456789\r\n0\r\n\r\n") == b"0123456789"


def _raw_header_record(uri: str, body: bytes, raw_headers: str) -> bytes:
    """WARC response record whose HTTP header block is given verbatim —
    for shapes a dict cannot express (repeated header fields)."""
    http = f"HTTP/1.1 200 OK\r\n{raw_headers}\r\n".encode() + body
    return (
        (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:{abs(hash(uri)):032x}>\r\n"
            "WARC-Date: 2026-08-16T00:00:00Z\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode()
        + http
        + b"\r\n\r\n"
    )


def test_repeated_coding_header_fields_comma_join():
    """RFC 9110 §5.3: repeated fields == one comma-joined list. Last-wins
    dropped the first coding: 'Content-Encoding: gzip' twice decoded
    only ONE layer, leaving gzip bytes in the document."""
    double_gz = gzip.compress(gzip.compress(BODY))
    rec_ce = _raw_header_record(
        "http://double-gz.example/",
        double_gz,
        "Content-Type: text/html\r\n"
        "Content-Encoding: gzip\r\n"
        "Content-Encoding: gzip\r\n",
    )
    # transfer codings, applied gzip-then-chunked, on separate lines
    rec_te = _raw_header_record(
        "http://te-list.example/",
        _chunked(gzip.compress(BODY), [7, 13]),
        "Content-Type: text/html\r\n"
        "Transfer-Encoding: gzip\r\n"
        "Transfer-Encoding: chunked\r\n",
    )
    rows = _parse_payloads(rec_ce + rec_te)
    assert rows["http://double-gz.example/"] == BODY
    assert rows["http://te-list.example/"] == BODY


# ------------------------------ zstd fence -------------------------------


class _FakeZstdReader:
    """Scripted stand-in for zstandard's stream_reader: 'ZSOK' frames
    decode their tail, 'ZSBAD' frames yield their tail then raise
    (mid-stream damage), anything else raises at open (lying header)."""

    def __init__(self, raw: bytes) -> None:
        if raw.startswith(b"ZSOK"):
            self.data, self.fail_after = raw[4:], False
        elif raw.startswith(b"ZSBAD"):
            self.data, self.fail_after = raw[5:], True
        else:
            raise ValueError("zstd: unknown frame descriptor")
        self.pos = 0

    def read(self, n: int) -> bytes:
        if self.pos >= len(self.data):
            if self.fail_after:
                raise ValueError("zstd: data corruption detected")
            return b""
        chunk = self.data[self.pos : self.pos + n]
        self.pos += len(chunk)
        return chunk

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class _FakeZstdDctx:
    def stream_reader(self, fobj):
        return _FakeZstdReader(fobj.read())


class _FakeZstdModule:
    @staticmethod
    def ZstdDecompressor():
        return _FakeZstdDctx()


def test_zstd_coding_fenced_on_optional_lib(monkeypatch):
    """'zstd' (RFC 8878) mirrors the br fence: without the lib the walk
    stops with bytes as-is; with it (scripted stand-in — the real lib is
    absent in this container) the decode is incremental, bomb-capped,
    keeps a damaged stream's decoded prefix, and keeps raw bytes for a
    lying header."""
    from weather_monitoring_spark.sources import warc as W

    if W.zstandard is None:  # this environment: fence leg
        assert _decode_http_payload(b"zs-bytes", "", "zstd") == b"zs-bytes"

    monkeypatch.setattr(W, "zstandard", _FakeZstdModule)
    assert _decode_http_payload(b"ZSOK" + BODY, "", "zstd") == BODY
    # lying header: raw kept
    assert _decode_http_payload(b"not zstd", "", "zstd") == b"not zstd"
    # mid-stream damage: decoded prefix kept, nothing invented
    assert _decode_http_payload(b"ZSBAD" + BODY, "", "zstd") == BODY
    # bomb cap: output truncated at _HTTP_INFLATE_CAP
    big = b"ZSOK" + b"x" * (_HTTP_INFLATE_CAP + 1024)
    assert len(_decode_http_payload(big, "", "zstd")) == _HTTP_INFLATE_CAP
    # composes with the other codings: zstd under chunked framing
    enc = _chunked(b"ZSOK" + BODY, [9])
    assert _decode_http_payload(enc, "chunked", "zstd") == BODY
