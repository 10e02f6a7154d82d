"""WARC source — Common Crawl's wire format, the de-facto input of every
large-scale crawl-curation pipeline (ISO 28500; the public
crawl-data/CC-MAIN-*/warc/*.warc.gz layout).

Spark-first shape: the built-in ``binaryFile`` scan lists and reads whole
WARC files distributed across executors (one row per file — WARC members
are not line-splittable, and per-record gzip members make the .gz files
unsplittable too), then ONE ``mapInPandas`` pass parses records out of
each file's bytes. The parallelism unit is the FILE, exactly how Common
Crawl ships (segments of ~1 GB files, tens of thousands per crawl), so a
1000-executor cluster saturates on file count; ``pathGlobFilter`` prunes
non-WARC paths during listing. Task memory: gzipped input parses
INCREMENTALLY (bounded decompressed chunks through a sliding buffer,
one yielded frame per file chunked at WARC_YIELD_RECORDS) and plain
input feeds the same buffer in bounded slices, so the working set is
the resident file + the largest in-flight record + one row chunk —
never the 3-5 GB decompressed image of a CC shard (capture-time HTTP
framing — chunked transfer, gzip/deflate content-codings — is undone
per record, adding at most the _HTTP_INFLATE_CAP-bounded entity)
(scripts/probe_warc_memory.py quantifies each shape;
scripts/probe_warc_fullscale.py proves the bound at the real ~1 GB gz
/ 3 GB raw shard shape, all three on-disk forms).

Record ids are content-addressed digests of (path, byte offset) — stable
across re-listing, repartitioning, and incremental crawls (the
sources/binary.py discipline).

Reference parity: the reference ingests JSON wire messages only; WARC
extends the engine per the builder brief's crawl-pipeline scope
(the ``pipelines.curate_crawl`` front door consumes the output of
``warc_responses_to_documents``).
"""

from __future__ import annotations

import hashlib
import io
import re
import zlib
from typing import Iterable, Iterator

try:  # optional: the 'br' HTTP content-coding (RFC 7932). Absent in
    import brotli  # this environment — the decode walk then stops at
except ImportError:  # 'br' with bytes kept raw (the documented fence).
    brotli = None

try:  # optional: the 'zstd' HTTP content-coding (RFC 8878) — the other
    import zstandard  # coding real crawls carry. Same fence shape as br:
except ImportError:  # absent lib stops the walk with bytes kept raw.
    zstandard = None

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_monitoring_spark.sources.filestream import MAX_FILES_PER_TRIGGER

WARC_SCHEMA = (
    "asset_id bigint, source string, record_offset bigint, warc_type string, "
    "record_id string, target_uri string, warc_date string, http_status int, "
    "content_type string, payload binary, n_bytes bigint"
)

_GZIP_MAGIC = b"\x1f\x8b"


def _resync_gzip(data: bytes, member_start: int) -> int:
    """Recovery cursor after a corrupt gzip member: the next plausible
    member header (magic + the deflate CM byte, \\x1f\\x8b\\x08 — every
    gzip in the wild) strictly past the damaged member's own header. A
    false positive inside compressed bytes just fails fast with another
    zlib.error and resyncs again, strictly forward, so recovery is
    bounded by one scan of the file. Returns -1 when no candidate
    remains (drop the tail, stop)."""
    return data.find(_GZIP_MAGIC + b"\x08", member_start + 2)


def _iter_gzip_members(data: bytes) -> Iterator[bytes]:
    """Decompress gzip members ONE AT A TIME (Common Crawl gzips each
    WARC record as its own member so readers can seek; a plain
    one-member file is the degenerate case). Two memory properties the
    parse loop depends on:

    - the compressed input is fed in ramping memoryview slices (8 KB
      doubling to 1 MB per member), so a member's decompression never
      holds more than (one member's output + 1 MB) beyond the caller's
      input — NOT compressed + fully-decompressed simultaneously;
    - member boundaries are handled by REWINDING the cursor by
      ``len(unused_data)`` — no compressed bytes carry between members,
      and the per-member overshoot copy is bounded by ~the member's own
      size, keeping total copy cost O(file) even for tiny per-record
      members (a naive ``data = d.unused_data`` loop is O(n * members)
      byte copies; a fixed-large-chunk carry chain is O(chunk) per
      member).

    A truncated final member yields what decoded, then stops; a CORRUPT
    member (bad deflate data or a failed CRC — zlib.error) yields what
    decoded and RESYNCS at the next gzip magic, so one damaged member
    costs its own records, never the file or the job (the crawl-damage
    tolerance contract; r11 — the same never-raise class as the decode
    hardening)."""
    mv = memoryview(data)
    n = len(data)
    pos = 0
    while pos + 2 <= n and bytes(mv[pos : pos + 2]) == _GZIP_MAGIC:
        member_start = pos
        d = zlib.decompressobj(wbits=31)
        out = []
        # feed sizes ramp 8 KB -> 1 MB within a member: the per-member
        # overshoot copy (zlib materializes unused_data of the LAST fed
        # slice) is bounded by ~the member's own size, so total copy
        # cost is O(file), not O(chunk x members). On eof the cursor
        # REWINDS by len(unused_data) to the exact member boundary —
        # no compressed carry-over between members at all.
        chunk = 1 << 13
        try:
            while True:
                if pos >= n:
                    if out:  # truncated member: keep what decoded, stop
                        yield b"".join(out)
                    return
                feed = mv[pos : pos + chunk]
                pos += len(feed)
                out.append(d.decompress(feed))
                if d.eof:
                    pos -= len(d.unused_data)
                    yield b"".join(out)
                    break
                chunk = min(chunk << 1, 1 << 20)
        except zlib.error:
            if out:  # keep the prefix that decoded before the damage
                yield b"".join(out)
            pos = _resync_gzip(data, member_start)
            if pos < 0:
                return


#: Output-size cap per decompressed chunk (compression-bomb guard: a
#: 1 MB compressed slice of zeros inflates ~1000x; max_length bounds
#: each yield at 8 MB and the remainder re-feeds via unconsumed_tail).
_GUNZIP_MAX_OUT = 1 << 23


def _iter_gzip_chunks(data: bytes) -> Iterator[bytes]:
    """Like ``_iter_gzip_members`` but yields BOUNDED decompressed
    chunks (<= _GUNZIP_MAX_OUT each) instead of whole members: the
    degenerate single-member multi-record file — and a compression-bomb
    member — stream through in pieces, so the parse buffer is bounded
    by the largest RECORD, never the largest member. Cursor accounting:
    ``unconsumed_tail`` (input withheld by the output cap) and
    ``unused_data`` (input past the member end) are both contiguous
    suffixes of the bytes fed so far, so ``pos -= len(unused_data)`` on
    eof lands exactly on the next member boundary even when the last
    feed came from the tail. Corrupt members (zlib.error) resync at the
    next gzip magic like ``_iter_gzip_members`` — already-yielded
    chunks stand (the parser junk-skips any garbage), one damaged
    member never costs the file or the job."""
    mv = memoryview(data)
    n = len(data)
    pos = 0
    while pos + 2 <= n and bytes(mv[pos : pos + 2]) == _GZIP_MAGIC:
        member_start = pos
        d = zlib.decompressobj(wbits=31)
        chunk = 1 << 13
        tail = b""
        try:
            while True:
                if tail:
                    out = d.decompress(tail, _GUNZIP_MAX_OUT)
                    tail = d.unconsumed_tail
                elif pos < n:
                    feed = mv[pos : pos + chunk]
                    pos += len(feed)
                    out = d.decompress(feed, _GUNZIP_MAX_OUT)
                    tail = d.unconsumed_tail
                    chunk = min(chunk << 1, 1 << 20)
                else:
                    return  # truncated member: whatever decoded was yielded
                if out:
                    yield out
                if d.eof:
                    pos -= len(d.unused_data)
                    break
        except zlib.error:
            pos = _resync_gzip(data, member_start)
            if pos < 0:
                return


def _gunzip_members(data: bytes) -> bytes:
    """All members joined — the eager convenience form (the parse loop
    itself consumes the bounded-chunk iterator so neither a file's nor
    even one member's full decompressed image ever materializes)."""
    return b"".join(_iter_gzip_members(data))


def _iter_plain_chunks(data: bytes) -> Iterator[memoryview]:
    """Bounded slices of an UNCOMPRESSED file (<= _GUNZIP_MAX_OUT each):
    feeding the parse buffer in pieces lets compaction trim the consumed
    prefix as the cursor advances, so peak task memory is the resident
    input + the largest in-flight record — NOT input + a full second
    copy in the buffer (the r10 shape was one buf.extend of the whole
    file, ~2x file peak; the docstring claimed in-place walking).
    memoryview slices: zero-copy until buf.extend consumes them."""
    mv = memoryview(data)
    for lo in range(0, len(data), _GUNZIP_MAX_OUT):
        yield mv[lo : lo + _GUNZIP_MAX_OUT]


#: Decompressed-bytes cap for ONE HTTP payload's content-coding. A page
#: that inflates past 64 MiB is a compression bomb, not a document — the
#: decoded prefix is kept and the tail dropped (damage stays local).
_HTTP_INFLATE_CAP = 1 << 26


def _dechunk(payload: bytes) -> bytes | None:
    """RFC 9112 §7.1 chunked transfer decoding, damage-tolerant: hex
    size line (chunk extensions after ``;`` ignored, size token bounded
    at 16 hex digits — the giant-digit-run class), chunk data, CRLF;
    a ``0`` chunk ends the body (trailer fields dropped). Returns None
    when the FIRST size line is not chunked framing (a lying
    Transfer-Encoding header — keep the raw bytes); damage after at
    least one good chunk keeps everything decoded so far and invents
    nothing. A record truncated mid-chunk keeps the bytes that arrived,
    matching the parser's truncated-record contract."""
    out = bytearray()
    pos = 0
    first = True
    n = len(payload)
    while pos < n:
        eol = payload.find(b"\r\n", pos, pos + 1026)
        if eol < 0:
            break
        size_tok = payload[pos:eol].split(b";", 1)[0].strip()
        # strict RFC 9112 chunk-size token: 1*HEXDIG only. Python's
        # int(x, 16) additionally accepts "0x" prefixes, "_" digit
        # separators, and a leading sign — non-chunked payloads whose
        # first line happens to match those forms must hit the
        # lying-header keep-raw path, not be misread as framing.
        if (
            not size_tok
            or len(size_tok) > 16
            or size_tok.translate(None, b"0123456789abcdefABCDEF")
        ):
            break
        size = int(size_tok, 16)
        first = False
        if size == 0:
            break  # terminal chunk; trailers (if any) are dropped
        data_start = eol + 2
        out += payload[data_start : data_start + size]
        # skip the chunk-data CRLF; if it is missing (framing damage)
        # the next size-line parse fails and we keep the decoded prefix
        pos = data_start + size + 2
    return None if first else bytes(out)


def _inflate(payload: bytes, coding: str) -> bytes | None:
    """gzip / x-gzip / deflate HTTP content-codings via zlib. Deflate in
    the wild is both zlib-wrapped and raw (RFC 9110 §8.4.1.2's noted
    server bug), so both window forms are tried. Multi-member gzip
    streams concatenate; output is capped at _HTTP_INFLATE_CAP. Returns
    None when the bytes do not decode under the coding at all (a lying
    header — keep the raw bytes); a stream damaged after one good
    member keeps the decoded prefix."""
    attempts = (15, -15) if coding == "deflate" else (47,)
    for wbits in attempts:
        out = bytearray()
        data = payload
        ok = False
        while data and len(out) < _HTTP_INFLATE_CAP:
            d = zlib.decompressobj(wbits=wbits)
            try:
                out += d.decompress(data, _HTTP_INFLATE_CAP - len(out))
            except zlib.error:
                break
            ok = True
            if not d.eof:
                break  # truncated or capped: keep the decoded prefix
            data = d.unused_data
        if ok:
            return bytes(out)
    return None


def _decode_http_payload(payload: bytes, te: str, ce: str) -> bytes:
    """Undo the HTTP message framing a capture-time WARC preserves. ISO
    28500 stores a response record's block "as received over the
    network" — Common Crawl ships identity bodies, but wget --warc and
    Heritrix captures keep ``Transfer-Encoding: chunked`` framing and
    ``Content-Encoding`` compression in the block (the reason warcio
    grew ``decode_content=``). Without this step a chunked page reaches
    the charset ladder with hex size lines spliced into the text and a
    gzip'd page reads as binary garbage.

    Codings decode outermost-first: transfer codings (applied last, so
    undone first) in reverse list order, then content codings in
    reverse. ``identity`` is a no-op. ``br`` (RFC 7932) and ``zstd``
    (RFC 8878) decode when their optional libs are importable (both
    absent here — fence-tested both ways). An UNDECODABLE coding
    (``br``/``zstd`` without their libs, ``compress``)
    stops the walk with the bytes as-is: an un-undoable outer layer
    makes inner layers unreachable, and keeping raw bytes keeps damage
    local."""
    codings = [t.strip() for t in ce.split(",") if t.strip()] + [
        t.strip() for t in te.split(",") if t.strip()
    ]
    for coding in reversed(codings):
        if coding == "identity":
            continue
        if coding == "chunked":
            decoded = _dechunk(payload)
        elif coding in ("gzip", "x-gzip", "deflate"):
            decoded = _inflate(payload, coding)
        elif coding == "zstd" and zstandard is not None:
            # incremental stream read: bomb-capped at _HTTP_INFLATE_CAP
            # without a burst allocation, and a stream damaged after
            # some good output keeps the decoded prefix (the gzip
            # multi-member contract); bytes that never decode at all
            # are a lying header — raw kept
            out = bytearray()
            try:
                with zstandard.ZstdDecompressor().stream_reader(
                    io.BytesIO(payload)
                ) as r:
                    while len(out) < _HTTP_INFLATE_CAP:
                        chunk = r.read(1 << 16)
                        if not chunk:
                            break
                        out += chunk
                decoded = bytes(out[:_HTTP_INFLATE_CAP])
            except Exception:
                decoded = bytes(out[:_HTTP_INFLATE_CAP]) if out else None
        elif coding == "br" and brotli is not None:
            # one-shot (the google brotli API has no incremental cap);
            # the bomb cap applies post-hoc — a burst allocation is
            # bounded by the record already being in memory times the
            # brotli ratio, and a lying header keeps raw bytes as ever
            try:
                decoded = brotli.decompress(payload)[:_HTTP_INFLATE_CAP]
            except Exception:
                decoded = None
        else:
            break
        if decoded is None:
            break
        payload = decoded
    return payload


#: WARC-header Content-Length extractor for the boundary splitter —
#: mirrors the record parser's header walk (case-insensitive key, key
#: whitespace tolerated, LAST occurrence wins via finditer-to-last,
#: non-integer value -> 0) without building the header dict.
_WARC_CL_RE = re.compile(
    rb"\r\n[ \t]*content-length[ \t]*:([^\r\n]*)", re.I
)


def _split_warc_stream(
    data: bytes, target: int
) -> Iterator[tuple[int, bytes]]:
    """Cut a WARC byte stream into record-aligned chunks of ~``target``
    DECOMPRESSED bytes, yielding ``(base_offset, chunk)`` where
    ``base_offset`` is the chunk's offset in the decompressed stream.
    The walk is the record parser's cursor logic (find ``WARC/``, read
    the header block, skip Content-Length body bytes) WITHOUT any
    record work — no HTTP split, no payload decode, no row building —
    so it runs at bytes.find/zlib speed, ~an order of magnitude faster
    than the parse it feeds. Concatenating the chunks reproduces the
    stream byte-for-byte, every cut lands on a record start (or inside
    a known record-free junk run), and ``_parse_warc(chunk,
    base_offset=off)`` therefore yields records IDENTICAL to the
    whole-file parse — including the (path, offset)-digest asset_ids —
    just distributable across cores (``tests/test_warc_split.py`` pins
    the equality under the damage classes). Memory: the sliding buffer
    holds ~target + the largest in-flight record, same bound as the
    parser."""
    chunks = (
        _iter_gzip_chunks(data)
        if data[:2] == _GZIP_MAGIC
        else _iter_plain_chunks(data)
    )
    buf = bytearray()
    base0 = 0  # stream offset of buf[0]
    start = 0  # scan cursor within buf
    emit_from = 0  # buf index where the pending out-chunk begins

    def pull() -> bool:
        c = next(chunks, None)
        if c is None:
            return False
        buf.extend(c)
        return True

    pull()
    while True:
        i = buf.find(b"WARC/", start)
        while i < 0:
            if len(buf) - start > 4:
                start = len(buf) - 4
            if start - emit_from >= target:
                # record-free run past the target: cut mid-junk. Safe —
                # any cut point in a span known to hold no record start
                # keeps every record intact in some chunk (the next
                # chunk's parser junk-skips to its first record), and
                # it bounds the buffer on junk-heavy streams.
                yield base0 + emit_from, bytes(buf[emit_from:start])
                del buf[:start]
                base0 += start
                emit_from = 0
                start = 0
            if not pull():
                if len(buf) > emit_from:
                    yield base0 + emit_from, bytes(buf[emit_from:])
                return
            i = buf.find(b"WARC/", start)
        if i - emit_from >= target:
            # cut exactly at a record start
            yield base0 + emit_from, bytes(buf[emit_from:i])
            del buf[:i]
            base0 += i
            emit_from = 0
            i = 0
        start = i
        hdr_end = buf.find(b"\r\n\r\n", start)
        while hdr_end < 0:
            if not pull():
                if len(buf) > emit_from:
                    yield base0 + emit_from, bytes(buf[emit_from:])
                return
            hdr_end = buf.find(b"\r\n\r\n", start)
        with memoryview(buf) as mv:
            hdr = bytes(mv[start:hdr_end])
        last = None
        for last in _WARC_CL_RE.finditer(hdr):
            pass
        try:
            length = int(last.group(1)) if last else 0
        except ValueError:
            length = 0
        body_start = hdr_end + 4
        while len(buf) < body_start + length:
            if not pull():
                break  # truncated record: the tail flush carries it
        start = min(len(buf), body_start + length)


def _parse_warc(
    path: str,
    data: bytes,
    responses_only: bool = False,
    base_offset: int = 0,
) -> Iterator[dict]:
    """Sequential single-pass WARC 1.0/1.1 record parser: header block to
    the blank line, Content-Length body bytes, CRLF CRLF separator.
    Response records additionally split the HTTP message: status line ->
    http_status, Content-Type header, payload after the HTTP headers —
    with capture-time framing undone (``Transfer-Encoding: chunked``
    dechunked, gzip/deflate content-codings inflated; see
    ``_decode_http_payload``) so ``payload``/``n_bytes`` always mean
    the entity bytes, whichever crawler wrote the file.
    An HTTP response WITHOUT a Content-Type header gets content_type
    NULL — never the WARC record's own ``application/http`` envelope
    type, which would read as "not html" and wrongly drop the page in
    ``warc_responses_to_documents``'s NULL-means-keep filter.

    ``responses_only=True`` pushes that projection's keep predicate
    (2xx response, html-or-unknown content type) INTO the parse: skipped
    records' payload bytes are dropped here, before any pandas frame is
    built — the memory-shape guard for archive-scale files whose kept
    fraction is small.

    Memory shape (gzipped input): records parse INCREMENTALLY out of a
    sliding buffer fed bounded decompressed chunks (<= 8 MB each,
    crossing gzip-member boundaries transparently), so a task's working
    set is (compressed file) + (largest in-flight RECORD) + (the
    caller's row chunk) — the full decompressed image of a ~1 GB gz /
    3-5 GB raw Common Crawl shard never materializes, not even for the
    degenerate single-member file or a compression-bomb member. Record
    offsets are positions in the DECOMPRESSED stream, byte-identical to
    a whole-buffer parse. The plain-file path feeds the same sliding
    buffer in bounded memoryview slices (r11: one whole-file
    ``buf.extend`` made peak ~2x file size), so its working set is the
    resident input + the largest record. The buffer compacts
    amortized-O(n)."""
    chunks = (
        _iter_gzip_chunks(data)
        if data[:2] == _GZIP_MAGIC
        else _iter_plain_chunks(data)
    )
    buf = bytearray()
    # stream offset of buf[0]; biased by base_offset when parsing one
    # _split_warc_stream chunk, so rec_offset — and with it the
    # (path, offset)-digest asset_id — is identical to the whole-file
    # parse of the same record
    base0 = base_offset
    start = 0  # parse cursor within buf
    compact_at = 1 << 23

    def pull() -> bool:
        # extend ONLY — compaction is done explicitly at points where
        # every live buffer coordinate is accounted for (a compaction
        # inside the body-fill loop once shifted buf out from under the
        # captured body_start/hdr_end: corrupted payloads + skipped
        # records past the threshold — caught in the r10 self-review)
        c = next(chunks, None)
        if c is None:
            return False
        buf.extend(c)
        return True

    def compact() -> None:
        nonlocal base0, start
        if start > compact_at:
            base0 += start
            del buf[:start]
            start = 0

    pull()
    while True:
        compact()  # between records: only `start` is live
        # tolerate separator slack / trailing junk before the next
        # record; the magic may straddle a member boundary, so failed
        # scans retain a len("WARC/")-1 tail before pulling more
        i = buf.find(b"WARC/", start)
        while i < 0:
            if len(buf) - start > 4:
                start = len(buf) - 4
            compact()  # junk-heavy streams must not accumulate
            if not pull():
                return
            i = buf.find(b"WARC/", start)
        start = i
        hdr_end = buf.find(b"\r\n\r\n", start)
        while hdr_end < 0:
            compact()  # hdr_end recomputed below, only `start` live
            if not pull():
                return
            hdr_end = buf.find(b"\r\n\r\n", start)
        headers: dict[str, str] = {}
        with memoryview(buf) as mv:  # one copy, not bytearray-slice + bytes
            hdr_bytes = bytes(mv[start:hdr_end])
        for line in hdr_bytes.split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            if _:
                headers[k.strip().lower().decode("latin-1")] = (
                    v.strip().decode("latin-1")
                )
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            length = 0
        body_start = hdr_end + 4
        while len(buf) < body_start + length:
            # giant-record guard: drop the consumed prefix, adjusting
            # every live coordinate by the shift
            if start > compact_at:
                base0 += start
                del buf[:start]
                body_start -= start
                hdr_end -= start
                start = 0
            if not pull():
                break  # truncated record: keep the bytes that arrived
        with memoryview(buf) as mv:
            block = bytes(mv[body_start : body_start + length])
        rec_offset = base0 + start
        start = min(len(buf), body_start + length)
        status, ctype, payload = None, headers.get("content-type"), block
        http_te = http_ce = ""
        if headers.get("warc-type") == "response" and block[:5] == b"HTTP/":
            http_end = block.find(b"\r\n\r\n")
            if http_end >= 0:
                http_hdr = block[:http_end].split(b"\r\n")
                parts = http_hdr[0].split(b" ")
                # bounded: RFC 7230 status-code is 3DIGIT; accept any
                # digit run that fits the int32 schema field — a
                # crawled page with a giant digit-string status line
                # must parse as status-unknown, not kill the task with
                # an Arrow OverflowError (the charset=hex class)
                if (
                    len(parts) >= 2
                    and parts[1].isdigit()
                    and len(parts[1]) <= 9
                ):
                    status = int(parts[1])
                # absent HTTP Content-Type = unknown (NULL), NOT the
                # WARC envelope type (see docstring)
                ctype = None
                for line in http_hdr[1:]:
                    k, sep, v = line.partition(b":")
                    if not sep:
                        continue
                    key = k.strip().lower()
                    if key == b"content-type":
                        ctype = v.strip().decode("latin-1")
                    elif key == b"transfer-encoding":
                        # RFC 9110 §5.3: repeated fields are equivalent
                        # to one comma-joined list — append, don't
                        # overwrite (last-wins lost the gzip in
                        # "Content-Encoding: gzip" + ": br" on separate
                        # lines, leaving the payload mis-decoded)
                        t = v.strip().decode("latin-1").lower()
                        http_te = f"{http_te},{t}" if http_te else t
                    elif key == b"content-encoding":
                        c = v.strip().decode("latin-1").lower()
                        http_ce = f"{http_ce},{c}" if http_ce else c
                payload = block[http_end + 4 :]
        if responses_only and not (
            headers.get("warc-type") == "response"
            and status is not None
            and 200 <= status <= 299
            and (ctype is None or "html" in ctype.lower())
        ):
            continue
        if http_te or http_ce:
            # decode AFTER the keep predicate: skipped records never
            # pay dechunk/inflate; the predicate reads only status and
            # content-type, which framing does not change
            payload = _decode_http_payload(payload, http_te, http_ce)
        digest = hashlib.md5(f"{path}#{rec_offset}".encode()).hexdigest()
        yield {
            "asset_id": int(digest[:15], 16),
            "source": path,
            "record_offset": rec_offset,
            "warc_type": headers.get("warc-type"),
            "record_id": headers.get("warc-record-id"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "http_status": status,
            "content_type": ctype,
            "payload": payload,
            "n_bytes": len(payload),
        }


#: Records per yielded Arrow frame. Caps the pandas-copy share of task
#: memory; the per-FILE flush below is the real bound (a task never
#: holds two files' decompressed records at once).
WARC_YIELD_RECORDS = 4096


def _make_parse_batches(responses_only: bool = False):
    """Parser for ``mapInPandas`` with the archive-scale memory shape:
    one yielded DataFrame per WARC FILE (flushing every
    WARC_YIELD_RECORDS records within a file), never a single list
    spanning every file Spark bin-packed into the task. Peak task
    memory is one file's (compressed + decompressed + one chunk's
    pandas rows), not the sum over the batch — measured in
    scripts/probe_warc_memory.py, recorded in BASELINE.md."""
    cols = [f.split(" ")[0] for f in WARC_SCHEMA.split(", ")]

    def _parse_batches(
        batches: Iterable[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p, c in zip(pdf["path"], pdf["content"]):
                rows: list[dict] = []
                for rec in _parse_warc(p, bytes(c), responses_only):
                    rows.append(rec)
                    if len(rows) >= WARC_YIELD_RECORDS:
                        yield pd.DataFrame(rows, columns=cols)
                        rows = []
                if rows:
                    yield pd.DataFrame(rows, columns=cols)

    return _parse_batches


_WARC_CHUNK_SCHEMA = "path string, base_offset long, chunk binary"


def _make_split_batches(target: int):
    """Boundary splitter for ``mapInPandas``: (path, content) file rows
    -> (path, base_offset, chunk) record-aligned slices of ~``target``
    decompressed bytes (``_split_warc_stream``). Yields small frames so
    a huge file's chunks never sit in one pandas list."""

    def _split_batches(
        batches: Iterable[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        cols = ["path", "base_offset", "chunk"]
        for pdf in batches:
            for p, c in zip(pdf["path"], pdf["content"]):
                rows: list[dict] = []
                for off, chunk in _split_warc_stream(bytes(c), target):
                    rows.append(
                        {"path": p, "base_offset": off, "chunk": chunk}
                    )
                    if len(rows) >= 8:
                        yield pd.DataFrame(rows, columns=cols)
                        rows = []
                if rows:
                    yield pd.DataFrame(rows, columns=cols)

    return _split_batches


def _make_parse_chunk_batches(responses_only: bool = False):
    """Chunk-side twin of ``_make_parse_batches``: parses
    (path, base_offset, chunk) rows with the record offsets biased by
    base_offset, so every yielded record is byte-identical to the
    whole-file parse."""
    cols = [f.split(" ")[0] for f in WARC_SCHEMA.split(", ")]

    def _parse_batches(
        batches: Iterable[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p, off, c in zip(
                pdf["path"], pdf["base_offset"], pdf["chunk"]
            ):
                rows: list[dict] = []
                for rec in _parse_warc(
                    p, bytes(c), responses_only, base_offset=int(off)
                ):
                    rows.append(rec)
                    if len(rows) >= WARC_YIELD_RECORDS:
                        yield pd.DataFrame(rows, columns=cols)
                        rows = []
                if rows:
                    yield pd.DataFrame(rows, columns=cols)

    return _parse_batches


def _split_parse(raw: DataFrame, chunk_bytes: int, responses_only: bool):
    """The two-stage parallel parse both readers share when
    ``chunk_bytes`` is set: cheap boundary split -> round-robin
    repartition (spark.sql.shuffle.partitions) -> full record parse.
    The shuffle moves each chunk's bytes exactly once — that is the
    price of intra-file parse parallelism, and it is the right trade
    whenever the micro-batch holds fewer files than cores (the
    streaming-curation shape: maxFilesPerTrigger=1 means the default
    per-FILE parse runs one core while the rest idle — measured 11.8 s
    single-core vs ~2 s split on a 4k-page segment,
    scripts/probe_streaming_gate_decomp.json)."""
    split = raw.mapInPandas(
        _make_split_batches(chunk_bytes), _WARC_CHUNK_SCHEMA
    )
    # explicit partition count: chunks are FEW but CPU-heavy, the exact
    # shape AQE's size-based coalescing would wrongly merge back onto
    # one core (its advisory target is bytes, not compute) — a
    # user-specified repartition(N) is exempt from coalescing
    n = int(raw.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return split.repartition(n).mapInPandas(
        _make_parse_chunk_batches(responses_only), WARC_SCHEMA
    )


def read_warc(
    spark: SparkSession,
    path: str,
    glob: str = "*.warc*",
    responses_only: bool = False,
    chunk_bytes: int | None = None,
) -> DataFrame:
    """Load a directory tree of WARC files (.warc or per-record-gzip
    .warc.gz) as one row per WARC record. ``glob`` prunes at listing
    time; the parse runs where the bytes landed — no driver I/O.
    ``responses_only=True`` keeps only 2xx html-or-unknown response
    records, dropping everything else's payload inside the parse (the
    predicate ``warc_responses_to_documents`` would apply anyway,
    pushed down to the byte level).

    Glob overlap caveat: the default ``*.warc*`` also matches WET
    segments (Common Crawl names them ``*.warc.wet.gz``), so pointing
    this at a tree holding BOTH ingests conversion records alongside
    responses. When WARC and WET share a tree, pass ``glob="*.warc.gz"``
    (which does NOT match ``...warc.wet.gz``) or set
    ``responses_only=True`` / project through
    ``warc_responses_to_documents`` — both filter conversions out.

    ``chunk_bytes`` (optional) switches to the two-stage INTRA-file
    parallel parse (``_split_parse``): set it when the job reads fewer
    files than cores (a handful of huge segments); leave None when file
    count saturates the cluster — the default path parses in place with
    zero shuffle."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )
    if chunk_bytes:
        return _split_parse(raw, chunk_bytes, responses_only)
    return raw.mapInPandas(_make_parse_batches(responses_only), WARC_SCHEMA)


#: binaryFile's fixed schema, needed explicitly on the streaming reader.
_BINARYFILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def read_warc_stream(
    spark: SparkSession,
    path: str,
    glob: str = "*.warc*",
    responses_only: bool = False,
    max_files_per_trigger: int = MAX_FILES_PER_TRIGGER,
    chunk_bytes: int | None = None,
) -> DataFrame:
    """Streaming twin of ``read_warc``: WARC files LANDING in ``path``
    (how a live crawl delivers — a new ~1 GB segment file at a time)
    parse incrementally through Structured Streaming's checkpointed
    file-source log, so every record is ingested exactly once across
    restarts and re-triggers. Identical parse, schema, and record ids
    to the batch reader; downstream, ``warc_responses_to_documents``
    and the projection gates (quality/c4/mojibake) compose unchanged —
    they are the same operators on a streaming frame.

    ``max_files_per_trigger`` bounds micro-batch admission (default 50,
    the reference's parquet-stream bound,
    ``SparkParquetStreamingToElasticsearch.java:82``): without it, the
    FIRST trigger of a catch-up restart would ingest every pending
    ~1 GB segment in one micro-batch (r10 verdict finding). ``glob``
    has the same WARC/WET overlap caveat as ``read_warc``.

    ``chunk_bytes``: the streaming reader is where the two-stage
    intra-file parallel parse (``_split_parse``) earns its shuffle —
    with ``max_files_per_trigger=1`` the default per-FILE parse runs a
    whole micro-batch on ONE core. The split is a stateless
    projection + one exchange, both streaming-legal, and record ids
    are byte-identical to the default path, so every downstream stage
    (gates, dedup state, checkpoints) is oblivious to the choice."""
    raw = (
        spark.readStream.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .schema(_BINARYFILE_SCHEMA)
        .load(path)
        .select("path", "content")
    )
    if chunk_bytes:
        return _split_parse(raw, chunk_bytes, responses_only)
    return raw.mapInPandas(_make_parse_batches(responses_only), WARC_SCHEMA)


def warc_responses_to_documents(
    records: DataFrame, charset: str = "utf-8", two_phase: bool = False
) -> DataFrame:
    """Project 2xx HTML response records onto the crawl-page contract
    ``pipelines.curate_crawl`` ingests: (doc_id, url, html).

    ``charset`` picks the byte -> string decode (r11, verdict #5 —
    real crawls are ~5-10% non-UTF-8):

    - ``"utf-8"`` (default): JVM-side, zero Python —
      ``make_valid_utf8(cast(payload as string))``, which equals
      ``decode(payload, 'UTF-8')`` on valid input but replaces invalid
      sequences with U+FFFD (the browser behavior). Spark 4's
      ``decode`` RAISES ``MALFORMED_CHARACTER_CODING`` on the first
      bad byte — one damaged or non-UTF-8 page would kill a whole
      ingest job (r11 finding, regression-pinned);
    - ``"sniff"``: the WHATWG ladder (BOM > HTTP charset param > meta
      prescan > UTF-8 validity > windows-1252 fallback) as a TWO-PHASE
      Arrow-batched projection (``operators/charset.py``, r12): a JVM
      codegen predicate proves the valid-UTF-8-no-contradicting-
      declaration majority, whose bytes then never cross into Python —
      pages that UTF-8-only decoding shreds into replacement noise
      survive curation intact, composing with the downstream mojibake
      repair.

    NULL content_type means "keep": since the parser sets content_type
    NULL when an HTTP response carries no Content-Type header (never
    the WARC ``application/http`` envelope type), the coalesce branch
    actually fires for unknown-type pages as intended. Reading with
    ``read_warc(..., responses_only=True)`` applies this same predicate
    at the byte level; this filter is then a cheap no-op."""
    if charset not in ("utf-8", "sniff"):
        raise ValueError(f"charset must be 'utf-8' or 'sniff', got {charset!r}")
    pages = records.filter(
        (F.col("warc_type") == "response")
        & F.col("http_status").between(200, 299)
        & F.coalesce(
            F.lower("content_type").contains("html"), F.lit(True)
        )
    )
    if charset == "sniff":
        # ONE-phase ladder here, deliberately (r13, measured): the
        # two-phase routing's win is real on narrow JVM-stored page
        # tables (probe_charset_routing.py: 1.38x/1.24x), but THIS
        # projection sits directly behind read_warc's mapInPandas
        # parse, where the composed measurement inverts — one-phase
        # runs ~1.25-1.6x FASTER (probe_composed_charset_routing.json:
        # ingest_speedup 0.62/0.71 for two-phase at 60%/95% mixes; the
        # fast path's extra JVM validity+cast scans cost more than
        # they save when the rows are wide and freshly Python-built).
        # Both forms are byte-identical (fidelity pinned by the probe
        # and the two-phase differential tests); callers decoding
        # STORED page tables should use with_sniffed_text(two_phase=
        # True) directly. two_phase stays a knob for parity tests.
        from weather_monitoring_spark.operators.charset import (
            with_sniffed_text,
        )

        pages = with_sniffed_text(pages, "html", two_phase=two_phase)
    else:
        pages = pages.withColumn(
            "html", F.make_valid_utf8(F.col("payload").cast("string"))
        )
    return pages.select(
        F.col("asset_id").alias("doc_id"),
        F.col("target_uri").alias("url"),
        F.col("html"),
    )


# ---------------- WET (extracted-text WARC) sibling -----------------------


def read_wet(
    spark: SparkSession,
    path: str,
    glob: str = "*.wet*",
) -> DataFrame:
    """WET reader: WET files ARE WARC files whose records are
    ``conversion`` records (extraction pre-done, payload = plain text,
    UTF-8 by spec) — the format a crawl-pipeline user reaches for when
    they don't need the HTML (Common Crawl ships
    ``crawl-data/CC-MAIN-*/wet/*.warc.wet.gz`` alongside the WARCs).
    Same parser, same schema, same per-file memory shape and
    content-addressed record ids as ``read_warc``; only the listing
    glob differs."""
    return read_warc(spark, path, glob=glob)


def read_wet_stream(
    spark: SparkSession,
    path: str,
    glob: str = "*.wet*",
    max_files_per_trigger: int = MAX_FILES_PER_TRIGGER,
) -> DataFrame:
    """Streaming twin of ``read_wet`` (the ``read_warc_stream``
    machinery with the WET listing glob): WET segment files landing in
    ``path`` parse incrementally through the checkpointed file-source
    log — exactly-once across restarts, identical rows and record ids
    to the batch reader; ``wet_to_documents`` composes unchanged on the
    streaming frame. ``max_files_per_trigger`` bounds micro-batch
    admission exactly as on ``read_warc_stream``."""
    return read_warc_stream(
        spark, path, glob=glob, max_files_per_trigger=max_files_per_trigger
    )


def wet_to_documents(records: DataFrame) -> DataFrame:
    """Project WET ``conversion`` records onto (doc_id, url, text) —
    the PRE-EXTRACTED document contract
    (``pipelines.curate_crawl(..., pre_extracted=True)`` consumes this
    directly, skipping the HTML-extraction stage the WARC path needs).
    WET payloads keep the source line structure, so the line/paragraph
    gates (C4, Gopher repetition) see real lines.

    Decode is total: WET is UTF-8 by spec, but crawl damage (a record
    truncated mid-multibyte-char) must not kill the job — Spark 4's
    ``decode`` raises on the first bad byte, so this uses
    ``make_valid_utf8`` (U+FFFD replacement; identical output on valid
    input), the same r11 hardening as the WARC documents projection."""
    return records.filter(F.col("warc_type") == "conversion").select(
        F.col("asset_id").alias("doc_id"),
        F.col("target_uri").alias("url"),
        F.make_valid_utf8(F.col("payload").cast("string")).alias("text"),
    )
