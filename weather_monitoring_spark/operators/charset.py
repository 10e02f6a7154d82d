"""Charset-sniffing decode for crawl payloads — the WHATWG ladder.

``warc_responses_to_documents`` decodes UTF-8 only by default (JVM-side
``F.decode``, zero Python); real crawls are ~5-10% non-UTF-8, and those
pages either shred into replacement characters or survive as mojibake
noise that the quality gates then drop. This module is the opt-in stage
that closes the gap: per payload, pick the charset by the bounded
WHATWG-encoding-sniff ladder (https://encoding.spec.whatwg.org/ and the
HTML standard's "determining the character encoding" steps, in spec
order):

1. **BOM** — UTF-8 / UTF-16LE / UTF-16BE byte-order marks override
   every declaration (WHATWG step 1).
2. **Transport layer** — the ``charset=`` parameter of the HTTP
   ``Content-Type`` header the WARC parser already extracted.
3. **Meta prescan** — ``<meta charset=...>`` / ``<meta http-equiv
   content="...charset=...">`` within the first 1024 payload bytes
   (the spec's prescan window).
4. **UTF-8 validity** — a payload that strict-decodes as UTF-8 is
   UTF-8 (UTF-8 false positives are vanishingly rare for real text).
5. **windows-1252 fallback** — the WHATWG default for the ``en``
   locale group; every byte maps, so decoding is total.

Deliberate divergence from the spec, for fidelity: a DECLARED charset
(rungs 2-3) is tried STRICT and falls through to rungs 4-5 when the
payload doesn't actually decode under it — crawled declarations lie
constantly, and silently substituting U+FFFD for every mismatch (the
browser behavior) destroys exactly the text this stage exists to save.

Labels resolve through the WHATWG label table (the spec folds latin1 /
iso-8859-1 / ascii into windows-1252 — their C1 range is used as 1252
punctuation in the wild), then ``codecs.lookup`` for the long tail.

No SQL form: charset sniffing needs byte-level validity trials and the
codec machinery, so this is an Arrow-batched pandas_udf (the
``unicode_form`` / ``entities="full"`` precedent) — pytest-guaranteed
via a planted multi-charset WARC fixture, not oracle-checked. It is a
per-row projection: zero shuffle, composes with ``fix_mojibake``
downstream (a page that was CORRECTLY decoded here no longer needs
repair; one that was double-encoded at the origin still does).

Reference parity: the reference ingests UTF-8 JSON only
(``Base-Central-Station/src/main/java/org/example/CentralStation.java:58-63``,
``Rain-Detector/src/main/java/org/example/Main.java:31``); this extends
the engine's crawl-pipeline scope per the builder brief.
"""

from __future__ import annotations

import codecs
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

#: WHATWG prescan window: a meta declaration only counts inside the
#: first 1024 bytes.
PRESCAN_BYTES = 1024

#: WHATWG encoding-label table (common subset; the spec's full table
#: folds many aliases — notably the latin1 family — into windows-1252).
#: Unlisted labels fall through to codecs.lookup.
_WHATWG_LABELS: dict[str, str] = {
    "utf-8": "utf-8",
    "utf8": "utf-8",
    "unicode-1-1-utf-8": "utf-8",
    "iso-8859-1": "windows-1252",
    "iso8859-1": "windows-1252",
    "iso_8859-1": "windows-1252",
    "latin1": "windows-1252",
    "latin-1": "windows-1252",
    "l1": "windows-1252",
    "ascii": "windows-1252",
    "us-ascii": "windows-1252",
    "windows-1252": "windows-1252",
    "cp1252": "windows-1252",
    "x-cp1252": "windows-1252",
    "iso-8859-2": "iso8859-2",
    "latin2": "iso8859-2",
    "iso-8859-15": "iso8859-15",
    "windows-1250": "cp1250",
    "windows-1251": "cp1251",
    "cp1251": "cp1251",
    "windows-1254": "cp1254",
    "windows-1256": "cp1256",
    "koi8-r": "koi8-r",
    "koi8-u": "koi8-u",
    "shift_jis": "shift_jis",
    "shift-jis": "shift_jis",
    "sjis": "shift_jis",
    "x-sjis": "shift_jis",
    "euc-jp": "euc_jp",
    "iso-2022-jp": "iso2022_jp",
    "gbk": "gbk",
    "gb2312": "gbk",  # WHATWG: gb2312 labels the gbk decoder
    "gb_2312": "gbk",
    "gb18030": "gb18030",
    "big5": "big5",
    "big5-hkscs": "big5hkscs",
    "euc-kr": "euc_kr",
    "ks_c_5601-1987": "euc_kr",
    "utf-16": "utf-16",
    "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be",
    "tis-620": "cp874",
    "windows-874": "cp874",
}

#: charset= parameter in an HTTP Content-Type header value.
_HTTP_CHARSET_RE = re.compile(
    r"""charset\s*=\s*["']?\s*([A-Za-z0-9._:-]+)""", re.IGNORECASE
)

#: <meta charset=...> / <meta http-equiv=... content="...charset=...">
#: inside the prescan window. One byte-regex over the <meta...> tag
#: body is the bounded approximation of the spec's prescan tokenizer.
_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]{0,200}?charset\s*=\s*["']?\s*([A-Za-z0-9._:-]+)""",
    re.IGNORECASE,
)


def resolve_charset_label(label: str | None) -> str | None:
    """WHATWG label -> Python codec name, or None for an unknown/empty
    label (the ladder then continues to the validity rungs).

    Only TEXT encodings resolve: ``codecs.lookup`` also knows binary
    transform codecs (``hex``, ``base64``, ``uu``, ``rot13``,
    ``zlib``, ...) whose ``bytes.decode`` raises ``LookupError``
    instead of ``UnicodeDecodeError`` — a crawled page declaring
    ``charset=hex`` must fall through the ladder, not crash the task.
    """
    if not label:
        return None
    name = label.strip().strip("\"'").lower()
    codec = _WHATWG_LABELS.get(name)
    if codec:
        return codec
    try:
        info = codecs.lookup(name)
    except LookupError:
        return None
    if not getattr(info, "_is_text_encoding", True):
        return None
    return info.name


def _declared_labels(payload: bytes, content_type: str | None):
    """Rungs 2-3: transport-layer charset, then the meta prescan."""
    if content_type:
        m = _HTTP_CHARSET_RE.search(content_type)
        if m:
            yield m.group(1)
    m = _META_CHARSET_RE.search(payload[:PRESCAN_BYTES])
    if m:
        yield m.group(1).decode("ascii", "ignore")


def sniff_decode_bytes(payload: bytes | None, content_type: str | None) -> str | None:
    """The ladder, one payload at a time (driver-importable for tests;
    the pandas_udf below maps it over Arrow batches)."""
    if payload is None:
        return None
    if payload[:3] == b"\xef\xbb\xbf":
        return payload[3:].decode("utf-8", "replace")
    if payload[:2] == b"\xff\xfe":
        return payload[2:].decode("utf-16-le", "replace")
    if payload[:2] == b"\xfe\xff":
        return payload[2:].decode("utf-16-be", "replace")
    for label in _declared_labels(payload, content_type):
        codec = resolve_charset_label(label)
        if codec:
            try:
                # strict: a lying declaration falls through the ladder
                # instead of shredding the page into U+FFFD.
                # LookupError/TypeError belt-and-braces: a codec that
                # slipped past the text-encoding gate must degrade to
                # the validity rungs, never abort the ingest.
                return payload.decode(codec)
            except (UnicodeDecodeError, ValueError, LookupError, TypeError):
                pass
    try:
        return payload.decode("utf-8")
    except UnicodeDecodeError:
        # total: Python's cp1252 leaves 5 bytes undefined (WHATWG maps
        # them to C1 controls), hence errors="replace" on the last rung
        return payload.decode("windows-1252", "replace")


#: JVM twins of the ladder's declaration regexes (Java syntax; the
#: character classes are pure ASCII, so byte/char semantics agree).
_HTTP_CHARSET_RE_JVM = r"""(?i)charset\s*=\s*["']?\s*([A-Za-z0-9._:-]+)"""
_META_CHARSET_RE_JVM = (
    r"""(?i)<meta[^>]{0,200}?charset\s*=\s*["']?\s*([A-Za-z0-9._:-]+)"""
)

#: The WHATWG labels that NAME utf-8. A declaration carrying one of
#: these cannot contradict the UTF-8 fast path; anything else (even an
#: unknown label) routes to the Python ladder — conservative, because
#: fidelity beats coverage on the routing predicate.
_UTF8_LABELS = ("", "utf-8", "utf8", "unicode-1-1-utf-8")


def _fast_path_eligible(payload: Column, content_type: Column) -> Column:
    """True exactly when the ladder's answer is provably the strict
    UTF-8 decode: no BOM (a UTF-8 BOM changes the output — the ladder
    strips it; UTF-16 BOM bytes are never valid UTF-8 anyway), payload
    bytes valid UTF-8, and neither the transport header nor the
    1024-byte meta prescan declares a non-utf-8 charset. Pure JVM
    expressions — evaluated inside whole-stage codegen, zero Python."""
    no_bom = ~(
        (F.hex(payload.substr(F.lit(1), F.lit(3))) == "EFBBBF")
        | F.hex(payload.substr(F.lit(1), F.lit(2))).isin("FFFE", "FEFF")
    )
    valid = F.is_valid_utf8(payload.cast("string"))
    http_label = F.lower(
        F.coalesce(
            F.regexp_extract(content_type, _HTTP_CHARSET_RE_JVM, 1), F.lit("")
        )
    )
    meta_label = F.lower(
        F.coalesce(
            F.regexp_extract(
                payload.substr(F.lit(1), F.lit(PRESCAN_BYTES)).cast("string"),
                _META_CHARSET_RE_JVM,
                1,
            ),
            F.lit(""),
        )
    )
    # conjunct order is a cost decision: codegen's && short-circuits,
    # so the bounded checks (BOM bytes, header regex, 1 KiB prescan
    # regex) run before the full-payload validity scan — a page
    # ineligible by declaration never pays the whole-body pass
    return (
        no_bom
        & http_label.isin(*_UTF8_LABELS)
        & meta_label.isin(*_UTF8_LABELS)
        & valid
    )


def sniffed_text_col(
    payload: Column, content_type: Column, two_phase: bool = True
) -> Column:
    """``(payload binary, content_type string) -> string`` as a
    composable Column — the WHATWG ladder (see the module docstring for
    why there is no SQL form).

    ``two_phase`` (default, r12 verdict #2): real crawls are majority
    valid-UTF-8-with-no-contradicting-declaration, and for exactly
    those pages the ladder's answer IS the strict UTF-8 decode — a
    plain ``binary -> string`` cast, since the routing predicate
    (:func:`_fast_path_eligible`) has already PROVEN validity, making
    ``make_valid_utf8``'s rewrite pass redundant. The expression is

        coalesce(ladder_udf(IF(!fast, payload), IF(!fast, ct)),
                 cast(payload as string))

    i.e. the pandas_udf still runs over every row (Spark extracts
    Python UDFs from conditionals and evaluates them unconditionally),
    but fast-path rows cross the Arrow boundary as NULLs: no page
    bytes shipped to Python, no PyBytes/str materialization, no decode
    — just a per-row None check. The udf returns NULL exactly for
    (gated-fast | originally-NULL) rows, and coalesce's JVM branch
    yields NULL for a NULL payload too, so the NULL contract is
    preserved.

    Three architectures were measured before shipping this one
    (interleaved best-of-5 at local[32] AND single-core control, 500k
    pages / 1.5 GB, 60%- and 95%-UTF-8 mixes — see BASELINE.md r12
    rows): a filter/filter/UNION frame split wins on a cached source
    (1.4x) but RE-SCANS the source twice — behind the WARC parse that
    doubles the most expensive stage of the crawl path; a single-pass
    ``mapInArrow`` router (JVM flag + vectorized Arrow cast for fast
    rows) loses outright (0.5-0.9x: the Arrow machinery + predicate
    cost exceeds the boxing it avoids); this gated form is the only
    design that wins in every regime (1.09-1.18x), keeps one scan,
    preserves row order, and composes as a plain Column. The honest
    ceiling is modest because the crossing's cost is dominated by
    per-ROW machinery, not bytes — Amdahl on the non-UTF-8 fraction
    bounds any routing scheme.

    ``two_phase=False`` is the pure ladder (every row's bytes cross) —
    the probe baseline and the differential-test oracle.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _decode(payload_s, ctype_s):
        return pd.Series(
            [
                sniff_decode_bytes(
                    None if p is None else bytes(p),
                    None if c is None else str(c),
                )
                for p, c in zip(payload_s, ctype_s)
            ],
            dtype=object,
        )

    ladder = pandas_udf(_decode, "string")
    if not two_phase:
        return ladder(payload, content_type)
    fast = F.coalesce(
        _fast_path_eligible(payload, content_type), F.lit(False)
    )
    return F.coalesce(
        ladder(F.when(~fast, payload), F.when(~fast, content_type)),
        payload.cast("string"),
    )


def with_sniffed_text(
    df,
    out_col: str,
    payload_col: str = "payload",
    content_type_col: str = "content_type",
    two_phase: bool = True,
):
    """Frame-level convenience: ``df`` plus ``out_col`` (string)
    decoded by the WHATWG ladder via :func:`sniffed_text_col` —
    ``two_phase`` routes the valid-UTF-8 majority's BYTES around the
    Python crossing (see that docstring for the measured design
    rationale). Single scan, row order preserved, works unchanged on
    streaming frames."""
    return df.withColumn(
        out_col,
        sniffed_text_col(
            F.col(payload_col), F.col(content_type_col), two_phase=two_phase
        ),
    )
