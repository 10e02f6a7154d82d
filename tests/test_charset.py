"""Charset-sniffing decode stage (operators/charset.py) — the WHATWG
ladder for WARC payloads (r11, verdict #5): BOM > HTTP charset param >
meta prescan > UTF-8 validity > windows-1252 fallback, with STRICT
trials of declared charsets so lying declarations fall through instead
of shredding pages into U+FFFD."""

from tests.test_pipeline_paths import _warc_record
from weather_monitoring_spark.operators.charset import (
    PRESCAN_BYTES,
    resolve_charset_label,
    sniff_decode_bytes,
)

TEXT = "Café déjà vu — naïve “fiancée” résumé"


def test_ladder_rung1_bom_overrides_everything():
    # a BOM wins even against a contradicting transport declaration
    assert (
        sniff_decode_bytes(
            b"\xef\xbb\xbf" + TEXT.encode("utf-8"),
            "text/html; charset=iso-8859-1",
        )
        == TEXT
    )
    assert sniff_decode_bytes(b"\xff\xfe" + TEXT.encode("utf-16-le"), None) == TEXT
    assert sniff_decode_bytes(b"\xfe\xff" + TEXT.encode("utf-16-be"), None) == TEXT


def test_ladder_rung2_http_charset_param_with_whatwg_label_folding():
    # iso-8859-1 folds to windows-1252 per WHATWG: the curly quotes and
    # em-dash (0x93/0x94/0x97, C1 controls under real latin-1) decode
    # as punctuation
    raw = TEXT.encode("windows-1252")
    assert sniff_decode_bytes(raw, 'text/html; charset="ISO-8859-1"') == TEXT
    assert sniff_decode_bytes(raw, "text/html; charset=latin1") == TEXT


def test_ladder_rung3_meta_prescan():
    body = TEXT.encode("cp1251", "replace")  # cyrillic page
    cyr = "Привет, мир — тест".encode("cp1251")
    page = (
        b'<html><head><meta charset="windows-1251"></head><body>'
        + cyr
        + b"</body></html>"
    )
    out = sniff_decode_bytes(page, "text/html")
    assert "Привет, мир" in out
    # http-equiv form resolves too
    page2 = (
        b'<html><head><meta http-equiv="Content-Type" '
        b'content="text/html; charset=windows-1251"></head><body>'
        + cyr
        + b"</body></html>"
    )
    assert "Привет, мир" in sniff_decode_bytes(page2, None)
    del body


def test_meta_declaration_past_prescan_window_is_ignored():
    # declaration buried past 1024 bytes: the ladder continues — the
    # payload is valid UTF-8, so rung 4 wins and the (wrong) late
    # cp1251 declaration never mangles it
    filler = b"<!--" + b"x" * PRESCAN_BYTES + b"-->"
    page = filler + b'<meta charset="windows-1251">' + TEXT.encode("utf-8")
    assert TEXT in sniff_decode_bytes(page, None)


def test_lying_declaration_falls_through_strict():
    # declared utf-8, but the bytes are windows-1252: strict utf-8
    # fails, rung 4 fails, rung 5 decodes it — no U+FFFD shredding
    raw = TEXT.encode("windows-1252")
    out = sniff_decode_bytes(raw, "text/html; charset=utf-8")
    assert out == TEXT
    assert "�" not in out


def test_ladder_rung4_utf8_validity_and_rung5_fallback():
    assert sniff_decode_bytes(TEXT.encode("utf-8"), None) == TEXT  # rung 4
    assert sniff_decode_bytes(TEXT.encode("windows-1252"), None) == TEXT  # rung 5
    assert sniff_decode_bytes(b"plain ascii", "text/html") == "plain ascii"
    assert sniff_decode_bytes(None, None) is None
    # cp1252's five undefined bytes replace instead of raising (total)
    assert "�" in sniff_decode_bytes(b"bad \x81 byte", None)


def test_non_text_codec_labels_cannot_crash_the_ladder():
    """ADVICE r12 (high): ``codecs.lookup`` resolves binary transform
    codecs ('hex', 'base64', 'uu', 'rot13', 'zlib', 'quopri'), whose
    ``bytes.decode`` raises LookupError — not UnicodeDecodeError — so a
    single crawled page declaring ``charset=hex`` would crash the
    pandas_udf task and abort the whole ingest. They must resolve to
    None (ladder continues to the validity rungs) and decoding must be
    total regardless."""
    for label in ("hex", "base64", "uu", "rot13", "zlib", "quopri"):
        assert resolve_charset_label(label) is None, label
        # transport-layer declaration
        out = sniff_decode_bytes(TEXT.encode("utf-8"), f"text/html; charset={label}")
        assert out == TEXT, label
        # meta-prescan declaration, non-UTF-8 body: rung 5 still saves it
        page = (
            f'<meta charset="{label}">'.encode("ascii") + TEXT.encode("windows-1252")
        )
        out2 = sniff_decode_bytes(page, None)
        assert TEXT in out2, label


def test_unknown_label_continues_ladder():
    assert resolve_charset_label("not-a-charset-9000") is None
    assert resolve_charset_label(None) is None
    assert resolve_charset_label("Shift_JIS") == "shift_jis"
    out = sniff_decode_bytes(
        TEXT.encode("utf-8"), "text/html; charset=not-a-charset-9000"
    )
    assert out == TEXT


def test_two_phase_routing_is_byte_identical_to_the_ladder(spark):
    """r12 (verdict #2): the two-phase sniff (JVM cast for proven
    valid-UTF-8-no-contradicting-declaration pages whose bytes never
    cross into Python, the ladder for the rest) must be BYTE-IDENTICAL
    to the pure ladder on an adversarial corpus — every routing
    boundary: BOMs, lying/unknown/non-text declarations, meta past the
    prescan window, invalid bytes, NULLs, empties, multi-byte chars cut
    at the 1024-byte prescan edge."""
    import random

    from weather_monitoring_spark.operators.charset import with_sniffed_text

    rng = random.Random(0xC0DEC)
    encodings = ["utf-8", "windows-1252", "cp1251", "shift_jis", "gb18030"]
    labels = [
        None, "utf-8", "UTF-8", "utf8", "latin1", "iso-8859-1",
        "windows-1251", "shift_jis", "gb2312", "hex", "base64",
        "not-a-charset-9000", "rot13",
    ]
    texts = [TEXT, "Привет, мир — тест", "こんにちは世界", "你好，世界", "plain ascii", ""]

    def one_case():
        enc = rng.choice(encodings)
        text = rng.choice(texts)
        body = text.encode(enc, "replace")
        form = rng.randrange(6)
        label = rng.choice(labels)
        ct = None if label is None else f"text/html; charset={label}"
        if form == 0:  # bare body, transport declaration only
            return body, ct
        if form == 1:  # meta declaration (possibly lying)
            meta = rng.choice(labels[1:])
            return (f'<meta charset="{meta}">'.encode() + body), ct
        if form == 2:  # BOM
            bom = rng.choice([b"\xef\xbb\xbf", b"\xff\xfe", b"\xfe\xff"])
            codec = {b"\xef\xbb\xbf": "utf-8", b"\xff\xfe": "utf-16-le",
                     b"\xfe\xff": "utf-16-be"}[bom]
            return bom + text.encode(codec), ct
        if form == 3:  # meta buried past the prescan window
            filler = b"<!--" + bytes(rng.randrange(97, 123) for _ in range(1030)) + b"-->"
            return filler + b'<meta charset="windows-1251">' + body, ct
        if form == 4:  # random bytes (possibly invalid everywhere)
            return bytes(rng.randrange(256) for _ in range(rng.randrange(0, 80))), ct
        # multi-byte char straddling the 1024-byte prescan edge
        pad = b"x" * 1022
        return pad + "é€".encode("utf-8") + body, ct

    cases = [one_case() for _ in range(300)] + [(None, "text/html"), (None, None)]
    df = spark.createDataFrame(
        [(i, p, c) for i, (p, c) in enumerate(cases)],
        "rid bigint, payload binary, ct string",
    )

    def outputs(two_phase):
        rows = with_sniffed_text(
            df, "html", content_type_col="ct", two_phase=two_phase
        ).collect()
        return {r["rid"]: r["html"] for r in rows}

    one, two = outputs(False), outputs(True)
    assert set(one) == set(two) == set(range(len(cases)))
    for rid, (payload, ct) in enumerate(cases):
        ref = sniff_decode_bytes(payload, ct)
        assert one[rid] == ref, (ct, (payload or b"")[:60])
        assert two[rid] == ref, (ct, (payload or b"")[:60])


def test_warc_sniffed_documents_end_to_end(tmp_path, spark):
    """The same logical page planted in five encodings (UTF-8 declared,
    1252 via transport, 1252 via meta, 1252 undeclared, UTF-8 BOM) must
    decode to the SAME text under charset="sniff" and SURVIVE curation
    — the pages UTF-8-only decoding loses to decode noise (r11 verdict
    #5's done-criterion)."""
    import gzip

    from weather_monitoring_spark.operators.htmlops import extract_html_text
    from weather_monitoring_spark.pipelines import curate_crawl
    from weather_monitoring_spark.sources.warc import (
        read_warc,
        warc_responses_to_documents,
    )

    sents = (
        "Café déjà vu pour la fiancée naïve après le résumé détaillé. "
        "Le château sérieux présente une démonstration générale utile. "
        "Ces phrases démontrent la préservation des accents français. "
        "Chaque document traverse la même chaîne de conservation ici."
    )
    html = f"<html><body><p>{sents}</p></body></html>"
    html_meta = html.replace(
        "<html>", '<html><head><meta charset="windows-1252"></head>'
    )
    recs = [
        _warc_record(
            "http://utf8/1", html.encode("utf-8"),
            ctype="text/html; charset=utf-8",
        ),
        _warc_record(
            "http://transport/2", html.encode("windows-1252"),
            ctype="text/html; charset=iso-8859-1",
        ),
        _warc_record(
            "http://meta/3", html_meta.encode("windows-1252"),
            ctype="text/html",
        ),
        _warc_record(
            "http://bare/4", html.encode("windows-1252"), ctype="text/html"
        ),
        _warc_record(
            "http://bom/5", b"\xef\xbb\xbf" + html.encode("utf-8"),
            ctype="text/html",
        ),
    ]
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "seg.warc.gz").write_bytes(
        b"".join(gzip.compress(r) for r in recs)
    )

    docs = warc_responses_to_documents(
        read_warc(spark, str(d)), charset="sniff"
    )
    urls = {r["doc_id"]: r["url"] for r in docs.select("doc_id", "url").collect()}
    texts = {
        urls[r["doc_id"]]: r["text"]
        for r in extract_html_text(docs, html_col="html").collect()
    }
    assert len(texts) == 5
    assert len(set(texts.values())) == 1  # all five decode identically
    assert "déjà" in texts["http://bare/4"]
    assert "�" not in texts["http://transport/2"]

    # and they SURVIVE curation — note the five pages are exact
    # content twins AFTER correct decoding, so exact dedup collapses
    # them to ONE survivor: the proof the decode stage worked (mangled
    # twins would NOT collapse — their bytes differ)
    stages = curate_crawl(docs, min_tokens=10, checkpoint=False)
    curated = {r["doc_id"] for r in stages.curated.select("doc_id").collect()}
    assert curated == set(urls)  # every page clears the quality gates
    clean = [r["doc_id"] for r in stages.clean.select("doc_id").collect()]
    assert len(clean) == 1 and clean[0] in urls


def test_sniffed_decode_composes_on_streaming_front_door(tmp_path, spark):
    """charset="sniff" is a per-row projection, so it must run
    unchanged inside a StreamingQuery (the batch==stream discipline
    every gate follows): a windows-1252 segment landing in the
    directory decodes correctly through the checkpointed stream."""
    import gzip

    from weather_monitoring_spark.sources.warc import (
        read_warc,
        read_warc_stream,
        warc_responses_to_documents,
    )

    html = "<html><body><p>Café déjà “vu”</p></body></html>"
    d = tmp_path / "landing"
    d.mkdir()
    (d / "seg.warc.gz").write_bytes(
        gzip.compress(
            _warc_record(
                "http://w1252/1", html.encode("windows-1252"),
                ctype="text/html; charset=iso-8859-1",
            )
        )
    )
    out = str(tmp_path / "out")
    q = (
        warc_responses_to_documents(
            read_warc_stream(spark, str(d)), charset="sniff"
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    assert [r["html"] for r in rows] == [html]
    # streaming == batch, byte for byte
    batch = warc_responses_to_documents(
        read_warc(spark, str(d)), charset="sniff"
    ).collect()
    assert {(r["doc_id"], r["html"]) for r in rows} == {
        (r["doc_id"], r["html"]) for r in batch
    }


def test_default_decode_is_total_one_bad_page_cannot_kill_the_job(
    tmp_path, spark
):
    """r11 regression: Spark 4's decode(payload,'UTF-8') RAISES
    MALFORMED_CHARACTER_CODING on the first invalid byte, so the old
    default projection crashed the whole ingest on one damaged or
    non-UTF-8 page. The default is now make_valid_utf8 (U+FFFD
    replacement, byte-identical on valid input); charset="sniff"
    recovers the same page losslessly. WET's projection shares the
    hardening."""
    import gzip

    from weather_monitoring_spark.sources.warc import (
        read_warc,
        read_wet,
        warc_responses_to_documents,
        wet_to_documents,
    )

    d = tmp_path / "crawl"
    d.mkdir()
    ok = "<html><p>plain ascii page body</p></html>"
    bad = "<html><p>Café latin-1 page</p></html>"
    (d / "seg.warc.gz").write_bytes(
        gzip.compress(_warc_record("http://ok/1", ok.encode("utf-8")))
        + gzip.compress(
            _warc_record("http://bad/2", bad.encode("windows-1252"))
        )
    )

    # default path: both pages survive, the damaged one carries U+FFFD
    docs = {
        r["url"]: r["html"]
        for r in warc_responses_to_documents(read_warc(spark, str(d))).collect()
    }
    assert docs["http://ok/1"] == ok
    assert docs["http://bad/2"] == bad.replace("é", "�")

    # sniff path: the same page recovered losslessly
    sniffed = {
        r["url"]: r["html"]
        for r in warc_responses_to_documents(
            read_warc(spark, str(d)), charset="sniff"
        ).collect()
    }
    assert sniffed["http://bad/2"] == bad

    # WET twin: a conversion record truncated mid-multibyte must not raise
    w = tmp_path / "wet"
    w.mkdir()
    damaged = "déjà vu".encode("utf-8")[:-1]  # cut inside the last char
    (w / "seg.warc.wet.gz").write_bytes(
        gzip.compress(
            _warc_record("http://t/1", damaged, warc_type="conversion")
        )
    )
    rows = wet_to_documents(read_wet(spark, str(w))).collect()
    assert len(rows) == 1 and rows[0]["text"].startswith("déjà v")


def test_r11_crawl_stack_composes_in_one_streaming_query(tmp_path, spark):
    """Every r11 piece in ONE StreamingQuery: bounded micro-batch
    admission (max_files_per_trigger=1) over a landing directory whose
    segments include a CORRUPT gzip member and a windows-1252 page,
    sniff-decoded in-stream, C4-gated, archived to parquet — damage is
    local, encodings are recovered, and the three files process in
    three micro-batches."""
    import gzip

    from pyspark.sql import functions as F

    from weather_monitoring_spark.operators.quality import c4_rules
    from weather_monitoring_spark.operators.htmlops import extract_html_text
    from weather_monitoring_spark.sources.warc import (
        read_warc_stream,
        warc_responses_to_documents,
    )

    sents = (
        "The café owner said that déjà vu is common in the naïve résumé. "
        "Every document should keep the château accents through the whole "
        "pipeline here. These sentences carry enough plain English words "
        "for the quality gates to keep the page. The archive then stores "
        "each kept page with its identifiers for later auditing. Nothing "
        "about this prose should trip any of the standard content rules."
    )
    html = f"<html><body><p>{sents}</p></body></html>"
    d = tmp_path / "landing"
    d.mkdir()
    # seg0: clean utf-8 page
    (d / "seg0.warc.gz").write_bytes(
        gzip.compress(
            _warc_record("http://utf8/1", html.encode("utf-8"),
                         ctype="text/html; charset=utf-8")
        )
    )
    # seg1: latin-1-declared 1252 page AFTER a corrupt member
    good = gzip.compress(
        _warc_record("http://w1252/2", html.encode("windows-1252"),
                     ctype="text/html; charset=iso-8859-1")
    )
    corrupt = bytearray(
        gzip.compress(_warc_record("http://dead/x", b"<html>lost</html>"))
    )
    for j in range(12, 24):
        corrupt[j] ^= 0xFF
    (d / "seg1.warc.gz").write_bytes(bytes(corrupt) + good)
    # seg2: bare 1252 page (fallback rung)
    (d / "seg2.warc.gz").write_bytes(
        gzip.compress(
            _warc_record("http://bare/3", html.encode("windows-1252"),
                         ctype="text/html")
        )
    )

    batches = []

    def sink(df, epoch_id):
        batches.append(df.collect())

    docs = warc_responses_to_documents(
        read_warc_stream(spark, str(d), max_files_per_trigger=1),
        charset="sniff",
    )
    gated = (
        c4_rules(
            extract_html_text(docs, html_col="html", lines=True).select(
                "doc_id", "text"
            )
        )
        .filter("verdict = 'kept'")
        .select("doc_id", F.col("text_clean").alias("text"))
    )
    q = (
        gated.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert len(batches) >= 3  # one file per micro-batch under the bound
    rows = [r for b in batches for r in b]
    assert len(rows) == 3  # dead/x lost to the corrupt member, rest kept
    texts = {r["text"] for r in rows}
    assert len(texts) == 1  # all three encodings decode identically
    assert "déjà" in next(iter(texts)) and "�" not in next(iter(texts))


def test_curate_crawl_rejects_non_integral_doc_ids_eagerly(spark):
    """r12 (found by the damage property): a string doc_id used to fail
    DEEP in the dedup-cluster stage with CAST_INVALID_INPUT under ANSI;
    the pipeline now rejects it before any job runs."""
    import pytest

    from weather_monitoring_spark.pipelines import curate_crawl

    bad = spark.createDataFrame(
        [("a1", "http://h/1", "some text")],
        "doc_id string, url string, html string",
    )
    with pytest.raises(TypeError, match="doc_id must be an integral type"):
        curate_crawl(bad, min_tokens=1, checkpoint=False)
