"""End-to-end coverage of the remaining SURVEY §2 inventory: the
archive->index streaming path (S4->S8), the Open-Meteo parser (S9/P13),
CSV export (S12), and the custom stateful live gap detector (T5)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from weather_monitoring_spark.sources.filestream import read_parquet_stream
from weather_monitoring_spark.sources.generator import synthetic_wire_json_batch
from weather_monitoring_spark.sources.openmeteo import parse_current_weather, wire_message
from weather_monitoring_spark.streaming.archive import run_archive_stream, wire_to_canonical
from weather_monitoring_spark.streaming.index_sink import attach_index_sink, fs_bulk_upsert
from weather_monitoring_spark.streaming.latest_view import LatestView
from weather_monitoring_spark.streaming.stateful import live_gap_detector


def test_archive_to_index_streaming_path(spark, tmp_path):
    """The reference's §3.3 analytics path: wire -> parquet archive, then
    the archive directory consumed as a *streaming parquet source* feeding
    the executor-side index sink — two chained checkpointed streams."""
    src = tmp_path / "wire"
    src.mkdir()
    rows = [r.value for r in synthetic_wire_json_batch(spark, 400, seed=11).collect()]
    (src / "a.json").write_text("\n".join(rows))

    archive = str(tmp_path / "archive")
    for q in run_archive_stream(
        spark.readStream.text(str(src)), archive, str(tmp_path / "ck1"),
        trigger={"availableNow": True},
    ):
        q.awaitTermination(120)
    archived = spark.read.parquet(archive)
    n = archived.count()

    stream = read_parquet_stream(spark, archive, archived.schema)
    index_dir = str(tmp_path / "index")
    q = attach_index_sink(
        stream.drop("date", "hour"),
        fs_bulk_upsert(index_dir),
        str(tmp_path / "ck2"),
        trigger={"availableNow": True},
    )
    q.awaitTermination(120)
    docs = [f for f in os.listdir(index_dir) if f.endswith(".json")]
    assert len(docs) == n
    doc = json.load(open(os.path.join(index_dir, docs[0])))
    # P9 doc id + P11 ISO rendering present
    assert doc["doc_id"] == f"{doc['station_id']}_{doc['s_no']}"
    assert doc["status_timestamp_iso"].endswith("Z") and "T" in doc["status_timestamp_iso"]

    # restart the index stream with no new files -> no growth (checkpoint)
    q = attach_index_sink(
        read_parquet_stream(spark, archive, archived.schema).drop("date", "hour"),
        fs_bulk_upsert(index_dir),
        str(tmp_path / "ck2"),
        trigger={"availableNow": True},
    )
    q.awaitTermination(120)
    assert len([f for f in os.listdir(index_dir) if f.endswith(".json")]) == n


def test_openmeteo_parser_and_wire_shape(spark):
    canned = {
        "current": {
            "relative_humidity_2m": 64.4,
            "temperature_2m": 30.6,
            "wind_speed_10m": 12.5,
        }
    }
    w = parse_current_weather(canned)
    assert w == {"humidity": 64, "temperature": 31, "wind_speed": 13}  # P13 rounding
    msg = json.loads(wire_message(w, s_no=5))
    assert msg["stationId"] == 11 and msg["sequenceNumber"] == 5
    assert msg["statusTimestamp"] % 1000 == 0  # P12 epoch-second precision
    # the adapter's output parses through the same ingest path
    df = spark.createDataFrame([(json.dumps(msg),)], ["value"])
    canonical, rejects = wire_to_canonical(df)
    assert canonical.count() == 1 and rejects.count() == 0
    row = canonical.first()
    assert row.weather.humidity == 64 and row.station_id == 11


def test_latest_view_csv_export(spark, tmp_path):
    view = LatestView(spark, str(tmp_path / "view"))
    canonical, _ = wire_to_canonical(synthetic_wire_json_batch(spark, 200, seed=13))
    view.merge_batch(canonical)
    out = str(tmp_path / "csv")
    view.export_csv(out)
    back = spark.read.option("header", "true").csv(out)
    assert back.count() == view.get_all().count()
    assert "weather_humidity" in back.columns  # struct flattened for CSV


def test_live_gap_detector_stateful_across_batches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()

    def msg(station, s_no):
        return json.dumps(
            {
                "stationId": station,
                "sequenceNumber": s_no,
                "batteryStatus": "low",
                "statusTimestamp": 1700000000000 + s_no * 1000,
                "weather": {"humidity": 50, "temperature": 70, "wind_speed": 5},
            }
        )

    def run():
        stream = spark.readStream.text(str(src))
        canonical, _ = wire_to_canonical(stream)
        q = (
            live_gap_detector(canonical)
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "gaps"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: station 1 sequence 1,2,3,6 (gap of 2); station 2 clean
    (src / "b1.json").write_text("\n".join(
        [msg(1, 1), msg(1, 2), msg(1, 3), msg(1, 6), msg(2, 1), msg(2, 2)]
    ))
    run()
    gaps = spark.read.parquet(str(tmp_path / "gaps"))
    assert gaps.count() == 1
    g = gaps.first()
    assert (g.station_id, g.prev_s_no, g.s_no, g.missing) == (1, 3, 6, 2)

    # batch 2: station 2 jumps 2 -> 5: the gap spans the batch boundary,
    # so detecting it proves state survived the restart via checkpoint.
    (src / "b2.json").write_text(msg(2, 5))
    run()
    gaps = spark.read.parquet(str(tmp_path / "gaps"))
    assert gaps.count() == 2
    g2 = gaps.filter(F.col("station_id") == 2).first()
    assert (g2.prev_s_no, g2.s_no, g2.missing) == (2, 5, 2)


def test_kafka_wrapper_capability_detection(spark):
    """No broker/connector in this container: the capability probe must
    say so honestly rather than exploding at plan time."""
    from weather_monitoring_spark.sources.kafka import kafka_available

    assert kafka_available(spark) in (True, False)
    if not kafka_available(spark):
        import pytest

        from weather_monitoring_spark.sources.kafka import read_kafka_stream

        with pytest.raises(Exception, match="kafka"):
            read_kafka_stream(spark, "localhost:9092")


def test_avro_schema_contract_and_wire_path(spark):
    """S-Avro fence: the spark-avro data source is an external package not
    present here, so the wire encode/decode can't execute — what IS
    asserted: (a) the capability probe is honest, (b) the re-expressed
    Avro schema matches the reference's WeatherStatus.avsc contract
    field-for-field (names, types, enum symbols, timestamp-millis), and
    (c) when the package IS loaded, a canonical batch round-trips
    to_avro_wire -> from_avro_wire unchanged."""
    from weather_monitoring_spark.sources.avro import (
        WEATHER_STATUS_AVSC,
        avro_available,
        from_avro_wire,
        to_avro_wire,
    )

    fields = {f["name"]: f["type"] for f in WEATHER_STATUS_AVSC["fields"]}
    assert list(fields) == [
        "station_id", "s_no", "battery_status", "status_timestamp", "weather",
    ]  # WeatherStatus.avsc:1-26
    assert fields["station_id"] == "long" and fields["s_no"] == "long"
    assert fields["battery_status"]["symbols"] == ["low", "medium", "high"]
    assert fields["status_timestamp"]["logicalType"] == "timestamp-millis"
    assert [f["name"] for f in fields["weather"]["fields"]] == [
        "humidity", "temperature", "wind_speed",
    ]

    if not avro_available(spark):
        return  # honest fence: no spark-avro jar in this container

    from pyspark.sql import functions as F

    from weather_monitoring_spark.operators.core import normalize_wire
    from weather_monitoring_spark.sources.generator import synthetic_wire_batch

    canonical = normalize_wire(synthetic_wire_batch(spark, 50, with_drops=False))
    back = from_avro_wire(to_avro_wire(canonical))
    a = sorted(map(str, canonical.select(*back.columns).collect()))
    b = sorted(map(str, back.collect()))
    assert a == b


def test_kafka_and_file_parse_paths_are_identical(spark, tmp_path):
    """S1 fence: no broker exists in this sandbox, so the Kafka source
    can't execute here — this proves the downstream ingest transform is
    byte-identical across transports instead. The same wire values are
    fed once in the exact frame shape read_kafka_stream produces
    (key/value/topic/partition/offset/kafka_timestamp) and once via the
    file source; wire_to_canonical must yield identical canonical rows
    and identical rejects, so swapping the transport in deployment
    changes nothing downstream (the DataFrame algebra is
    source-agnostic by construction)."""
    from pyspark.sql import functions as F

    from weather_monitoring_spark.sources.generator import synthetic_wire_batch
    from weather_monitoring_spark.sources.kafka import WEATHER_TOPIC
    from weather_monitoring_spark.streaming.archive import wire_to_canonical

    wire = synthetic_wire_batch(spark, 200, with_drops=False)
    values = wire.select(
        F.col("stationId").cast("string").alias("key"),  # WeatherStation.java:58-62
        F.to_json(F.struct("*")).alias("value"),
    )
    malformed = spark.createDataFrame(
        [("bad", "{not json"), ("bad2", '{"stationId": null}')], ["key", "value"]
    )
    values = values.unionByName(malformed)

    kafka_shape = values.select(
        "key",
        "value",
        F.lit(WEATHER_TOPIC).alias("topic"),
        F.lit(0).alias("partition"),
        F.monotonically_increasing_id().alias("offset"),
        F.current_timestamp().alias("kafka_timestamp"),
    )
    src = tmp_path / "wire_text"
    values.select("value").coalesce(1).write.mode("overwrite").text(str(src))
    file_shape = spark.read.text(str(src))

    canon_k, rejects_k = wire_to_canonical(kafka_shape)
    canon_f, rejects_f = wire_to_canonical(file_shape)
    rows_k = sorted(map(str, canon_k.collect()))
    rows_f = sorted(map(str, canon_f.collect()))
    assert rows_k == rows_f and len(rows_k) == 200
    assert rejects_k.count() == rejects_f.count() == 2


def test_jsonl_source_splits_valid_and_rejects(tmp_path, spark):
    """Batch JSONL corpus loading: parse failures and contract violations
    route to rejects (queryable, raw line kept); valid rows carry the
    documents contract and feed the corpus operators directly."""
    from weather_monitoring_spark.sources.jsonl import read_jsonl_documents

    src = tmp_path / "drop"
    src.mkdir()
    (src / "part-0.jsonl").write_text(
        "\n".join(
            [
                '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "src1", "n_chars": 11}',
                '{"doc_id": 2, "text": "more text", "lang": "en", "source": "src1", "n_chars": 9}',
                '{"doc_id": 3, "lang": "en", "source": "src1", "n_chars": 0}',  # no text
                "{not json at all",  # corrupt line
            ]
        )
    )
    valid, rejects = read_jsonl_documents(spark, str(src))
    v = {r.doc_id: r for r in valid.collect()}
    assert set(v) == {1, 2}
    assert v[1].text == "hello world" and v[1].n_chars == 11
    assert "_corrupt_record" not in valid.columns
    rej = rejects.collect()
    assert len(rej) == 2
    raws = {r["_corrupt_record"] for r in rej}
    assert "{not json at all" in raws  # raw line kept for forensics

    # valid feeds the corpus operators unchanged
    from weather_monitoring_spark.operators.training_prep import chunk_documents

    assert chunk_documents(valid).count() >= 2


def test_csv_source_splits_valid_and_rejects(tmp_path, spark):
    """Batch CSV corpus loading mirrors the JSONL path: schema violations
    route to rejects with the raw line kept; valid rows carry the
    documents contract."""
    from weather_monitoring_spark.sources.csv import read_csv_documents

    src = tmp_path / "drop"
    src.mkdir()
    (src / "part-0.csv").write_text(
        "\n".join(
            [
                "doc_id,text,lang,source,n_chars",
                '1,"hello world",en,src1,11',
                '2,"quoted, comma",en,src1,13',
                'notanumber,"bad id",en,src1,6',  # doc_id fails the schema
                ',missing id,en,src1,10',  # required column null
            ]
        )
    )
    valid, rejects = read_csv_documents(spark, str(src))
    v = {r.doc_id: r for r in valid.collect()}
    assert set(v) == {1, 2}
    assert v[2].text == "quoted, comma"  # quoted delimiter survives
    assert "_corrupt_record" not in valid.columns
    rej = rejects.collect()
    assert len(rej) == 2
    assert any(
        r["_corrupt_record"] and "notanumber" in r["_corrupt_record"] for r in rej
    )


def test_binary_asset_source_feeds_multimodal(tmp_path, spark):
    """binaryFile scan -> asset contract -> decode operators: the real
    multimodal ingestion path. Kind derives from extension, asset_id is
    a path digest (stable across re-listing), glob prunes at listing."""
    from weather_monitoring_spark.operators.multimodal import decode_images
    from weather_monitoring_spark.sources.binary import read_binary_assets

    d = tmp_path / "assets"
    d.mkdir()
    (d / "a.png").write_bytes(bytes(range(64)))
    (d / "b.jpg").write_bytes(bytes(range(32)))
    (d / "c.wav").write_bytes(b"audio-bytes-here")
    (d / "d.txt").write_bytes(b"not media")

    assets = read_binary_assets(spark, str(d))
    rows = {r.meta.source.rsplit("/", 1)[-1]: r for r in assets.collect()}
    assert set(rows) == {"a.png", "b.jpg", "c.wav", "d.txt"}
    assert rows["a.png"].kind == "image" and rows["c.wav"].kind == "audio"
    assert rows["d.txt"].kind == "other"
    assert rows["b.jpg"].meta.n_bytes == 32
    assert bytes(rows["a.png"].payload) == bytes(range(64))
    # ids survive re-listing (content-addressed from path, no zipWithIndex)
    again = {r.meta.source.rsplit("/", 1)[-1]: r.asset_id for r in
             read_binary_assets(spark, str(d)).collect()}
    assert all(again[k] == rows[k].asset_id for k in rows)

    # glob prunes at listing time: only the png is read
    only_png = read_binary_assets(spark, str(d), glob="*.png").collect()
    assert [r.kind for r in only_png] == ["image"]

    # the decode operator consumes the contract directly
    decoded = decode_images(assets).collect()
    assert {r.asset_id for r in decoded} == {
        r.asset_id for r in assets.filter("kind = 'image'").collect()
    }
    assert all(64 <= r.width < 256 and len(r.feature) == 8 for r in decoded)


def _warc_record(
    uri: str,
    body: bytes,
    warc_type: str = "response",
    status: int = 200,
    ctype: str | None = "text/html",
) -> bytes:
    """Minimal spec-shaped WARC 1.0 record (CRLF discipline, exact
    Content-Length, double-CRLF separator). ``ctype=None`` on a
    response omits the HTTP Content-Type header entirely (a real-crawl
    shape the parser must map to NULL, not the WARC envelope type)."""
    if warc_type == "response":
        ct_line = f"Content-Type: {ctype}\r\n" if ctype is not None else ""
        http = (
            f"HTTP/1.1 {status} OK\r\n{ct_line}"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body
    else:
        http = body
    envelope_ct = {
        "response": "application/http; msgtype=response",
        "conversion": "text/plain",
    }.get(warc_type, "application/warc-fields")
    hdr = (
        "WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Record-ID: <urn:uuid:{abs(hash((uri, warc_type))):032x}>\r\n"
        f"WARC-Date: 2026-08-15T00:00:00Z\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"Content-Type: {envelope_ct}\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode()
    return hdr + http + b"\r\n\r\n"


def test_warc_source_parses_plain_and_gzip_members(tmp_path, spark):
    """binaryFile scan -> mapInPandas WARC parse: record fields, HTTP
    split, per-record-gzip members (the Common Crawl layout), path-digest
    id stability, and listing-time glob pruning."""
    import gzip

    from weather_monitoring_spark.sources.warc import read_warc

    d = tmp_path / "crawl"
    d.mkdir()
    recs = [
        _warc_record("urn:none", b"software: test\r\n", warc_type="warcinfo"),
        _warc_record("http://a.example/x", b"<html>page A body here</html>"),
        _warc_record("http://b.example/y", b"<html>page B body here</html>",
                     status=404),
        _warc_record("http://c.example/z", b"GET /z HTTP/1.1",
                     warc_type="request"),
    ]
    (d / "seg0.warc").write_bytes(b"".join(recs))
    # same records as per-member gzip (how CC ships)
    (d / "seg1.warc.gz").write_bytes(
        b"".join(gzip.compress(r) for r in recs)
    )
    (d / "notes.txt").write_bytes(b"not a warc")

    rows = read_warc(spark, str(d)).collect()
    by = {}
    for r in rows:
        by.setdefault(r.source.rsplit("/", 1)[-1], []).append(r)
    assert set(by) == {"seg0.warc", "seg1.warc.gz"}
    for fname in by:
        rs = sorted(by[fname], key=lambda r: r.record_offset)
        assert [r.warc_type for r in rs] == [
            "warcinfo", "response", "response", "request"
        ]
        a = rs[1]
        assert a.target_uri == "http://a.example/x"
        assert a.http_status == 200 and a.content_type == "text/html"
        assert bytes(a.payload) == b"<html>page A body here</html>"
        assert a.n_bytes == len(a.payload)
        assert rs[2].http_status == 404
        assert rs[3].http_status is None  # request: no HTTP response split

    # gzip members decode to the same bytes -> same offsets after gunzip
    assert [r.record_offset for r in sorted(by["seg0.warc"], key=lambda r: r.record_offset)] == [
        r.record_offset for r in sorted(by["seg1.warc.gz"], key=lambda r: r.record_offset)
    ]
    # ids are path#offset digests: stable across re-listing
    again = {(r.source, r.record_offset): r.asset_id
             for r in read_warc(spark, str(d)).collect()}
    assert all(again[(r.source, r.record_offset)] == r.asset_id for r in rows)
    # glob prunes: only the plain .warc file is ever opened
    only_plain = read_warc(spark, str(d), glob="*.warc").collect()
    assert {r.source.rsplit("/", 1)[-1] for r in only_plain} == {"seg0.warc"}


def test_warc_responses_feed_curate_crawl(tmp_path, spark):
    """WARC -> documents contract -> the composed curation front door:
    2xx HTML responses only, decoded JVM-side, ids/urls threaded."""
    from weather_monitoring_spark.pipelines import curate_crawl
    from weather_monitoring_spark.sources.warc import (
        read_warc,
        warc_responses_to_documents,
    )

    d = tmp_path / "crawl2"
    d.mkdir()
    body = (
        "<html><body><p>"
        + " ".join(f"curated word {i} of the page." for i in range(30))
        + "</p></body></html>"
    ).encode()
    recs = [
        _warc_record("urn:none", b"software: t\r\n", warc_type="warcinfo"),
        _warc_record("http://ok.example/1", body),
        _warc_record("http://ok.example/1", body),  # exact re-crawl dup
        _warc_record("http://gone.example/2", b"<html>gone</html>", status=404),
    ]
    (d / "s.warc").write_bytes(b"".join(recs))

    docs = warc_responses_to_documents(read_warc(spark, str(d)))
    got = docs.collect()
    assert {r.url for r in got} == {"http://ok.example/1"}
    assert len(got) == 2 and all("curated word" in r.html for r in got)

    stages = curate_crawl(docs, min_tokens=5, checkpoint=False)
    assert stages.curated.count() == 1  # URL dedup collapses the re-crawl


def test_warc_parser_tolerates_malformed_input(tmp_path, spark):
    """Crawl-scale ingest sees damage: truncated gzip members keep what
    decoded; junk between records is skipped to the next WARC/ magic;
    a bad Content-Length header degrades to an empty block instead of
    raising; and a 0-byte / non-WARC file parses to zero records."""
    import gzip

    from weather_monitoring_spark.sources.warc import read_warc

    d = tmp_path / "damaged"
    d.mkdir()
    good = _warc_record("http://ok.example/a", b"<html>fine page body</html>")
    # junk between records + a record with a garbage Content-Length
    bad_len = good.replace(b"Content-Length: ", b"Content-Length: x", 1)
    (d / "mixed.warc").write_bytes(
        b"JUNKJUNK" + good + b"garbage bytes here" + good
    )
    (d / "badlen.warc").write_bytes(bad_len + good)
    # truncated second gzip member: first member still parses
    gz = gzip.compress(good)
    (d / "trunc.warc.gz").write_bytes(gz + gzip.compress(good)[: len(gz) // 2])
    (d / "empty.warc").write_bytes(b"")
    (d / "notwarc.warc").write_bytes(b"this is not a warc file at all")

    rows = read_warc(spark, str(d)).collect()
    by = {}
    for r in rows:
        by.setdefault(r.source.rsplit("/", 1)[-1], []).append(r)
    assert len(by.get("mixed.warc", [])) == 2  # both records found past junk
    assert all(
        bytes(r.payload) == b"<html>fine page body</html>"
        for r in by["mixed.warc"]
    )
    # bad Content-Length record degrades (length 0) and the NEXT record
    # is still found via the magic scan
    assert len(by.get("badlen.warc", [])) == 2
    assert any(r.n_bytes == len(b"<html>fine page body</html>") for r in by["badlen.warc"])
    assert len(by.get("trunc.warc.gz", [])) == 1  # first member survives
    assert "empty.warc" not in by or by["empty.warc"] == []
    assert "notwarc.warc" not in by or by["notwarc.warc"] == []


def test_warc_streaming_source_is_incremental_and_matches_batch(tmp_path, spark):
    """read_warc_stream: segment files landing in a directory parse
    incrementally (file-source log = exactly-once across triggers) and
    produce EXACTLY the batch reader's rows; the documents projection
    composes unchanged on the stream."""
    import gzip

    from weather_monitoring_spark.sources.warc import (
        read_warc,
        read_warc_stream,
        warc_responses_to_documents,
    )

    d = tmp_path / "landing"
    d.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def seg(name, uris):
        recs = b"".join(
            gzip.compress(_warc_record(u, f"<html>{u} body</html>".encode()))
            for u in uris
        )
        (d / name).write_bytes(recs)

    seg("seg0.warc.gz", ["http://a/1", "http://a/2"])

    def run_trigger():
        q = (
            warc_responses_to_documents(read_warc_stream(spark, str(d)))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_trigger()
    first = {r["url"] for r in spark.read.parquet(out).collect()}
    assert first == {"http://a/1", "http://a/2"}

    # a new segment lands; the SAME checkpoint ingests only the new file
    seg("seg1.warc.gz", ["http://b/3"])
    run_trigger()
    rows = spark.read.parquet(out).collect()
    assert {r["url"] for r in rows} == {"http://a/1", "http://a/2", "http://b/3"}
    assert len(rows) == 3  # no re-ingestion of seg0

    # streaming rows == batch rows (ids, payload-derived html)
    batch = {
        (r["doc_id"], r["url"], r["html"])
        for r in warc_responses_to_documents(read_warc(spark, str(d))).collect()
    }
    assert {(r["doc_id"], r["url"], r["html"]) for r in rows} == batch


def test_streaming_crawl_front_door_end_to_end(tmp_path, spark):
    """The live-crawl composition: WARC segments landing -> streaming
    parse -> documents -> line-structured extraction -> mojibake repair
    -> C4 + Gopher-repetition gates -> partitioned parquet archive, all
    inside ONE StreamingQuery (every stage is the same operator the
    batch pipeline uses — projections are streaming-safe by
    construction)."""
    import gzip

    from pyspark.sql import functions as F

    from weather_monitoring_spark.operators.htmlops import extract_html_text
    from weather_monitoring_spark.operators.quality import (
        c4_rules,
        gopher_repetition_rules,
    )
    from weather_monitoring_spark.operators.textops import mojibake_fixed_col
    from weather_monitoring_spark.sources.warc import (
        read_warc_stream,
        warc_responses_to_documents,
    )

    d = tmp_path / "landing"
    d.mkdir()
    out = str(tmp_path / "archive")
    ckpt = str(tmp_path / "ckpt")

    # six sentences with fully DISTINCT token sets: templated
    # sentences share 5-grams across the page and the repetition gate
    # (correctly) flags them — which is its own planted class below
    sents = [
        "Alpha bravo charlie delta echoes foxtrot.",
        "Golf hotel india juliet kilo lima.",
        "Mike november oscar papa quebec romeo.",
        "Sierra tango uniform victor whiskey xray.",
        "Yankee zulu amber bronze copper dusk.",
        "Ember falcon garnet harbor iris jade.",
    ]
    prose = "".join(f"<p>{x}</p>" for x in sents)
    pages = {
        "http://ok/1": f"<html><body>{prose}</body></html>",
        "http://moji/2": f"<html><body><p>He said â€œgoâ€\x9d now.</p>{prose}</body></html>",
        "http://rep/3": "<html><body>"
        + "<p>The same paragraph returns again.</p>" * 9
        + "</body></html>",
        "http://brace/4": f"<html><body><p>code {{x}} here.</p>{prose}</body></html>",
    }
    (d / "seg0.warc.gz").write_bytes(
        b"".join(
            gzip.compress(_warc_record(u, h.encode()))
            for u, h in pages.items()
        )
    )

    docs = warc_responses_to_documents(read_warc_stream(spark, str(d)))
    extracted = extract_html_text(docs, html_col="html", lines=True).select(
        "doc_id", mojibake_fixed_col(F.col("text")).alias("text")
    )
    gated = (
        c4_rules(extracted)
        .filter("verdict = 'kept'")
        .select("doc_id", F.col("text_clean").alias("text"))
    )
    gated = (
        gopher_repetition_rules(gated, carry=("text",))
        .filter("verdict = 'kept'")
        .select("doc_id", "text")
    )
    q = (
        gated.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    # availableNow terminates on its own; block until it does (the
    # timed variant can return while the batch is still running)
    q.awaitTermination()
    rows = spark.read.parquet(out).collect()
    texts = {r["text"] for r in rows}
    assert len(rows) == 2  # rep/3 (repetition) and brace/4 (c4) dropped
    assert any("“go”" in t for t in texts)  # repaired in-stream
    assert all("{" not in t for t in texts)


def test_warc_parse_yields_per_file_and_per_chunk(monkeypatch):
    """The archive-scale memory shape, asserted directly on the parser:
    two files arriving in ONE Arrow batch yield (at least) two separate
    DataFrames — a task never holds every file's decompressed records in
    one list — and a file longer than WARC_YIELD_RECORDS flushes in
    chunks."""
    import pandas as pd

    from weather_monitoring_spark.sources import warc as W

    f1 = b"".join(
        _warc_record(f"http://a/{i}", b"<html>aa</html>") for i in range(3)
    )
    f2 = b"".join(
        _warc_record(f"http://b/{i}", b"<html>bb</html>") for i in range(5)
    )
    batch = pd.DataFrame({"path": ["f1", "f2"], "content": [f1, f2]})

    frames = list(W._make_parse_batches()([batch]))
    assert len(frames) == 2  # one per file, never one list for the batch
    assert [len(f) for f in frames] == [3, 5]

    monkeypatch.setattr(W, "WARC_YIELD_RECORDS", 2)
    frames = list(W._make_parse_batches()([batch]))
    # f1: 2+1, f2: 2+2+1 — chunk flushes inside each file
    assert [len(f) for f in frames] == [2, 1, 2, 2, 1]
    got = pd.concat(frames)["target_uri"].tolist()
    assert got == [f"http://a/{i}" for i in range(3)] + [
        f"http://b/{i}" for i in range(5)
    ]


def test_warc_missing_http_content_type_is_null_and_kept(tmp_path, spark):
    """A 2xx response whose HTTP headers lack Content-Type must surface
    content_type NULL (unknown) — NOT inherit the WARC envelope's
    'application/http; msgtype=response', which fails contains('html')
    and silently drops the page from the documents projection."""
    from weather_monitoring_spark.sources.warc import (
        read_warc,
        warc_responses_to_documents,
    )

    d = tmp_path / "noct"
    d.mkdir()
    recs = [
        _warc_record("http://noct.example/a", b"<html>page body</html>",
                     ctype=None),
        _warc_record("http://html.example/b", b"<html>another page</html>"),
        _warc_record("http://img.example/c", b"\x89PNG fake",
                     ctype="image/png"),
    ]
    (d / "s.warc").write_bytes(b"".join(recs))

    rows = {r.target_uri: r for r in read_warc(spark, str(d)).collect()}
    assert rows["http://noct.example/a"].content_type is None
    assert rows["http://html.example/b"].content_type == "text/html"
    assert rows["http://img.example/c"].content_type == "image/png"

    docs = warc_responses_to_documents(read_warc(spark, str(d))).collect()
    # NULL-type page KEPT (unknown = keep), png dropped
    assert {r.url for r in docs} == {
        "http://noct.example/a", "http://html.example/b"
    }


def test_warc_responses_only_pushes_keep_predicate_into_parse(tmp_path, spark):
    """responses_only=True drops non-kept records' payload bytes inside
    the parse; the surviving rows are EXACTLY what the documents
    projection keeps on a full read."""
    from weather_monitoring_spark.sources.warc import (
        read_warc,
        warc_responses_to_documents,
    )

    d = tmp_path / "ro"
    d.mkdir()
    recs = [
        _warc_record("urn:none", b"software: t\r\n", warc_type="warcinfo"),
        _warc_record("http://ok/1", b"<html>keep me</html>"),
        _warc_record("http://gone/2", b"<html>404 page</html>", status=404),
        _warc_record("http://img/3", b"bytes", ctype="image/png"),
        _warc_record("http://noct/4", b"<html>no ctype</html>", ctype=None),
        _warc_record("http://req/5", b"GET / HTTP/1.1", warc_type="request"),
    ]
    (d / "s.warc").write_bytes(b"".join(recs))

    pushed = read_warc(spark, str(d), responses_only=True)
    got = {r.target_uri for r in pushed.collect()}
    assert got == {"http://ok/1", "http://noct/4"}
    # identical documents either way (projection is a no-op on pushed)
    full = warc_responses_to_documents(read_warc(spark, str(d)))
    a = {(r.doc_id, r.url, r.html) for r in full.collect()}
    b = {
        (r.doc_id, r.url, r.html)
        for r in warc_responses_to_documents(pushed).collect()
    }
    assert a == b


def test_wet_source_feeds_curate_crawl_pre_extracted(tmp_path, spark):
    """WET path end-to-end: conversion records (extraction pre-done) ->
    wet_to_documents -> curate_crawl(pre_extracted=True) with the
    extraction stage skipped; line structure survives so the C4 line
    gate operates on real lines."""
    import gzip

    from weather_monitoring_spark.pipelines import curate_crawl
    from weather_monitoring_spark.sources.warc import (
        read_wet,
        wet_to_documents,
    )

    d = tmp_path / "wet"
    d.mkdir()
    prose = "\n".join(
        f"This is useful sentence number {i} of the page body." for i in range(8)
    )
    noise = prose + "\nshort line\n" + prose.replace("page", "site")
    recs = [
        _warc_record("urn:none", b"software: t\r\n", warc_type="warcinfo"),
        _warc_record("http://a.example/1", noise.encode(),
                     warc_type="conversion"),
        _warc_record("http://b.example/2", prose.encode(),
                     warc_type="conversion"),
    ]
    (d / "seg.warc.wet.gz").write_bytes(
        b"".join(gzip.compress(r) for r in recs)
    )

    docs = wet_to_documents(read_wet(spark, str(d)))
    got = {r.url: r.text for r in docs.collect()}
    assert set(got) == {"http://a.example/1", "http://b.example/2"}
    assert "\n" in got["http://a.example/1"]  # line structure intact

    stages = curate_crawl(
        docs, min_tokens=5, checkpoint=False, pre_extracted=True,
        c4_kwargs={},
    )
    kept = {r.doc_id for r in stages.curated.select("doc_id").collect()}
    assert len(kept) == 2
    # the C4 line gate saw real lines: 'short line' dies, sentences stay
    texts = {r.text for r in stages.curated.collect()}
    assert all("short line" not in t for t in texts)


def test_wet_streaming_source_matches_batch(tmp_path, spark):
    """read_wet_stream: WET segments landing in a directory parse
    incrementally and produce exactly the batch reader's document rows
    through wet_to_documents."""
    import gzip

    from weather_monitoring_spark.sources.warc import (
        read_wet,
        read_wet_stream,
        wet_to_documents,
    )

    d = tmp_path / "wet_landing"
    d.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    prose = "\n".join(f"Useful sentence {i} sits here." for i in range(6))
    (d / "seg0.warc.wet.gz").write_bytes(
        gzip.compress(
            _warc_record("http://w/1", prose.encode(), warc_type="conversion")
        )
    )
    q = (
        wet_to_documents(read_wet_stream(spark, str(d)))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    stream_rows = {
        (r["doc_id"], r["url"], r["text"])
        for r in spark.read.parquet(out).collect()
    }
    batch_rows = {
        (r["doc_id"], r["url"], r["text"])
        for r in wet_to_documents(read_wet(spark, str(d))).collect()
    }
    assert stream_rows == batch_rows and len(stream_rows) == 1


def test_warc_record_straddling_gzip_members_parses_identically(spark, tmp_path):
    """The incremental parser's buffered pull: WARC spec allows ANY
    member split, so a record whose bytes straddle gzip member
    boundaries (split mid-header and mid-body) must parse identically
    to the unsplit file — same fields, same decompressed-stream
    offsets, same content-addressed ids."""
    import gzip

    from weather_monitoring_spark.sources.warc import read_warc

    rec1 = _warc_record("http://a/1", b"<html>first page body</html>")
    rec2 = _warc_record("http://a/2", b"<html>second page body</html>")
    blob = rec1 + rec2
    d = tmp_path / "straddle"
    d.mkdir()
    (d / "whole.warc").write_bytes(blob)
    # split points: inside rec1's WARC header, inside rec1's body,
    # exactly at the record boundary, inside rec2's body
    cuts = [10, len(rec1) // 2, len(rec1), len(rec1) + len(rec2) // 2]
    parts = [blob[a:b] for a, b in zip([0] + cuts, cuts + [len(blob)])]
    (d / "split.warc.gz").write_bytes(
        b"".join(gzip.compress(p) for p in parts)
    )

    rows = read_warc(spark, str(d)).collect()
    by = {}
    for r in rows:
        by.setdefault(r.source.rsplit("/", 1)[-1], []).append(r)
    whole = sorted(by["whole.warc"], key=lambda r: r.record_offset)
    split = sorted(by["split.warc.gz"], key=lambda r: r.record_offset)
    assert len(whole) == len(split) == 2
    # field-for-field equality modulo source path (asset ids hash the
    # path, so they differ across files BY DESIGN — the offset half of
    # the id construction is what must agree)
    strip = lambda r: (r.record_offset, r.warc_type, r.target_uri,
                       r.http_status, r.content_type, bytes(r.payload))
    assert [strip(r) for r in whole] == [strip(r) for r in split]


def test_warc_parse_survives_buffer_compaction_threshold():
    """Regression for the r10 self-review finding: buffer compaction
    firing INSIDE the body-fill loop shifted buf out from under the
    captured body_start/hdr_end (corrupted payloads, skipped records)
    once the parse cursor passed 8 MiB. This fixture crosses the
    threshold in both paths: ~15 MiB of 5 MiB-body records parsed plain
    (compaction between records) and as two gzip members whose boundary
    falls INSIDE the third record's body after the threshold (the
    body-fill compaction case)."""
    import gzip
    import hashlib

    from weather_monitoring_spark.sources import warc as W

    recs = [
        _warc_record("http://big/%d" % i, (b"B%d|" % i) * (5 * 1024 * 1024 // 4))
        for i in range(3)
    ]
    recs.append(_warc_record("http://tail/x", b"<html>tail body</html>"))
    blob = b"".join(recs)

    def strip(r):
        return (
            r["record_offset"],
            r["target_uri"],
            r["n_bytes"],
            hashlib.md5(r["payload"]).hexdigest(),
        )

    plain = [strip(r) for r in W._parse_warc("p", blob)]
    assert len(plain) == 4
    cut = 12 * 1024 * 1024  # inside record 3's body, past the threshold
    gz = gzip.compress(blob[:cut], 1) + gzip.compress(blob[cut:], 1)
    inc = [strip(r) for r in W._parse_warc("p", gz)]
    assert inc == plain


def test_plain_warc_feeds_parse_buffer_in_bounded_slices(monkeypatch):
    """r11 (advisor): the uncompressed path feeds the sliding buffer in
    <= _GUNZIP_MAX_OUT memoryview slices (was one whole-file extend =
    ~2x file peak). Shrinking the slice bound to 64 bytes forces every
    header and body to straddle slice boundaries; rows must be
    byte-identical to the unsliced parse, and the buffer must actually
    stay bounded (compaction trims the consumed prefix)."""
    import hashlib

    from weather_monitoring_spark.sources import warc as W

    recs = [
        _warc_record("urn:none", b"software: t\r\n", warc_type="warcinfo"),
        _warc_record("http://a/1", b"<html>" + b"A" * 500 + b"</html>"),
        _warc_record("http://b/2", b"<html>tiny</html>", status=404),
        _warc_record("http://c/3", b"GET / HTTP/1.1", warc_type="request"),
    ]
    blob = b"".join(recs)

    def strip(r):
        return (
            r["record_offset"],
            r["warc_type"],
            r["target_uri"],
            r["http_status"],
            r["n_bytes"],
            hashlib.md5(r["payload"]).hexdigest(),
        )

    whole = [strip(r) for r in W._parse_warc("p", blob)]
    assert len(whole) == 4

    monkeypatch.setattr(W, "_GUNZIP_MAX_OUT", 64)
    slices = list(W._iter_plain_chunks(blob))
    assert all(len(s) <= 64 for s in slices)
    assert b"".join(bytes(s) for s in slices) == blob
    sliced = [strip(r) for r in W._parse_warc("p", blob)]
    assert sliced == whole

    # responses_only pushes the keep predicate through the sliced path too
    kept = [strip(r) for r in W._parse_warc("p", blob, responses_only=True)]
    assert kept == [whole[1]]


def test_warc_stream_max_files_per_trigger_bounds_microbatches(tmp_path, spark):
    """r11 (verdict #3): a multi-file drop must process in >1
    micro-batch under max_files_per_trigger (the catch-up-restart
    guard: without the bound, the FIRST trigger of a restart ingests
    every pending ~1 GB segment at once). Total rows and ids stay
    identical to the batch reader."""
    import gzip

    from weather_monitoring_spark.sources.warc import (
        read_warc,
        read_warc_stream,
    )

    d = tmp_path / "landing"
    d.mkdir()
    for i in range(3):
        (d / f"seg{i}.warc.gz").write_bytes(
            gzip.compress(
                _warc_record(f"http://s{i}/p", f"<html>seg {i}</html>".encode())
            )
        )

    batch_sizes = []

    def sink(df, epoch_id):
        batch_sizes.append(df.count())

    q = (
        read_warc_stream(spark, str(d), max_files_per_trigger=1)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # availableNow honors maxFilesPerTrigger: one file per micro-batch
    assert len(batch_sizes) >= 3
    assert sum(batch_sizes) == 3
    assert read_warc(spark, str(d)).count() == 3


def test_warc_corrupt_gzip_member_costs_records_not_the_job(tmp_path, spark):
    """r11 (the decode-hardening class): a corrupt gzip member used to
    raise zlib.error out of the parse task — one damaged member in a
    100 TB crawl killed the whole job. The decompressors now yield what
    decoded and RESYNC at the next member's magic, so damage is local:
    records in intact members all survive, nothing raises."""
    import gzip

    from weather_monitoring_spark.sources import warc as W

    recs = [
        _warc_record(f"http://m/{i}", f"<html>member {i} body</html>".encode())
        for i in range(4)
    ]
    members = [gzip.compress(r, compresslevel=1) for r in recs]

    # shape 1: garbage deflate bytes mid-member (raises mid-stream)
    bad = bytearray(members[1])
    for j in range(12, min(28, len(bad))):
        bad[j] ^= 0xFF
    blob1 = members[0] + bytes(bad) + members[2] + members[3]

    # shape 2: flipped CRC trailer (raises at member end, after output)
    bad2 = bytearray(members[2])
    bad2[-5] ^= 0xFF
    blob2 = members[0] + members[1] + bytes(bad2) + members[3]

    for blob, must_survive in (
        (blob1, {"http://m/0", "http://m/2", "http://m/3"}),
        (blob2, {"http://m/0", "http://m/1", "http://m/3"}),
    ):
        rows = list(W._parse_warc("p", bytes(blob)))  # must not raise
        uris = {r["target_uri"] for r in rows}
        assert must_survive <= uris
        # the eager member iterator shares the contract
        raw = W._gunzip_members(bytes(blob))
        assert all(u.rsplit("/", 1)[-1].encode() in raw
                   for u in must_survive)

    # end-to-end through Spark: the damaged file still loads
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "dmg.warc.gz").write_bytes(blob1)
    got = {r.target_uri for r in W.read_warc(spark, str(d)).collect()}
    assert {"http://m/0", "http://m/2", "http://m/3"} <= got


def test_giant_status_line_cannot_overflow_the_parse(tmp_path, spark):
    """r12 (self-found, the charset=hex class): a crawled response whose
    HTTP status line carries a giant digit run (isdigit() accepts any
    length) used to overflow the int32 http_status field inside the
    Arrow conversion — one malicious page killing the parse task. It
    must parse as status-unknown (NULL) instead; sane statuses are
    untouched."""
    from weather_monitoring_spark.sources import warc as W
    from weather_monitoring_spark.sources.warc import read_warc

    big = _warc_record("http://h/big", b"body", status=200)
    # splice an oversized status into the HTTP line
    big = big.replace(b"HTTP/1.1 200 OK", b"HTTP/1.1 99999999999999999999 OK")
    ok = _warc_record("http://h/ok", b"body", status=204)
    blob = big + ok

    rows = list(W._parse_warc("p", blob))
    by_uri = {r["target_uri"]: r for r in rows}
    assert by_uri["http://h/big"]["http_status"] is None
    assert by_uri["http://h/ok"]["http_status"] == 204

    (tmp_path / "s.warc").write_bytes(blob)
    got = {
        r["target_uri"]: r["http_status"]
        for r in read_warc(spark, str(tmp_path), glob="*.warc").collect()
    }
    assert got == {"http://h/big": None, "http://h/ok": 204}
