"""Stream-stream interval join + watermarked streaming dedup: join
results match the batch formulation on on-time data; dedup state spans
micro-batches within the watermark."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from weather_monitoring_spark.streaming.joins import (
    interval_attribution,
    streaming_dedup,
)

BASE_MS = 1_700_000_000_000

EVENT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
        StructField("ts_ms", LongType()),
    ]
)


def _ev(user: int, eid: int, etype: str, minutes: float) -> str:
    return json.dumps(
        {
            "user_id": user,
            "event_id": eid,
            "event_type": etype,
            "ts_ms": BASE_MS + int(minutes * 60_000),
        }
    )


def _typed(df):
    return df.select(
        "user_id",
        "event_id",
        "event_type",
        F.timestamp_millis(F.col("ts_ms")).alias("ts"),
    )


def test_interval_attribution_matches_batch(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    rows = [
        # user 1: purchase at +40min; clicks at +15 (in), +39 (in),
        # +5 (outside 30-min window), +41 (after purchase -> excluded)
        _ev(1, 100, "purchase", 40),
        _ev(1, 1, "click", 15),
        _ev(1, 2, "click", 39),
        _ev(1, 3, "click", 5),
        _ev(1, 4, "click", 41),
        # user 2: click with no purchase
        _ev(2, 5, "click", 20),
        # user 3: purchase with no clicks
        _ev(3, 101, "purchase", 30),
    ]
    (src / "a.json").write_text("\n".join(rows))

    stream = _typed(spark.readStream.schema(EVENT_SCHEMA).json(str(src)))
    joined = interval_attribution(
        stream.filter(F.col("event_type") == "click"),
        stream.filter(F.col("event_type") == "purchase"),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("attribution_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.purchase_id, r.click_id)
        for r in spark.sql("SELECT * FROM attribution_test").collect()
    }
    assert got == {(1, 100, 1), (1, 100, 2)}

    # Same operator applied to the same frames in batch mode gives the
    # identical pair set — the streaming plan adds state, not semantics.
    batch = _typed(spark.read.schema(EVENT_SCHEMA).json(str(src)))
    batch_pairs = {
        (r.user_id, r.purchase_id, r.click_id)
        for r in interval_attribution(
            batch.filter(F.col("event_type") == "click"),
            batch.filter(F.col("event_type") == "purchase"),
        ).collect()
    }
    assert batch_pairs == got


def _run_dedup(spark, src, ckpt, out):
    stream = _typed(spark.readStream.schema(EVENT_SCHEMA).json(str(src)))
    q = (
        streaming_dedup(stream, keys=("event_id",))
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_streaming_dedup_spans_micro_batches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    # batch 1: event 2 duplicated in-batch
    (src / "b1.json").write_text(
        "\n".join(
            [
                _ev(1, 1, "click", 0),
                _ev(1, 2, "click", 1),
                _ev(1, 2, "click", 2),
            ]
        )
    )
    _run_dedup(spark, src, tmp_path / "ckpt", tmp_path / "out")
    out1 = spark.read.parquet(str(tmp_path / "out"))
    assert sorted(r.event_id for r in out1.collect()) == [1, 2]

    # batch 2 (restart from checkpoint): event 2 re-arrives within the
    # watermark -> dropped by cross-batch state; event 3 is new.
    (src / "b2.json").write_text(
        "\n".join([_ev(1, 2, "click", 3), _ev(1, 3, "click", 4)])
    )
    _run_dedup(spark, src, tmp_path / "ckpt", tmp_path / "out")
    out2 = spark.read.parquet(str(tmp_path / "out"))
    assert sorted(r.event_id for r in out2.collect()) == [1, 2, 3]
