"""T4 extension tests: event-time windowed aggregation with watermarks —
finalized-window emission, late-data dropping across checkpointed
restarts, session windows."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from weather_monitoring_spark.streaming.archive import wire_to_canonical
from weather_monitoring_spark.streaming.windows import session_rollup, tumbling_rollup

BASE_MS = 1_700_000_000_000  # aligned to an hour boundary? (validated below)


def _msg(station: int, s_no: int, ts_ms: int, humidity: int = 50) -> str:
    return json.dumps(
        {
            "stationId": station,
            "sequenceNumber": s_no,
            "batteryStatus": "low",
            "statusTimestamp": ts_ms,
            "weather": {"humidity": humidity, "temperature": 70, "wind_speed": 5},
        }
    )


def _run_window_batch(spark, src_dir, ckpt, out_dir):
    stream = spark.readStream.text(str(src_dir))
    canonical, _ = wire_to_canonical(stream)
    q = (
        tumbling_rollup(canonical, width="1 hour", watermark="30 minutes")
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_tumbling_watermark_drops_late_rows(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    hour = 3_600_000
    # batch 1: full hour H0 + one row in H2 (advances watermark past H0+30min)
    rows = [_msg(1, i, BASE_MS + i * 60_000) for i in range(10)]
    rows.append(_msg(1, 99, BASE_MS + 2 * hour))
    (src / "b1.json").write_text("\n".join(rows))
    _run_window_batch(spark, src, tmp_path / "ckpt", tmp_path / "out")
    out1 = spark.read.parquet(str(tmp_path / "out"))
    # append mode emits only windows finalized by the watermark: H0 is
    # closed (watermark = H2 - 30min), the H2 window is still open.
    h0 = out1.filter(F.col("cnt") == 10)
    assert h0.count() == 1
    n_after_b1 = out1.count()

    # batch 2: a LATE row for H0 (behind the checkpointed watermark) plus a
    # fresh row far ahead that closes H2.
    (src / "b2.json").write_text(
        "\n".join(
            [_msg(1, 100, BASE_MS + 5 * 60_000), _msg(1, 101, BASE_MS + 5 * hour)]
        )
    )
    _run_window_batch(spark, src, tmp_path / "ckpt", tmp_path / "out")
    out2 = spark.read.parquet(str(tmp_path / "out"))
    # H0 must NOT be re-emitted or updated: late row dropped by watermark.
    assert out2.filter(F.col("cnt") == 10).count() == 1
    assert out2.filter((F.col("cnt") == 11)).count() == 0
    # the H2 row (cnt=1) is now finalized
    assert out2.count() > n_after_b1


def test_session_rollup_batchlike(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    # station 1: two bursts separated by > 30 min -> 2 sessions; closing
    # event far in the future finalizes them under append mode.
    rows = [_msg(1, i, BASE_MS + i * 60_000) for i in range(3)]
    rows += [_msg(1, 10 + i, BASE_MS + 90 * 60_000 + i * 60_000) for i in range(2)]
    rows.append(_msg(2, 1, BASE_MS + 10 * 3_600_000))
    (src / "a.json").write_text("\n".join(rows))

    stream = spark.readStream.text(str(src))
    canonical, _ = wire_to_canonical(stream)
    q = (
        session_rollup(canonical, gap="30 minutes", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("sessions_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    res = spark.sql("SELECT * FROM sessions_test WHERE station_id = 1").collect()
    assert len(res) == 2
    assert sorted(r.cnt for r in res) == [2, 3]
