"""T5 — custom stateful streaming operator: live sequence-gap detection.

The reference's only stateful piece is the BitCask keyDir (latest value
per station). Its *implied* stateful need — the producers deliberately
skip ~10% of sequence numbers (``WeatherStation.java:47-52``) — is gap
detection, which the batch surface answers as Q8. This operator answers
it live: ``applyInPandasWithState`` keeps the last-seen ``s_no`` per
station across micro-batches and emits one row per detected gap as
messages arrive.

State per key is a single long (bounded by station cardinality, not
volume); a processing-time timeout would reap dead stations in a
long-running deployment.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_OUTPUT_SCHEMA = "station_id long, prev_s_no long, s_no long, missing long"
GAP_STATE_SCHEMA = "last_s_no long"


def _detect_gaps(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (station_id,) = key
    last = state.get[0] if state.exists else None
    out: dict[str, list] = {"station_id": [], "prev_s_no": [], "s_no": [], "missing": []}
    for pdf in batches:
        for s_no in sorted(pdf["s_no"]):
            s_no = int(s_no)
            if last is not None and s_no > last + 1:
                out["station_id"].append(station_id)
                out["prev_s_no"].append(last)
                out["s_no"].append(s_no)
                out["missing"].append(s_no - last - 1)
            if last is None or s_no > last:
                last = s_no
    state.update((last,))
    if out["station_id"]:
        yield pd.DataFrame(out)


def live_gap_detector(canonical_stream: DataFrame) -> DataFrame:
    """Streaming DataFrame of (station_id, prev_s_no, s_no, missing) rows,
    one per gap, emitted as the gap is observed."""
    return (
        canonical_stream.select("station_id", "s_no")
        .groupBy("station_id")
        .applyInPandasWithState(
            _detect_gaps,
            outputStructType=GAP_OUTPUT_SCHEMA,
            stateStructType=GAP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
