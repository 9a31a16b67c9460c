"""Regression: events.ts must normalize to TimestampType under every
parquet encoding the fixture generator has shipped.

Round-4 postmortem: the driver fixture's ts column drifted from
TIMESTAMP(NANOS) (read as long under nanosAsLong) to plain
timestamp[us] (read as TIMESTAMP_NTZ), and `withWatermark` rejects NTZ
— 5 streaming queries errored and the bench crashed. This test pins all
three encodings (nanos-as-long, NTZ, LTZ) so that class of environment
drift can never zero a round again.
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import types as T

from data_ingestion_tool_bakasura__spark.sources.readers import load_table
from data_ingestion_tool_bakasura__spark.streaming.windows import (
    replay_to_table,
    stream_events,
    tumbling_agg,
)

_ROWS = [
    # (ts, user_id, event_type, value) — two 1h windows, UTC wall-clock
    (dt.datetime(2024, 1, 1, 0, 10), 1, "click", 1.0),
    (dt.datetime(2024, 1, 1, 0, 40), 2, "click", 2.0),
    (dt.datetime(2024, 1, 1, 1, 5), 1, "purchase", 10.0),
    (dt.datetime(2024, 1, 1, 1, 55), 3, "click", 3.0),
]

ENCODINGS = {
    "nanos": pa.timestamp("ns"),          # -> LongType under nanosAsLong
    "ntz": pa.timestamp("us"),            # -> TimestampNTZType
    "ltz": pa.timestamp("us", tz="UTC"),  # -> TimestampType passthrough
}


def _write_events(base: str, enc: str) -> str:
    sf_dir = os.path.join(base, enc)
    os.makedirs(sf_dir, exist_ok=True)
    tbl = pa.table(
        {
            "ts": pa.array([r[0] for r in _ROWS], type=ENCODINGS[enc]),
            "user_id": pa.array([r[1] for r in _ROWS], type=pa.int64()),
            "event_type": pa.array([r[2] for r in _ROWS]),
            "value": pa.array([r[3] for r in _ROWS], type=pa.float64()),
        }
    )
    pq.write_table(tbl, os.path.join(sf_dir, "events.parquet"))
    return sf_dir


@pytest.fixture(scope="module")
def encoded_dirs(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("ts_encodings"))
    return {enc: _write_events(base, enc) for enc in ENCODINGS}


def test_load_table_normalizes_all_encodings(spark, encoded_dirs):
    batches = {}
    for enc, sf_dir in encoded_dirs.items():
        df = load_table(spark, sf_dir, "events")
        assert isinstance(df.schema["ts"].dataType, T.TimestampType), enc
        batches[enc] = sorted(
            (r["ts"], r["user_id"]) for r in df.select("ts", "user_id").collect()
        )
    assert batches["nanos"] == batches["ntz"] == batches["ltz"]
    # wall-clock semantics preserved (UTC session tz pinned by load_table)
    assert batches["ntz"][0][0] == dt.datetime(2024, 1, 1, 0, 10)


def test_stream_events_watermarkable_all_encodings(spark, encoded_dirs):
    results = {}
    for enc, sf_dir in encoded_dirs.items():
        sdf = stream_events(spark, sf_dir)
        assert isinstance(sdf.schema["ts"].dataType, T.TimestampType), enc
        out = replay_to_table(
            tumbling_agg(sdf), spark, mode="complete", shuffle_partitions=2
        )
        results[enc] = sorted(
            (r["window_start"], r["event_type"], r["n_events"], r["sum_value"])
            for r in out.collect()
        )
    assert results["nanos"] == results["ntz"] == results["ltz"]
    # 2 clicks in hour 0; 1 click + 1 purchase in hour 1
    assert results["ntz"] == [
        (dt.datetime(2024, 1, 1, 0, 0), "click", 2, 3.0),
        (dt.datetime(2024, 1, 1, 1, 0), "click", 1, 3.0),
        (dt.datetime(2024, 1, 1, 1, 0), "purchase", 1, 10.0),
    ]


def test_normalize_event_ts_rejects_non_utc_session(spark, encoded_dirs):
    """ADVICE r6: normalize_event_ts used to silently overwrite the
    session timezone to UTC — a global side effect. It now validates
    and raises on a non-UTC session (the NTZ cast resolves the tz at
    execution time, so a temporary set/restore would be wrong too)."""
    from data_ingestion_tool_bakasura__spark.sources.readers import (
        normalize_event_ts,
    )

    raw = spark.read.parquet(os.path.join(encoded_dirs["ntz"], "events.parquet"))
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        with pytest.raises(ValueError, match="UTC"):
            normalize_event_ts(raw)
        # the caller's deliberately-set timezone is NOT mutated
        assert spark.conf.get("spark.sql.session.timeZone") == "America/New_York"
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert isinstance(normalize_event_ts(raw).schema["ts"].dataType, T.TimestampType)
