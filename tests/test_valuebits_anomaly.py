"""valueBits family + Anomaly metricingAvg semantics (round 3)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from miru_spark import oracles
from miru_spark.operators import analytics


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


@pytest.fixture(scope="module")
def duck_ev(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    return con


def test_value_bits_index_round_trips(events):
    # every (doc, bit) posting must correspond to a set bit of the value,
    # and reassembling Σ 2^bit per doc must reproduce the value exactly
    vals = {r["event_id"]: r["user_id"] for r in events.select("event_id", "user_id").collect()}
    postings = analytics.value_bits_index(events, "user_id", "event_id").collect()
    rebuilt: dict[int, int] = {}
    for r in postings:
        assert (vals[r["doc"]] >> r["bit"]) & 1 == 1
        rebuilt[r["doc"]] = rebuilt.get(r["doc"], 0) + (1 << r["bit"])
    for doc, v in vals.items():
        assert rebuilt.get(doc, 0) == v, doc


def test_value_bits_sum_matches_direct_sum(events, duck_ev):
    got = (
        analytics.value_bits_sum(events, "event_type", "user_id")
        .toPandas()
        .sort_values("group_value")
        .reset_index(drop=True)
    )
    want = (
        duck_ev.execute(oracles.value_bits_sum_sql("events", "event_type", "user_id"))
        .df()
        .sort_values("group_value")
        .reset_index(drop=True)
    )
    assert got.equals(want)


def test_anomaly_metricing_matches_oracle_and_interpolates(events, duck_ev):
    got = (
        analytics.anomaly_metricing_avg(
            events, "ts", "user_id", F.col("event_type") == "error", "hour"
        )
        .toPandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    want = (
        duck_ev.execute(
            oracles.anomaly_metricing_sql("events", "ts", "user_id", "event_type = 'error'", "hour")
        )
        .df()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_anomaly_interpolation_semantics(spark):
    # hand-built series: buckets 0..4 hourly; raw>0 at buckets 0 (avg 10) and
    # 4 (avg 2); buckets 1-3 must interpolate linearly 10→2 (8, 6, 4);
    # Anomaly.java:85-96 knot layout
    rows = []
    for i, (n, v) in enumerate([(1, 10), (0, 0), (0, 0), (0, 0), (1, 2)]):
        for _ in range(n):
            rows.append((i, f"2024-01-01 0{i}:00:00", v, "error"))
        rows.append((i, f"2024-01-01 0{i}:30:00", 99, "ok"))  # keeps grid dense
    df = spark.createDataFrame(
        [(r[1], r[2], r[3]) for r in rows], "ts string, v long, et string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        str(r["bucket"]): r["avg_v"]
        for r in analytics.anomaly_metricing_avg(
            df, "ts", "v", F.col("et") == "error", "hour"
        ).collect()
    }
    assert out["2024-01-01 00:00:00"] == 10
    assert out["2024-01-01 01:00:00"] == 8
    assert out["2024-01-01 02:00:00"] == 6
    assert out["2024-01-01 03:00:00"] == 4
    assert out["2024-01-01 04:00:00"] == 2


def test_value_bits_rejects_out_of_range_values(spark):
    # negative / over-width values would silently corrupt Σ-from-slices —
    # the guard raises in-plan instead
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    neg = spark.createDataFrame([("g", -1, 1)], "grp string, v long, doc long")
    with pytest.raises((Py4JJavaError, SparkRuntimeException), match="valueBits"):
        analytics.value_bits_sum(neg, "grp", "v").collect()
    wide = spark.createDataFrame([("g", 1 << 40, 1)], "grp string, v long, doc long")
    with pytest.raises((Py4JJavaError, SparkRuntimeException), match="valueBits"):
        analytics.value_bits_sum(wide, "grp", "v").collect()
    # auto-widened n_bits accepts the same value and sums it exactly
    got = analytics.value_bits_sum(wide, "grp", "v", n_bits=48).collect()
    assert got[0]["total"] == 1 << 40
