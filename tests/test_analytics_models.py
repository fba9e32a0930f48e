"""Unit tests: PeakDet trigger-delta semantics (golden vector from the
reference's own PeakDet.main, PeakDet.java:11-20) and the Catwalk/Strut
count-model pair."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from miru_spark.operators import analytics, models


def _series_df(spark, values, group="g"):
    base = datetime.datetime(2024, 1, 1)
    rows = []
    for i, v in enumerate(values):
        ts = base + datetime.timedelta(hours=i)
        rows.extend((group, ts) for _ in range(int(v)))
    return spark.createDataFrame(rows, "event_type string, ts timestamp")


def test_peakdet_reference_golden_vector(spark):
    # PeakDet.main: {0,1,2,3,4,5,1,2,3,4,8,7,6,5,4,3,2,1}, delta=1 → 2 peaks
    # (5 then 8). Zero-count buckets don't exist in a count waveform, so use
    # the same shape shifted +1 — peak structure is translation-invariant.
    v = [x + 1 for x in [0, 1, 2, 3, 4, 5, 1, 2, 3, 4, 8, 7, 6, 5, 4, 3, 2, 1]]
    df = _series_df(spark, v)
    res = analytics.trending_peaks(df, "ts", "event_type", "hour", delta=1.0).toPandas()
    assert list(res["n_peaks"]) == [2]


def test_peakdet_ignores_jitter_below_delta(spark):
    # strict local maxima would count every bump; delta=2 must count none
    v = [5, 6, 5, 6, 5, 6, 5]
    df = _series_df(spark, v)
    res = analytics.trending_peaks(df, "ts", "event_type", "hour", delta=2.0).toPandas()
    assert list(res["n_peaks"]) == [0]
    res1 = analytics.trending_peaks(df, "ts", "event_type", "hour", delta=0.5).toPandas()
    assert list(res1["n_peaks"]) == [3]


@pytest.fixture(scope="module")
def label_df(spark):
    rows = [
        # (doc, user, kind)   user u1: 2/4 error; u2: 0/2; u3: 1/1
        (1, "u1", "error"), (2, "u1", "ok"), (3, "u1", "error"), (4, "u1", "ok"),
        (5, "u2", "ok"), (6, "u2", "ok"),
        (7, "u3", "error"),
    ]
    return spark.createDataFrame(rows, "doc long, user string, kind string")


def test_catwalk_counts(spark, label_df):
    m = models.catwalk_model(
        label_df, F.col("kind") == "error", {"user": F.col("user")}
    ).toPandas().set_index("feature_value")
    assert m.loc["u1", "numerator"] == 2 and m.loc["u1", "denominator"] == 4
    assert m.loc["u2", "numerator"] == 0 and m.loc["u2", "denominator"] == 2
    assert m.loc["u3", "numerator"] == 1 and m.loc["u3", "denominator"] == 1


def test_strut_scores_and_strategies(spark, label_df):
    feats = {"user": F.col("user")}
    m = models.catwalk_model(label_df, F.col("kind") == "error", feats)
    res = models.strut_score(label_df, "doc", feats, m, "unit_weighted", k=10).toPandas()
    by_doc = dict(zip(res["doc"], res["score"]))
    assert by_doc[1] == 0.5 and by_doc[5] == 0.0 and by_doc[7] == 1.0
    # ranking: score desc then doc desc
    assert list(res["doc"])[:1] == [7]
    r_max = models.strut_score(label_df, "doc", feats, m, "max", k=10).toPandas()
    assert dict(zip(r_max["doc"], r_max["score"]))[1] == 0.5
    with pytest.raises(ValueError):
        models.strut_score(label_df, "doc", feats, m, "bogus", k=10)


def test_catwalk_permutate_multivalued_features(spark):
    # MiruAggregateUtil.permutate: feature tuples are the CARTESIAN across
    # multi-valued fields; duplicate values in one field count once
    from miru_spark.operators import models

    df = spark.createDataFrame(
        [
            (1, ["a", "b", "a"], ["x"], True),
            (2, ["a"], ["x", "y"], False),
            (3, [], ["x"], True),  # empty array -> no tuples at all
        ],
        "doc long, tags array<string>, cats array<string>, is_err boolean",
    )
    m = models.catwalk_model(
        df,
        F.col("is_err"),
        {"combo": [F.col("tags"), F.col("cats")], "tag": F.col("tags")},
    )
    rows = {
        (r["feature_id"], r["feature_value"]): (r["numerator"], r["denominator"])
        for r in m.collect()
    }
    SEP = "\x1f"
    # doc1: tags{a,b} x cats{x} -> (a,x),(b,x) labeled; doc2: {a} x {x,y}
    assert rows[("combo", f"a{SEP}x")] == (1, 2)
    assert rows[("combo", f"b{SEP}x")] == (1, 1)
    assert rows[("combo", f"a{SEP}y")] == (0, 1)
    # doc3's empty tags contributes nothing, even to single-field features
    assert rows[("tag", "a")] == (1, 2)
    assert rows[("tag", "b")] == (1, 1)
    assert ("tag", "") not in rows or rows[("tag", "")][1] == 0


def test_strut_multivalued_feature_takes_max_across_instances(spark):
    # Strut.score accumulates per-feature across tuple instances with MAX
    # (Strut.java:355-365) — a doc tagged [a, b] scores max(s_a, s_b)
    from miru_spark.operators import models

    model = spark.createDataFrame(
        [("tag", "a", 1, 5), ("tag", "b", 4, 5), ("u", "1", 1, 2)],
        "feature_id string, feature_value string, numerator long, denominator long",
    )
    cands = spark.createDataFrame(
        [(1, ["a", "b"], 1), (2, ["a"], 1), (3, [], 2), (4, ["zzz"], 9)],
        "doc long, tags array<string>, u long",
    )
    got = {
        r["doc"]: r["score"]
        for r in models.strut_score(
            cands, "doc", {"tag": F.col("tags")}, model, "max", k=10
        ).collect()
    }
    assert got[1] == 0.8 and got[2] == 0.2 and got[3] == 0.0 and got[4] == 0.0
    # unit_weighted across a scalar + an array feature: (max_tag + s_u) / 2
    got2 = {
        r["doc"]: r["score"]
        for r in models.strut_score(
            cands, "doc", {"tag": F.col("tags"), "u": F.col("u")}, model,
            "unit_weighted", k=10,
        ).collect()
    }
    assert got2[1] == round((0.8 + 0.5) / 2, 6)
    assert got2[3] == 0.0  # u=2 not in model, empty tags


def test_aggregate_counts_unread_flags(spark):
    # AggregateCounts.java:183-201: the caller's unread mask ANDs into each
    # group — n_unread / any_unread per group_value
    from miru_spark.operators import analytics

    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", "a"),
            (2, "2024-01-01 01:00:00", "a"),
            (3, "2024-01-01 02:00:00", "b"),
            (4, "2024-01-01 03:00:00", "c"),
        ],
        "event_id long, ts string, event_type string",
    ).withColumn("ts", F.to_timestamp("ts"))
    unread = spark.createDataFrame([(2,), (3,)], "doc long")
    got = {
        r["group_value"]: (r["n"], r["n_unread"], r["any_unread"], r["latest_doc"])
        for r in analytics.aggregate_counts(
            ev, "event_type", "ts", doc_col="event_id", unread_docs=unread
        ).collect()
    }
    assert got["a"] == (2, 1, True, 2)
    assert got["b"] == (1, 1, True, 3)
    assert got["c"] == (1, 0, False, 4)


# --- retired-gate-slot coverage (FIXTURES.md §7 rule 1b, round 6) ---------


def test_time_range_mask_equals_direct_filter(spark, sf_dir):
    # the relational between-predicate path (the index-side time-range mask
    # stays gated via fulltext_bm25_timerange)
    from miru_spark.operators import analytics

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    lo, hi = "2024-01-05 00:00:00", "2024-01-10 00:00:00"
    got = {
        r["group_value"]: r["n"]
        for r in analytics.time_range_mask(ev, "ts", lo, hi, "event_type").collect()
    }
    want = {
        r["event_type"]: r["n"]
        for r in ev.filter(F.col("ts").between(F.lit(lo), F.lit(hi)))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want and got  # non-vacuous: the fixture window has rows


def test_bloom_index_no_false_negatives_and_fp_sanity(spark, sf_dir):
    from miru_spark.operators import analytics

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    bloom = analytics.bloom_index(ev, "event_type", "user_id")
    true_pairs = ev.select("event_type", "user_id").distinct()
    # (a) every true pair answers maybe=true — no false negatives
    res = analytics.bloom_maybe_contains(
        bloom, true_pairs, "event_type", "user_id"
    )
    n_checked, n_maybe = res.agg(
        F.count(F.lit(1)), F.sum(F.when(F.col("maybe"), 1).otherwise(0))
    ).first()
    assert n_checked == n_maybe and n_checked > 0
    # (b) absent pairs (shifted user ids far outside the fixture's id space)
    # mostly answer maybe=false: fp rate ≈ (1-e^{-kn/m})^k — with the
    # fixture's per-term cardinalities this stays far below 50%
    absent = true_pairs.select(
        "event_type", (F.col("user_id") + 10_000_000).alias("user_id")
    )
    fp = analytics.bloom_maybe_contains(bloom, absent, "event_type", "user_id")
    n_abs, n_fp = fp.agg(
        F.count(F.lit(1)), F.sum(F.when(F.col("maybe"), 1).otherwise(0))
    ).first()
    assert n_abs == n_checked and n_fp < n_abs / 2
