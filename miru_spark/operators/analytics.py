"""Context operators: distincts / uniques / counts / waveforms / trending
(SURVEY.md §2.5). Each is a thin declarative DataFrame plan — Catalyst does
the heavy lifting (partial aggregation, pushdown); the reference needed
bespoke bitmap machinery for every one of these.

Reference parity notes per function:
* distinct_values     — Distincts plugin (miru-reco-plugins/.../distincts/
                        Distincts.java:41-128, dictionary scan :96-99)
* uniques             — Uniques plugin (UniquesInjectable.java:39-56)
* distinct_count      — DistinctCount plugin (miru-stream-plugins/.../count/
                        DistinctCount.java:30-113)
* aggregate_counts    — AggregateCounts plugin (miru-stream-plugins/.../
                        filter/AggregateCounts.java:90-397)
* waveform            — Analytics plugin histogram (miru-analytics-plugins/
                        .../analytics/Analytics.java:57-203,
                        boundedCardinalities MiruBitmaps.java:65-73)
* metrics             — Metrics plugin (miru-analytics-plugins/.../metrics/
                        Metrics.java:18-98)
* anomaly_ratio       — Anomaly plugin rate normalization
                        (miru-anomaly-plugins/.../Anomaly.java:31-96)
* trending_peaks      — Trending plugin + PeakDet local maxima
                        (miru-reco-plugins/.../trending/PeakDet.java:43-117)
* last_n              — Stumptown log browse (miru-stumptown-plugins/.../
                        Stumptown.java:27-72) / TIME strategy gather
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def distinct_values(df: DataFrame, field: str, prefix: str | None = None) -> DataFrame:
    out = df.select(F.col(field).alias("value"))
    if prefix:
        out = out.filter(F.col("value").startswith(prefix))
    return out.distinct()


def uniques(df: DataFrame, field: str) -> DataFrame:
    return df.agg(F.count_distinct(F.col(field)).alias("n_unique"))


def distinct_count(df: DataFrame, field: str, predicate: Column | None = None) -> DataFrame:
    out = df.filter(predicate) if predicate is not None else df
    return out.agg(F.count_distinct(F.col(field)).alias("n_distinct"))


def aggregate_counts(
    df: DataFrame,
    group_field: str,
    ts_col: str,
    doc_col: str | None = None,
    cursor=None,
    page_size: int | None = None,
    unread_docs: DataFrame | None = None,
) -> DataFrame:
    """Per-group stream rollup — the full AggregateCounts surface
    (miru-stream-plugins/.../filter/AggregateCounts.java:90-397): count,
    oldest/latest timestamp, and (with ``doc_col``) the latest/oldest DOC
    per group (the reference's most-recent-activity gather, :260-299),
    tie-broken by (ts, doc) so the pick is total-ordered. Pagination is a
    keyset cursor over group_value (the reference's resumable report):
    ``cursor`` = last group of the previous page, ``page_size`` = page rows.

    ``unread_docs`` (a relation with a ``doc`` column — e.g.
    streams.unread's output) adds the per-group ``n_unread`` /
    ``any_unread`` columns: the reference's unread-bit logic ANDs the
    caller's unread stream bitmap into each group's count (:183-201).
    Requires ``doc_col``."""
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.min(ts_col).alias("oldest_ts"),
        F.max(ts_col).alias("latest_ts"),
    ]
    if doc_col is not None:
        order = F.struct(F.col(ts_col), F.col(doc_col))
        aggs.append(F.max_by(F.col(doc_col), order).alias("latest_doc"))
        aggs.append(F.min_by(F.col(doc_col), order).alias("oldest_doc"))
    if unread_docs is not None:
        if doc_col is None:
            raise ValueError("unread_docs requires doc_col")
        df = df.join(
            unread_docs.select(F.col("doc").alias(doc_col)).distinct()
            .withColumn("_unread", F.lit(True)),
            doc_col,
            "left",
        )
        aggs.append(
            F.sum(F.when(F.col("_unread"), 1).otherwise(0)).cast("long").alias("n_unread")
        )
        aggs.append(
            F.max(F.coalesce(F.col("_unread"), F.lit(False))).alias("any_unread")
        )
    out = df.groupBy(F.col(group_field).alias("group_value")).agg(*aggs)
    if cursor is not None:
        out = out.filter(F.col("group_value") > cursor)
    if page_size is not None:
        out = out.orderBy("group_value").limit(page_size)
    return out


def waveform(df: DataFrame, ts_col: str, group_field: str, bucket: str = "hour") -> DataFrame:
    """Time-bucketed counts per group — the Analytics histogram as a
    tumbling-window count (free partial aggregation, no bitmap ranges)."""
    return (
        df.groupBy(
            F.col(group_field).alias("group_value"),
            F.date_trunc(bucket, F.col(ts_col)).alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def metrics(df: DataFrame, ts_col: str, value_col: str, bucket: str = "day") -> DataFrame:
    """sum/avg/min/max of a value per time bucket (Metrics plugin)."""
    v = F.col(value_col)
    return df.groupBy(F.date_trunc(bucket, F.col(ts_col)).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(v), 6).alias("sum_v"),
        F.round(F.avg(v), 6).alias("avg_v"),
        F.round(F.min(v), 6).alias("min_v"),
        F.round(F.max(v), 6).alias("max_v"),
    )


def anomaly_ratio(
    df: DataFrame, ts_col: str, value_col: str, predicate: Column, bucket: str = "day"
) -> DataFrame:
    """Rate normalization: bucketed count of predicate hits ÷ bucket total."""
    return (
        df.groupBy(F.date_trunc(bucket, F.col(ts_col)).alias("bucket"))
        .agg(
            F.sum(F.when(predicate, 1).otherwise(0)).alias("hits"),
            F.count(F.lit(1)).alias("total"),
        )
        .withColumn("rate", F.round(F.col("hits") / F.col("total"), 6))
    )


def trending_peaks(
    df: DataFrame, ts_col: str, group_field: str, bucket: str = "hour",
    delta: float = 1.0,
) -> DataFrame:
    """Billauer peakdet over each group's waveform — the reference's exact
    trigger-delta scan (PeakDet.peakdet, miru-reco-plugins/.../trending/
    PeakDet.java:43-117): a maximum is registered when the series falls by
    more than ``delta`` below the running max, then re-arms when it rises by
    more than ``delta`` above the running min. Strict local maxima (the old
    lag/lead form) counted every 1-count jitter bump; this does not.

    The waveform aggregation is the distributed part; the sequential scan
    runs per group over its (small) bucket series in applyInPandas — the
    same shape as the reference's client-side scan over the returned
    waveform."""
    wf = waveform(df, ts_col, group_field, bucket)

    def scan(pdf):
        import pandas as pd

        v = pdf.sort_values("bucket")["n"].to_numpy()
        mn, mx = float("inf"), float("-inf")
        lookformax = True
        peaks = 0
        for a in v:
            a = float(a)
            if a > mx:
                mx = a
            if a < mn:
                mn = a
            if lookformax:
                if a < mx - delta:
                    peaks += 1
                    mn = a
                    lookformax = False
            else:
                if a > mn + delta:
                    mx = a
                    lookformax = True
        return pd.DataFrame(
            {"group_value": [pdf["group_value"].iloc[0]], "n_peaks": [peaks]}
        )

    return wf.groupBy("group_value").applyInPandas(
        scan, "group_value string, n_peaks long"
    )


def last_n(
    df: DataFrame,
    order_cols: list[str],
    n: int,
    predicate: Column | None = None,
    select_cols: list[str] | None = None,
) -> DataFrame:
    """Newest-N gather (TIME strategy / stumptown last messages).
    Ordered LIMIT → Catalyst's per-partition partial top-k then merge."""
    out = df.filter(predicate) if predicate is not None else df
    out = out.orderBy(*[F.desc(c) for c in order_cols]).limit(n)
    return out.select(*select_cols) if select_cols else out


def paired_latest(df: DataFrame, field_a: str, field_b: str, doc_col: str) -> DataFrame:
    """Latest doc per composite (a, b) term — the reference's paired-latest
    index (miru-service/.../stream/MiruIndexPairedLatest.java: one
    latest-occurrence bitmap per composed term pair) as a max aggregate,
    map-side combinable, no skew (pair cardinality >> group sizes)."""
    return df.groupBy(
        F.col(field_a).alias("a"), F.col(field_b).alias("b")
    ).agg(F.max(doc_col).alias("latest_doc"))


def bloom_index(
    df: DataFrame, term_col: str, value_col: str, m: int = 1024, k: int = 4
) -> DataFrame:
    """Per-term Bloom filter over a paired field's values — the reference's
    bloom index (miru-service/.../stream/MiruIndexBloom.java,
    m-plugin/index/BloomIndex.java: per (field,term) filter used as a
    contains-any precheck). Layout: (term, word, bits) — only non-zero
    64-bit words are materialized, built with ONE explode + bit_or groupBy
    (map-side combinable, JVM-side hashing; no Python).
    """
    positions = F.array(
        *[
            F.pmod(F.xxhash64(F.col(value_col), F.lit(i)), F.lit(m))
            for i in range(k)
        ]
    )
    exploded = df.select(
        F.col(term_col).alias("term"), F.explode(positions).alias("pos")
    )
    return (
        exploded.withColumn("word", (F.col("pos") / 64).cast("int"))
        .withColumn("bit", F.pmod(F.col("pos"), F.lit(64)).cast("int"))
        .groupBy("term", "word")
        .agg(F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).alias("bits"))
    )


def bloom_maybe_contains(
    bloom: DataFrame, probes: DataFrame, term_col: str, value_col: str,
    m: int = 1024, k: int = 4,
) -> DataFrame:
    """Membership precheck: for each probe (term, value) row, true iff ALL k
    bit positions are set in the term's filter (no false negatives by
    construction; false-positive rate ≈ (1-e^{-kn/m})^k). Expressed as an
    explode + join + all-bits-present aggregate — the reference walks the
    same k hashed positions (BloomIndex.mightContain)."""
    positions = F.array(
        *[
            F.pmod(F.xxhash64(F.col(value_col), F.lit(i)), F.lit(m))
            for i in range(k)
        ]
    )
    probe_bits = (
        probes.select(
            F.col(term_col).alias("term"),
            F.col(value_col).alias("value"),
            F.explode(positions).alias("pos"),
        )
        .withColumn("word", (F.col("pos") / 64).cast("int"))
        .withColumn("bit", F.pmod(F.col("pos"), F.lit(64)).cast("int"))
    )
    joined = probe_bits.join(bloom, ["term", "word"], "left").withColumn(
        "hit",
        F.coalesce(
            F.expr("(bits & shiftleft(CAST(1 AS BIGINT), bit)) != 0"), F.lit(False)
        ),
    )
    return joined.groupBy("term", "value").agg(
        (F.count(F.lit(1)) == F.sum(F.when(F.col("hit"), 1).otherwise(0))).alias("maybe")
    )


def _bit_slices(df: DataFrame, value_col: str, n_bits: int, *keep: Column) -> DataFrame:
    """(…keep, bit) rows: one row per set bit of the (nonnegative integer)
    value — the bit-slicing step of the valueBits index family. JVM-side:
    one explode + filter, codegen-friendly.

    Values outside [0, 2^n_bits) raise IN-PLAN (negative values would slice
    two's-complement bits without the sign, values above the width would
    silently drop high bits — either way Σ-from-slices would diverge from
    the direct sum; the reference packs the full value bytes so it has no
    such truncation, ValueBitsIndex.packValue)."""
    raw = F.col(value_col).cast("long")
    v = F.when(
        (raw < 0) | (raw >= F.lit(1 << n_bits)),
        F.raise_error(
            F.concat(
                F.lit(
                    f"valueBits: value of column '{value_col}' outside "
                    f"[0, 2^{n_bits}): "
                ),
                raw.cast("string"),
                F.lit(" — raise n_bits or clean the input"),
            )
        ).cast("long"),
    ).otherwise(raw)
    bits = F.array(
        *[
            F.struct(
                F.lit(b).alias("bit"), (v.bitwiseAND(F.lit(1 << b)) != 0).alias("is_set")
            )
            for b in range(n_bits)
        ]
    )
    exploded = df.select(*keep, F.explode(bits).alias("x"))
    keep_names = exploded.columns[:-1]  # keep exprs were just projected
    return exploded.filter(F.col("x.is_set")).select(
        *keep_names, F.col("x.bit").alias("bit")
    )


def value_bits_index(df: DataFrame, value_col: str, doc_col: str, n_bits: int = 32) -> DataFrame:
    """Bit-sliced value index — the fifth per-field index family,
    MiruFieldType.valueBits (m-api/.../field/MiruFieldType.java:15), built by
    MiruIndexValueBits.compose (m-service/.../stream/MiruIndexValueBits.java:
    53-91): one posting list per bit position holding the docs whose (single)
    field value has that bit set. The reference slices the value's packed
    BYTES (ValueBitsIndex.packValue); we slice the nonnegative integer
    value's binary representation — same index algebra, simpler term space
    (documented delta). Output: (bit, doc) posting rows."""
    return _bit_slices(df, value_col, n_bits, F.col(doc_col).alias("doc"))


def value_bits_sum(
    df: DataFrame, group_field: str, value_col: str, n_bits: int = 32
) -> DataFrame:
    """Σ value per group reconstructed FROM the bit-sliced index:
    Σ_b 2^b · |{docs in group with bit b set}| — exactly the Anomaly plugin's
    sum() over valueBits answer bitmaps (miru-anomaly-plugins/.../
    Anomaly.java:102-130, multiplier = 1L << i). Oracle-gated against a
    direct SQL sum, which proves the slicing correct."""
    sl = _bit_slices(df, value_col, n_bits, F.col(group_field).alias("group_value"))
    counts = sl.groupBy("group_value", "bit").agg(F.count(F.lit(1)).alias("n"))
    return counts.groupBy("group_value").agg(
        F.sum(F.expr("n * shiftleft(CAST(1 AS BIGINT), bit)")).alias("total")
    )


def anomaly_metricing_avg(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    predicate: Column,
    bucket: str = "hour",
    n_bits: int = 32,
) -> DataFrame:
    """Anomaly.metricingAvg (miru-anomaly-plugins/.../Anomaly.java:36-99):
    per time bucket, waveform = bit-sliced Σ value over the answer set
    (sum(), :102-130 — computed here from the valueBits slices), divided by
    the bucket's raw cardinality with LONG division (:63, :90); buckets with
    raw cardinality 0 are LINEARLY interpolated between the neighboring
    defined buckets and truncated to long (:85-96), with flat extension past
    the edges (the knots at x=-1 / x=len, :80-83). Bucket grid = every
    bucket between min(ts) and max(ts) of the stream (the reference's
    query-range segment grid) — the grid is query-sized (N segments), so the
    single-partition interpolation window is bounded by construction."""
    spark = df.sparkSession
    bcol = F.date_trunc(bucket, F.col(ts_col))
    lohi = df.agg(F.min(bcol).alias("lo"), F.max(bcol).alias("hi")).collect()[0]
    step = {"hour": "INTERVAL 1 HOUR", "day": "INTERVAL 1 DAY"}[bucket]
    grid = spark.sql(
        f"SELECT explode(sequence(TIMESTAMP '{lohi['lo']}', "
        f"TIMESTAMP '{lohi['hi']}', {step})) AS bucket"
    )
    hits = df.filter(predicate).withColumn("bucket", bcol)
    raw = hits.groupBy("bucket").agg(F.count(F.lit(1)).alias("raw"))
    sums = (
        _bit_slices(hits, value_col, n_bits, F.col("bucket"))
        .groupBy("bucket", "bit")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("bucket")
        .agg(F.sum(F.expr("n * shiftleft(CAST(1 AS BIGINT), bit)")).alias("s"))
    )
    g = (
        grid.join(raw, "bucket", "left")
        .join(sums, "bucket", "left")
        .withColumn("raw", F.coalesce("raw", F.lit(0)))
        .withColumn("s", F.coalesce("s", F.lit(0)))
    )
    w = Window.orderBy("bucket")
    g = (
        g.withColumn("i", F.row_number().over(w) - 1)
        .withColumn("py", F.when(F.col("raw") > 0, F.expr("s DIV raw")))
        .withColumn("px", F.when(F.col("raw") > 0, F.col("i")))
    )
    wp = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
    wn = Window.orderBy("i").rowsBetween(0, Window.unboundedFollowing)
    g = (
        g.withColumn("prev_y", F.last("py", ignorenulls=True).over(wp))
        .withColumn("prev_x", F.last("px", ignorenulls=True).over(wp))
        .withColumn("next_y", F.first("py", ignorenulls=True).over(wn))
        .withColumn("next_x", F.first("px", ignorenulls=True).over(wn))
    )
    # op order mirrors the DuckDB oracle exactly: y0 + dy * (dx_frac)
    interp = F.floor(
        F.col("prev_y")
        + (F.col("next_y") - F.col("prev_y"))
        * ((F.col("i") - F.col("prev_x")) / (F.col("next_x") - F.col("prev_x")))
    )
    avg = (
        F.when(F.col("raw") > 0, F.col("py"))
        .when(F.col("prev_y").isNull() & F.col("next_y").isNull(), F.col("s"))
        .when(F.col("prev_y").isNull(), F.col("next_y"))
        .when(F.col("next_y").isNull(), F.col("prev_y"))
        .otherwise(interp)
    )
    return g.select("bucket", avg.cast("long").alias("avg_v"))


def time_range_mask(
    df: DataFrame, ts_col: str, lo: str, hi: str, group_field: str
) -> DataFrame:
    """Time-range mask: rows in [lo, hi] counted per group — the reference's
    range bitmap (MiruBitmapsRoaring createWithRange + time-index bounds,
    miru-plugin/.../index/MiruTimeIndex.java:27-51) as a pushed-down
    between-predicate."""
    return (
        df.filter(F.col(ts_col).between(F.lit(lo), F.lit(hi)))
        .groupBy(F.col(group_field).alias("group_value"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
