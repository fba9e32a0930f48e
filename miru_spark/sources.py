"""Source readers — Iceberg-first with parquet fallback.

The north_rule/input_hint name an Iceberg table of source-code repositories
as the canonical input. This sandbox has no Iceberg runtime jar on the
classpath, so the reader gates on ``format("iceberg")`` and falls back to a
parquet directory scan; on a real cluster with
``iceberg-spark-runtime-*`` deployed, catalog tables get snapshot isolation,
partition pruning, and metadata-only counts for free — the engine code above
this reader is identical either way (it only ever sees a DataFrame).

Reference parity: the source table plays the WAL role
(miru-api/.../wal/MiruWALClient.java:20-126) — an ordered, replayable log
the build scans in full (rebuild) or sips incrementally (checkpoint
manifests, miru_spark.checkpoint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_source(spark: SparkSession, location: str, fmt: str = "auto") -> DataFrame:
    """Read the activity/source table.

    ``fmt``: 'iceberg' (catalog table name or path), 'parquet' (directory),
    or 'auto' — try Iceberg first when the location looks like a catalog
    table (contains no '/'), else parquet; fall back to parquet when the
    Iceberg runtime is absent.
    """
    if fmt == "parquet":
        return spark.read.parquet(location)
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(location)
    # auto
    looks_like_table = "/" not in location and not location.endswith(".parquet")
    if looks_like_table:
        return spark.read.format("iceberg").load(location)
    try:
        return spark.read.format("iceberg").load(location)
    except Exception:
        return spark.read.parquet(location)
