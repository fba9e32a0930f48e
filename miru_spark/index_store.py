"""Persistent index layout + resumable build (SURVEY.md §7 step 6).

Layout under ``index_dir``:

    manifest.json            checkpoint/lineage (miru_spark.checkpoint)
    segments/wave=K/         packed posting segments for that wave's parts
                             (parquet, sorted by term within files so the
                             query-time `term IN (...)` prunes row groups)
    stats/                   global (term, df, cum_tf)
    doclens/                 (part, doc_id, doc_key, dl, content_sha)
    forward/wave=K/          forward index (part, doc_id, term, tf) — the
                             reference's activity/row index
                             (m-plugin/index/MiruActivityIndex.java), sorted
                             by (part, doc_id) so gather-class operators
                             semi-join it instead of decoding all postings

Build = waves of doc-partitions (each wave: tokenize → flat → salted
segments → pack → write → manifest commit), then a final merge stage that
range-partitions all segments by term (the north_rule's repartitionByRange
merge; hot terms span multiple (part) rows so the range partitioner splits
them across output files — plus the in-wave salting already bounded any
single aggregation). A killed build resumes at wave granularity without
recomputing finished waves.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from miru_spark.checkpoint import Manifest
from miru_spark.operators import build as B

# Bumped whenever the on-disk layout changes (e.g. the first_id packed column,
# per-wave forward flags). Part of the fingerprint, so an index written by
# older code forces a clean rebuild instead of mixing schemas across waves;
# load_index refuses older dirs outright.
FORMAT_VERSION = 2


@dataclass
class BuildReport:
    n_parts: int
    n_waves: int
    waves_run: int
    waves_skipped: int
    n_docs: int


def build_persistent(
    docs_source: DataFrame,
    index_dir: str,
    text_col: str = "content",
    dense_id_col: str | None = None,
    natural_key: list[str] | None = None,
    capacity: int = B.DEFAULT_CAPACITY,
    hot_df_threshold: int = B.DEFAULT_HOT_TERM_DF,
    salt_buckets: int = B.DEFAULT_SALT_BUCKETS,
    wave_size: int = 8,
    merge_partitions: int | None = None,
    fail_after_wave: int | None = None,
    spread: int | None = None,
    aux_fields: list[str] | None = None,
    numeric_aux_fields: list[str] | None = None,
    forward_index: bool = True,
    schema=None,
    stopwords: frozenset | None = None,
) -> BuildReport:
    """Resumable build of the persistent index. ``fail_after_wave`` injects a
    crash after that wave's commit (kill-resume tests only). ``spread`` as in
    build_index (tokenize-stage parallelism; 0 keeps the source layout).
    ``schema`` (miru_spark.schema.MiruSchema) drives text/aux field selection
    as in build_index."""
    if schema is not None:
        missing = [f.name for f in schema.fields if f.name not in docs_source.columns]
        if missing:
            raise ValueError(
                f"schema {schema.name} v{schema.version} fields missing from "
                f"source: {missing}"
            )
        text_col = schema.text_field()
        if aux_fields is None:
            aux_fields = schema.aux_fields()
        if numeric_aux_fields is None:
            numeric_aux_fields = schema.numeric_fields()
    spark = docs_source.sparkSession
    n_parts = None
    if natural_key is not None:
        n_parts = max(1, -(-docs_source.count() // capacity))
    if spread is None:
        spread = spark.sparkContext.defaultParallelism * 3
    docs = B.prepare_docs(
        docs_source, text_col, dense_id_col, natural_key, capacity, n_parts
    ).cache()
    # content digest in the fingerprint: an order-insensitive sum of per-row
    # sha CRCs, so a same-row-count build over CHANGED content restarts from
    # scratch instead of silently skipping completed waves and serving a
    # stale index. One extra agg over the already-cached docs.
    frow = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.crc32(F.col("content_sha"))).alias("sha_sum"),
    ).collect()[0]
    n_docs = int(frow["n"])
    fingerprint = {
        "format_version": FORMAT_VERSION,
        "n_docs": n_docs,
        "content_digest": int(frow["sha_sum"] or 0),
        "capacity": capacity,
        "text_col": text_col,
        "id": dense_id_col or ",".join(natural_key or []),
        "salt_buckets": salt_buckets,
        "aux": ",".join(aux_fields or []),
        "num_aux": ",".join(numeric_aux_fields or []),
        "stopwords": ",".join(sorted(stopwords or [])),
        # forward-index on/off is part of the identity: resuming a
        # forward=True build with forward=False (or vice versa) must restart,
        # or forward/wave=* would be a PARTIAL glob that gather silently
        # miscounts over (round-3 ADVICE medium).
        "forward": bool(forward_index),
    }
    manifest = Manifest.load_or_create(index_dir, fingerprint)
    if not manifest.data["waves"]:
        # fresh manifest (new build OR fingerprint-mismatch restart): delete
        # any stale wave/stage directories from a previous fingerprint so
        # wave=* globs can never mix old and new data
        import shutil

        for sub in ("segments", "doclens", "forward", "postings", "stats", "aux", "removed"):
            p = f"{index_dir}/{sub}"
            if os.path.isdir(p):
                shutil.rmtree(p)

    parts = sorted(r["part"] for r in docs.select("part").distinct().collect())
    n_waves = math.ceil(len(parts) / wave_size)
    waves_run = waves_skipped = 0

    for wave_id in range(n_waves):
        if manifest.wave_done(wave_id):
            waves_skipped += 1
            continue
        wave_parts = parts[wave_id * wave_size : (wave_id + 1) * wave_size]
        wave_docs = docs.filter(F.col("part").isin(wave_parts))
        # spread the tokenize stage (see build_index) — numbered repartition
        # keeps the Arrow pass at full width regardless of wave part count
        tokenize_src = wave_docs.repartition(spread) if spread else wave_docs
        flat = B.flat_postings(tokenize_src, text_col, stopwords)
        packed = B.packed_from_flat(flat)
        (
            packed.repartition("part")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .parquet(f"{index_dir}/segments/wave={wave_id}")
        )
        (
            B.doc_meta(wave_docs, flat)
            .write.mode("overwrite")
            .parquet(f"{index_dir}/doclens/wave={wave_id}")
        )
        if forward_index:
            # decode the JUST-WRITTEN segments back into the forward layout
            # (a varint decode pass — much cheaper than a third tokenize of
            # the content); doc-sorted so gather's semi-join prunes files
            (
                B.unpack_postings(spark.read.parquet(f"{index_dir}/segments/wave={wave_id}"))
                .repartition("part")
                .sortWithinPartitions("part", "doc_id", "term")
                .write.mode("overwrite")
                .parquet(f"{index_dir}/forward/wave={wave_id}")
            )
        # per-partition counters (lineage): docs + segments + postings per part
        seg_counts = {
            str(r["part"]): {"n_segments": r["n_segments"], "n_postings": r["n_postings"]}
            for r in spark.read.parquet(f"{index_dir}/segments/wave={wave_id}")
            .groupBy("part")
            .agg(
                F.count(F.lit(1)).alias("n_segments"),
                F.sum("df_part").alias("n_postings"),
            )
            .collect()
        }
        doc_counts = {
            str(r["part"]): r["n"]
            for r in wave_docs.groupBy("part").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        for p, n in doc_counts.items():
            seg_counts.setdefault(p, {})["n_docs"] = n
        manifest.commit_wave(wave_id, wave_parts, seg_counts)
        waves_run += 1
        if fail_after_wave is not None and wave_id >= fail_after_wave:
            raise RuntimeError(f"injected failure after wave {wave_id}")

    # merge stage: global term-range layout + stats (idempotent overwrite)
    if not manifest.stage_done("ready") or waves_run:
        all_segments = spark.read.parquet(f"{index_dir}/segments/wave=*")
        n_merge = merge_partitions or max(4, spark.sparkContext.defaultParallelism)
        (
            all_segments.repartitionByRange(n_merge, "term", "part")
            .sortWithinPartitions("term", "part")
            .write.mode("overwrite")
            .parquet(f"{index_dir}/postings")
        )
        stats = B.term_stats(
            all_segments.select("term", "df_part", "cum_tf_part")
        )
        stats.coalesce(4).write.mode("overwrite").parquet(f"{index_dir}/stats")
        if aux_fields or numeric_aux_fields:
            # single-term field postings, term-sorted for scan pruning
            (
                B.aux_postings(docs, aux_fields or [], numeric_aux_fields)
                .repartitionByRange(max(2, n_merge // 4), "term")
                .sortWithinPartitions("term")
                .write.mode("overwrite")
                .parquet(f"{index_dir}/aux")
            )
        all_lens = spark.read.parquet(f"{index_dir}/doclens/wave=*")
        row = all_lens.agg(F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")).collect()[0]
        manifest.commit_stage("segments")
        manifest.commit_stage("stats")
        manifest.commit_stage(
            "ready", n_docs=int(row["n"]), avgdl=float(row["avgdl"]), n_parts=len(parts)
        )
    return BuildReport(
        n_parts=len(parts),
        n_waves=n_waves,
        waves_run=waves_run,
        waves_skipped=waves_skipped,
        n_docs=n_docs,
    )


def remove_docs(spark: SparkSession, index_dir: str, doc_keys: list[int]) -> int:
    """Tombstone documents of a persisted index by doc_key — the reference's
    MiruIndexer.remove / MiruRemovalIndex (m-service/stream/MiruIndexer.java:
    128-162): posting segments stay IMMUTABLE; queries AND the removal
    complement (buildIndexMask, m-plugin/bitmap/MiruBitmaps.java:133-139).
    Append-only and idempotent (the mask is a set — duplicate tombstones are
    harmless); a fingerprint-mismatch rebuild wipes ``removed/`` because a
    rebuilt index assigns fresh doc identities."""
    import json

    with open(os.path.join(index_dir, "manifest.json")) as f:
        manifest = json.load(f)
    if not manifest["stages"].get("ready"):
        raise ValueError(f"index at {index_dir} is not ready — build it first")
    df = spark.createDataFrame([(int(k),) for k in doc_keys], "doc_key long")
    df.coalesce(1).write.mode("append").parquet(f"{index_dir}/removed")
    return len(doc_keys)


def load_index(spark: SparkSession, index_dir: str, docs: DataFrame | None = None) -> B.IndexHandle:
    """Open a persisted index as an IndexHandle (flat view decoded lazily)."""
    import json

    with open(os.path.join(index_dir, "manifest.json")) as f:
        manifest = json.load(f)
    if not manifest["stages"].get("ready"):
        raise ValueError(f"index at {index_dir} is not ready (resume the build)")
    fp = manifest.get("fingerprint", {})
    if fp.get("format_version") != FORMAT_VERSION:
        raise ValueError(
            f"index at {index_dir} has format_version={fp.get('format_version')} "
            f"(need {FORMAT_VERSION}) — rebuild it (older layouts lack columns "
            f"like packed.first_id; mixing them corrupts queries silently)"
        )
    info = manifest.get("stage_info", {}).get("ready", {})
    packed = spark.read.parquet(f"{index_dir}/postings")
    lens = spark.read.parquet(f"{index_dir}/doclens/wave=*")
    aux = None
    if os.path.isdir(os.path.join(index_dir, "aux")):
        aux = spark.read.parquet(f"{index_dir}/aux")
    # forward-index completeness comes from the MANIFEST, never from mere
    # directory existence: the fingerprint pins forward on/off for every
    # wave, so the glob below is all-or-nothing by construction
    forward = None
    if fp.get("forward") and os.path.isdir(os.path.join(index_dir, "forward")):
        forward = spark.read.parquet(f"{index_dir}/forward/wave=*")
    removed = None
    if os.path.isdir(os.path.join(index_dir, "removed")):
        rm_keys = spark.read.parquet(f"{index_dir}/removed")
        removed = (
            lens.select("part", "doc_id", "doc_key")
            .join(rm_keys, "doc_key", "left_semi")
            .select("part", "doc_id")
        )
    return B.IndexHandle(
        docs=docs,
        flat=B.unpack_postings(packed),
        segments=None,
        packed=packed,
        stats=spark.read.parquet(f"{index_dir}/stats"),
        lens=lens.select("part", "doc_id", "doc_key", "dl"),
        corpus=B.CorpusStats(n_docs=int(info["n_docs"]), avgdl=float(info["avgdl"])),
        hot_terms=[],
        lazy=True,
        aux=aux,
        forward=forward,
        removed=removed,
        stopwords=(
            frozenset(fp["stopwords"].split(",")) if fp.get("stopwords") else None
        ),
    )
