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
# per-wave forward flags; v3: removed/ stores (part, doc_id, doc_key) instances
# so version repair can tombstone the OLD instance of a doc_key without
# masking its replacement; v4: per-posting dls/keys packed columns make the
# postings self-contained for scoring — queries stop joining the O(corpus)
# doclens relation, and aux/ carries doc_key). Part of the fingerprint, so an
# index written by older code forces a clean rebuild instead of mixing
# schemas across waves; load_index refuses older dirs outright.
FORMAT_VERSION = 4


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
    stemmer: str | None = None,
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
        "stemmer": stemmer or "",
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
        flat = B.flat_postings(tokenize_src, text_col, stopwords, stemmer)
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
            # the content); doc-sorted so gather's semi-join prunes files.
            # Only the 4 forward columns — dl/doc_key stay in the postings.
            (
                B.unpack_postings(spark.read.parquet(f"{index_dir}/segments/wave={wave_id}"))
                .select("part", "doc_id", "term", "tf")
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
    keys = spark.createDataFrame([(int(k),) for k in doc_keys], "doc_key long")
    # tombstones are INSTANCES (part, doc_id, doc_key), resolved against the
    # doc-length relation at write time: after a version repair the same
    # doc_key has a live replacement instance, and removing the key then
    # tombstones BOTH (delete-after-repair = doc fully gone)
    inst = (
        spark.read.parquet(f"{index_dir}/doclens/wave=*")
        .select("part", "doc_id", "doc_key")
        .join(F.broadcast(keys), "doc_key", "left_semi")
    )
    inst.coalesce(1).write.mode("append").parquet(f"{index_dir}/removed")
    return len(doc_keys)


def upsert_docs(
    spark: SparkSession,
    index_dir: str,
    new_docs: DataFrame,
    doc_key_col: str | None = None,
    merge_partitions: int | None = None,
) -> dict:
    """Version repair on a persisted index — MiruIndexer.set for a doc that
    arrives with a higher version (m-service/stream/MiruIndexer.java:128-162):
    the old content must vanish from every answer and the new content must
    index, while posting segments stay IMMUTABLE.

    Batch restatement: (1) tombstone the doc_key's existing instance(s) via
    the removal index (``removed/`` (part, doc_id, doc_key) rows), (2) append
    a REPAIR WAVE of fresh (part, doc_id) identities carrying the SAME
    doc_key with the new content (parts numbered beyond the build's range so
    identities never collide), (3) re-run the term-range merge over all
    segments and write stats CORRECTED by subtracting the tombstoned
    instances' per-term contributions (from the forward index — the repair
    set is small, so this is a pruned semi-join, never a corpus rescan).
    After repair, query results equal a fresh build over the repaired corpus
    (asserted in tests/test_resume.py).

    ``doc_key_col`` defaults to the build's dense id column; a natural-key
    index must pass resolved doc_keys explicitly. Unknown doc_keys are pure
    inserts (the reference's set-with-no-prior). Repair batches are expected
    ≪ capacity (the reference repairs doc-at-a-time); the old-instance set is
    collected driver-side to pin the pre-repair doclens listing."""
    import json

    from pyspark.sql import Window

    with open(os.path.join(index_dir, "manifest.json")) as f:
        mdata = json.load(f)
    if not mdata["stages"].get("ready"):
        raise ValueError(f"index at {index_dir} is not ready — build it first")
    fp = mdata["fingerprint"]
    if fp.get("format_version") != FORMAT_VERSION:
        raise ValueError(f"index format {fp.get('format_version')} != {FORMAT_VERSION}")
    text_col = fp["text_col"]
    capacity = int(fp["capacity"])
    stopwords = frozenset(fp["stopwords"].split(",")) if fp.get("stopwords") else None
    stemmer = fp.get("stemmer") or None
    aux_fields = [c for c in fp.get("aux", "").split(",") if c]
    num_aux = [c for c in fp.get("num_aux", "").split(",") if c]
    key_col = doc_key_col or fp["id"]
    if not key_col or "," in key_col:
        raise ValueError(
            "natural-key index: pass doc_key_col with pre-resolved doc_keys"
        )

    rep = new_docs.withColumn("content_sha", B.content_sha_col(text_col)).withColumn(
        "doc_key", F.col(key_col).cast("long")
    )
    n_rep = rep.count()
    if n_rep == 0:
        return {"repaired": 0, "inserted": 0, "wave": None}
    if rep.select("doc_key").distinct().count() != n_rep:
        raise ValueError("upsert batch has duplicate doc_keys")

    # pin the PRE-repair doclens listing: the old instances must be resolved
    # (and collected) before the repair wave lands in the same glob
    lens_old = spark.read.parquet(f"{index_dir}/doclens/wave=*")
    old_inst = (
        lens_old.select("part", "doc_id", "doc_key")
        .join(F.broadcast(rep.select("doc_key")), "doc_key", "left_semi")
        .collect()
    )
    max_part = lens_old.agg(F.max("part")).collect()[0][0] or 0
    repair_base = int(max_part) + 1
    wave_id = max((int(k) for k in mdata["waves"]), default=-1) + 1

    # validate EVERY precondition before the first destructive write — a
    # raise after the removed/ append or the postings merge would leave the
    # index half-repaired (old instances tombstoned, stats/manifest stale)
    if old_inst and not fp.get("forward"):
        raise ValueError(
            "upsert on a forward_index=False build cannot correct term "
            "stats without a corpus rescan — rebuild with forward_index=True"
        )
    if aux_fields or num_aux:
        missing = [c for c in aux_fields + num_aux if c not in rep.columns]
        if missing:
            raise ValueError(f"upsert docs missing indexed aux fields: {missing}")

    if old_inst:
        spark.createDataFrame(
            [(r["part"], r["doc_id"], r["doc_key"]) for r in old_inst],
            "part int, doc_id int, doc_key long",
        ).coalesce(1).write.mode("append").parquet(f"{index_dir}/removed")

    n_rep_parts = max(1, -(-n_rep // capacity))
    rep = rep.withColumn(
        "part",
        (F.lit(repair_base) + F.pmod(F.xxhash64("doc_key"), F.lit(n_rep_parts))).cast("int"),
    )
    w = Window.partitionBy("part").orderBy("doc_key")
    rep = rep.withColumn("doc_id", (F.row_number().over(w) - 1).cast("int")).cache()

    flat = B.flat_postings(rep, text_col, stopwords, stemmer)
    packed = B.packed_from_flat(flat)
    (
        packed.repartition("part")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(f"{index_dir}/segments/wave={wave_id}")
    )
    B.doc_meta(rep, flat).write.mode("overwrite").parquet(
        f"{index_dir}/doclens/wave={wave_id}"
    )
    if fp.get("forward"):
        (
            B.unpack_postings(spark.read.parquet(f"{index_dir}/segments/wave={wave_id}"))
            .select("part", "doc_id", "term", "tf")
            .repartition("part")
            .sortWithinPartitions("part", "doc_id", "term")
            .write.mode("overwrite")
            .parquet(f"{index_dir}/forward/wave={wave_id}")
        )
    if aux_fields or num_aux:
        # columns validated up front, before the first write
        B.aux_postings(rep, aux_fields, num_aux).coalesce(1).write.mode("append").parquet(
            f"{index_dir}/aux"
        )

    # merge + corrected stats: subtract the tombstoned instances' per-term
    # (df, Σtf) via the forward index (partition-pruned semi-join) — without
    # this the repaired terms double-count and BM25 diverges from a fresh
    # build over the repaired corpus. Plain remove_docs deliberately does NOT
    # adjust stats (reference keeps global cells; the removal oracle models
    # that); repair must, because the replacement re-contributes.
    all_segments = spark.read.parquet(f"{index_dir}/segments/wave=*")
    n_merge = merge_partitions or max(4, spark.sparkContext.defaultParallelism)
    (
        all_segments.repartitionByRange(n_merge, "term", "part")
        .sortWithinPartitions("term", "part")
        .write.mode("overwrite")
        .parquet(f"{index_dir}/postings")
    )
    stats = B.term_stats(all_segments.select("term", "df_part", "cum_tf_part"))
    if old_inst:
        if fp.get("forward"):
            old_parts = sorted({r["part"] for r in old_inst})
            old_df = spark.createDataFrame(
                [(r["part"], r["doc_id"]) for r in old_inst], "part int, doc_id int"
            )
            rm_flat = (
                spark.read.parquet(f"{index_dir}/forward/wave=*")
                .filter(F.col("part").isin(old_parts))
                .join(F.broadcast(old_df), ["part", "doc_id"], "left_semi")
            )
            rm_stats = rm_flat.groupBy("term").agg(
                F.count(F.lit(1)).alias("df_rm"), F.sum("tf").alias("cum_tf_rm")
            )
            stats = (
                stats.join(F.broadcast(rm_stats), "term", "left")
                .select(
                    "term",
                    (F.col("df") - F.coalesce("df_rm", F.lit(0))).alias("df"),
                    (F.col("cum_tf") - F.coalesce("cum_tf_rm", F.lit(0))).alias("cum_tf"),
                )
                .filter(F.col("df") > 0)
            )
        else:  # pragma: no cover — rejected up front, before any write
            raise AssertionError("forward_index precondition validated earlier")
    stats.coalesce(4).write.mode("overwrite").parquet(f"{index_dir}/stats")

    # live corpus stats (all instances minus tombstones)
    live = spark.read.parquet(f"{index_dir}/doclens/wave=*")
    if os.path.isdir(os.path.join(index_dir, "removed")):
        live = live.join(
            spark.read.parquet(f"{index_dir}/removed").select("part", "doc_id").distinct(),
            ["part", "doc_id"],
            "left_anti",
        )
    row = live.agg(F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")).collect()[0]

    manifest = Manifest(path=os.path.join(index_dir, "manifest.json"), data=mdata)
    seg_counts = {
        str(r["part"]): {"n_segments": r["n_segments"], "n_postings": r["n_postings"], "repair": True}
        for r in spark.read.parquet(f"{index_dir}/segments/wave={wave_id}")
        .groupBy("part")
        .agg(F.count(F.lit(1)).alias("n_segments"), F.sum("df_part").alias("n_postings"))
        .collect()
    }
    manifest.commit_wave(wave_id, sorted(int(p) for p in seg_counts), seg_counts)
    info = mdata.get("stage_info", {}).get("ready", {})
    manifest.commit_stage(
        "ready",
        n_docs=int(row["n"]),
        avgdl=float(row["avgdl"]),
        n_parts=int(info.get("n_parts", 0)) + n_rep_parts,
    )
    rep.unpersist()
    return {
        "repaired": len(old_inst),
        "inserted": n_rep - len({r["doc_key"] for r in old_inst}),
        "wave": wave_id,
    }


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
        removed = (
            spark.read.parquet(f"{index_dir}/removed")
            .select("part", "doc_id")
            .distinct()
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
        stemmer=fp.get("stemmer") or None,
    )
