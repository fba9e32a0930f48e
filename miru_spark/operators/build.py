"""Inverted-index construction (SURVEY.md §2.3, §3.1).

Pipeline (idiomatic Spark, every stage declarative until the final pack):

    docs        = source rows + (part, doc_id, dl, tokens, content_sha)
    flat        = explode(tokens) → groupBy(part, term, doc_id).count()   [tf]
    segments    = groupBy(part, term).agg(sorted (doc_id, tf) list, df, Σtf)
                  — with explicit salting of hot terms (two-stage agg)
    packed      = delta+varint binary + block-max metadata (mapInArrow)
    term_stats  = groupBy(term).agg(Σdf, Σtf)     [global BM25/TF-IDF stats]
    doclens     = (part, doc_id, dl)              [BM25 norms]

Reference parity:
  * partition-local dense doc ids — MiruPartitionedActivity.index
    (miru-api/.../activity/MiruPartitionedActivity.java:58), rollover at
    capacity (miru-writer/.../MiruPartitionCursor.java:25-27);
  * posting-list construction with per-doc tf —
    MiruIndexPrimaryFields.compose (miru-service/.../stream/
    MiruIndexPrimaryFields.java:37-96, HashMultiset tf at :62-74);
  * global Σtf cell per term (docId=-1) — LabFieldIndex.mergeCardinalities
    (miru-service/.../index/lab/LabFieldIndex.java:510-535) → our
    ``term_stats.cum_tf``;
  * delta→merge with skew control — LargestFirstMergeChits recast as a
    shuffle with explicit hot-term salting (north_rule).

Scale notes (100 TB / 1000 executors):
  * both groupBys are map-side combinable; keys (part, term[, doc_id]) are
    high-cardinality, so no reducer sees more than one posting list;
  * a hot term's list within one part is bounded by ``capacity``; the salting
    path bounds the *sort* cost of collect_list for hot terms by splitting
    the aggregation into S sub-lists merged in a second (tiny) agg;
  * term_stats aggregates ≤ n_parts rows per term (partial agg), never raw
    postings — no skew;
  * no driver-side loops; the only Python is the Arrow-batched pack.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from miru_spark import codec
from miru_spark.tokenize import content_sha_col, tokens_col

DEFAULT_CAPACITY = 1_000_000  # docs per partition (Miru: "millions", README.md:12)
DEFAULT_SALT_BUCKETS = 8
DEFAULT_HOT_TERM_DF = 100_000  # per-part df above which a term is salted


def prepare_docs(
    df: DataFrame,
    text_col: str = "content",
    dense_id_col: str | None = None,
    natural_key: list[str] | None = None,
    capacity: int = DEFAULT_CAPACITY,
) -> DataFrame:
    """Attach (part, doc_id, doc_key, dl, tokens, content_sha) to source rows.

    Two deterministic id schemes (doc ids must be a pure function of the data
    — SURVEY.md §7 "Dense doc-id stability"):

    * ``dense_id_col``: an existing dense id (e.g. testdata ``doc_id``) maps
      to Miru's time-ordered rollover: part = id // capacity,
      doc_id = id % capacity (miru-writer/.../AmzaPartitionIdProvider.java:132-189).
    * ``natural_key``: hash-partition on the key, dense rank within the
      partition ordered by the key — stable under any scheduling.
    """
    if dense_id_col is None and natural_key is None:
        raise ValueError("need dense_id_col or natural_key")
    out = df.withColumn("tokens", tokens_col(text_col)).withColumn(
        "content_sha", content_sha_col(text_col)
    )
    if dense_id_col is not None:
        # doc_key first: dense_id_col may itself be named "doc_id" and would
        # be shadowed by the partition-local doc_id we add next.
        out = out.withColumn("doc_key", F.col(dense_id_col).cast("long"))
        gid = F.col("doc_key")
        out = out.withColumn("part", (gid / capacity).cast("int")).withColumn(
            "doc_id", (gid % capacity).cast("int")
        )
    else:
        key = F.concat_ws("\x00", *[F.col(c) for c in natural_key])
        n_parts = max(1, df.sparkSession.sparkContext.defaultParallelism)
        out = out.withColumn("part", F.pmod(F.xxhash64(key), F.lit(n_parts)).cast("int"))
        w = Window.partitionBy("part").orderBy(*[F.col(c) for c in natural_key])
        out = out.withColumn("doc_id", (F.row_number().over(w) - 1).cast("int"))
        out = out.withColumn(
            "doc_key", F.col("part").cast("long") * capacity + F.col("doc_id")
        )
    return out.withColumn("dl", F.size("tokens"))


def flat_postings(docs: DataFrame) -> DataFrame:
    """(part, term, doc_id, tf) — the uncompressed logical posting relation."""
    return (
        docs.select("part", "doc_id", F.explode("tokens").alias("term"))
        .groupBy("part", "term", "doc_id")
        .agg(F.count(F.lit(1)).cast("int").alias("tf"))
    )


def detect_hot_terms(flat: DataFrame, hot_df_threshold: int, max_hot: int = 1024) -> list[str]:
    """Terms whose per-part df exceeds the threshold anywhere — salting set.

    Data-driven, not hard-coded (SURVEY.md §7 risk list); cheap because the
    count aggregates map-side first.
    """
    rows = (
        flat.groupBy("part", "term")
        .count()
        .filter(F.col("count") > hot_df_threshold)
        .select("term")
        .distinct()
        .limit(max_hot)
        .collect()
    )
    return sorted(r["term"] for r in rows)


def build_segments(
    flat: DataFrame,
    hot_terms: list[str] | None = None,
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """Per-(part, term) sorted posting lists with df / Σtf.

    Hot terms take a two-stage aggregation: stage 1 groups on an extra
    ``salt = doc_id % S`` so no single reducer sorts the whole hot list;
    stage 2 merges the S sub-lists. Output is byte-identical either way
    (asserted in tests) — the salt only reshapes the shuffle.
    """
    plist = F.struct(F.col("doc_id"), F.col("tf"))
    if not hot_terms:
        return flat.groupBy("part", "term").agg(
            F.sort_array(F.collect_list(plist)).alias("plist"),
            F.count(F.lit(1)).alias("df_part"),
            F.sum("tf").alias("cum_tf_part"),
        )
    is_hot = F.col("term").isin(hot_terms)
    salted = flat.withColumn(
        "salt", F.when(is_hot, F.pmod(F.col("doc_id"), F.lit(salt_buckets))).otherwise(F.lit(0))
    )
    sub = salted.groupBy("part", "term", "salt").agg(
        F.sort_array(F.collect_list(plist)).alias("subplist"),
        F.count(F.lit(1)).alias("df_s"),
        F.sum("tf").alias("cum_s"),
    )
    return sub.groupBy("part", "term").agg(
        F.sort_array(F.flatten(F.collect_list("subplist"))).alias("plist"),
        F.sum("df_s").alias("df_part"),
        F.sum("cum_s").alias("cum_tf_part"),
    )


PACKED_SCHEMA = (
    "part int, term string, df_part long, cum_tf_part long, "
    "ids binary, tfs binary, block_last array<long>, block_max_tf array<long>"
)


def pack_segments(segments: DataFrame) -> DataFrame:
    """Delta+varint-pack posting lists and attach block-max metadata.

    Arrow-batched; per-row work is numpy slicing over the flattened list
    child arrays (no per-posting Python).
    """

    def _pack(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            plist = tbl.column("plist").combine_chunks()
            if isinstance(plist, pa.ChunkedArray):
                plist = plist.chunk(0) if plist.num_chunks else pa.array([], plist.type)
            offsets = np.asarray(plist.offsets)
            child = plist.values
            doc_ids = np.asarray(child.field("doc_id"))
            tfs = np.asarray(child.field("tf"))
            n = len(offsets) - 1
            ids_b, tfs_b, bl_l, bm_l = [], [], [], []
            for i in range(n):
                lo, hi = offsets[i], offsets[i + 1]
                d, t = doc_ids[lo:hi], tfs[lo:hi]
                ids_b.append(codec.delta_pack(d))
                tfs_b.append(codec.tf_pack(t))
                last, mx = codec.block_metadata(d, t)
                bl_l.append(last.tolist())
                bm_l.append(mx.tolist())
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("part"),
                    batch.column("term"),
                    batch.column("df_part"),
                    batch.column("cum_tf_part"),
                    pa.array(ids_b, pa.binary()),
                    pa.array(tfs_b, pa.binary()),
                    pa.array(bl_l, pa.list_(pa.int64())),
                    pa.array(bm_l, pa.list_(pa.int64())),
                ],
                names=[
                    "part", "term", "df_part", "cum_tf_part",
                    "ids", "tfs", "block_last", "block_max_tf",
                ],
            )

    cols = ["part", "term", "df_part", "cum_tf_part", "plist"]
    return segments.select(*cols).mapInArrow(_pack, PACKED_SCHEMA)


def unpack_postings(packed: DataFrame) -> DataFrame:
    """Inverse of pack_segments → flat (part, term, doc_id, tf)."""

    def _unpack(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            parts = batch.column("part").to_numpy(zero_copy_only=False)
            terms = batch.column("term").to_pylist()
            ids_col = batch.column("ids").to_pylist()
            tfs_col = batch.column("tfs").to_pylist()
            out_part, out_term, out_doc, out_tf = [], [], [], []
            for p, term, ib, tb in zip(parts, terms, ids_col, tfs_col):
                d = codec.delta_unpack(ib)
                t = codec.tf_unpack(tb)
                out_part.append(np.full(len(d), p, dtype=np.int32))
                out_term.extend([term] * len(d))
                out_doc.append(d.astype(np.int32))
                out_tf.append(t.astype(np.int32))
            if out_part:
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(np.concatenate(out_part)),
                        pa.array(out_term, pa.string()),
                        pa.array(np.concatenate(out_doc)),
                        pa.array(np.concatenate(out_tf)),
                    ],
                    names=["part", "term", "doc_id", "tf"],
                )

    return packed.select("part", "term", "ids", "tfs").mapInArrow(
        _unpack, "part int, term string, doc_id int, tf int"
    )


def term_stats(segments: DataFrame) -> DataFrame:
    """Global per-term stats: df (# docs) and cum_tf (Σtf, the reference's
    docId=-1 global cardinality cell, LabFieldIndex.java:510-535)."""
    return segments.groupBy("term").agg(
        F.sum("df_part").alias("df"), F.sum("cum_tf_part").alias("cum_tf")
    )


def doclens(docs: DataFrame) -> DataFrame:
    return docs.select("part", "doc_id", "doc_key", "dl")


@dataclass
class CorpusStats:
    n_docs: int
    avgdl: float


def corpus_stats(docs: DataFrame) -> CorpusStats:
    row = docs.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    return CorpusStats(n_docs=int(row["n"]), avgdl=float(row["avgdl"]))


@dataclass
class IndexHandle:
    """In-memory handle over the built index artifacts."""

    docs: DataFrame          # source + (part, doc_id, doc_key, dl, tokens, content_sha)
    flat: DataFrame          # (part, term, doc_id, tf)
    segments: DataFrame      # (part, term, plist, df_part, cum_tf_part)
    packed: DataFrame        # delta+varint blocks
    stats: DataFrame         # (term, df, cum_tf)
    lens: DataFrame          # (part, doc_id, doc_key, dl)
    corpus: CorpusStats
    hot_terms: list[str]


def build_index(
    docs_source: DataFrame,
    text_col: str = "content",
    dense_id_col: str | None = None,
    natural_key: list[str] | None = None,
    capacity: int = DEFAULT_CAPACITY,
    hot_df_threshold: int = DEFAULT_HOT_TERM_DF,
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
    cache: bool = True,
) -> IndexHandle:
    docs = prepare_docs(docs_source, text_col, dense_id_col, natural_key, capacity)
    if cache:
        docs = docs.cache()
    flat = flat_postings(docs)
    hot = detect_hot_terms(flat, hot_df_threshold) if hot_df_threshold else []
    segments = build_segments(flat, hot, salt_buckets)
    packed = pack_segments(segments)
    stats = term_stats(segments)
    if cache:
        flat = flat.cache()
        stats = stats.cache()
    return IndexHandle(
        docs=docs,
        flat=flat,
        segments=segments,
        packed=packed,
        stats=stats,
        lens=doclens(docs),
        corpus=corpus_stats(docs),
        hot_terms=hot,
    )
