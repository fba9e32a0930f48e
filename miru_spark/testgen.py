"""Deterministic synthetic fixtures at arbitrary scale (the sf1.0
scale-proof tables).

The driver ships read-only parquet at sf ∈ {0.001, 0.01, 0.1}
(/root/testdata, TESTDATA.md). Scale-proofing a decade beyond them needs
same-SHAPE tables at 10× — this module regenerates the five tables the
query gate touches (documents / events / embeddings / orders / lineitem)
with the measured distributions of the driver fixtures (vocab, lang mix,
doc lengths, event types, user cardinality, per-sf row counts), seeded and
partition-independent: every row is a pure function of (seed, row id) —
per-row PCG64 streams for the text/vector kernels, hash-derived columns for
the scalar tables — so the output is byte-stable across cluster widths.

These are NOT the driver's bytes (its generator is not shipped); the sf1.0
correctness gate is self-consistent — our Spark operators vs DuckDB SQL
over the SAME generated parquet — exactly like the driver's own gate.

Row counts per sf (matching the driver's observed scaling): documents
50k·sf, events 1M·sf, orders 1.5M·sf, lineitem 6M·sf, users 15k·sf;
embeddings follow the driver's gentler curve (500 @0.01, 2000 @0.1 →
8000 @1.0). ~2.5% of docs form planted near-dup pairs carrying the 'dup'
token (the fixture's dedup truth set: 25 'dup' docs / 25 jaccard pairs at
sf0.01).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
_BASE = [w for w in VOCAB if w != "dup"]  # 'dup' only in planted near-dups
LANGS = ["en", "zh", "es", "de", "fr"]
LANG_P = [0.436, 0.15, 0.146, 0.14, 0.128]  # measured sf0.01 mix
EVENT_TYPES = ["error", "view", "click", "signup", "purchase"]
EMB_DIM = 64
SEED = 20260817


def counts_for_sf(sf: float) -> dict[str, int]:
    return {
        "documents": int(50_000 * sf),
        "events": int(1_000_000 * sf),
        "orders": int(1_500_000 * sf),
        "lineitem": int(6_000_000 * sf),
        "users": int(15_000 * sf),
        # driver curve: ×4 per decade, not ×10 (all-pairs oracle cost)
        "embeddings": int(2000 * (sf / 0.1) ** 0.6) if sf != 0.01 else 500,
    }


def _documents(spark: SparkSession, n: int) -> DataFrame:
    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(0).to_numpy(zero_copy_only=False)
            texts, langs, sources = [], [], []
            for i in ids:
                i = int(i)
                # planted near-dup pairs: (40k+6, 40k+7) share a base text
                # with a 2-word mutation and carry the 'dup' token
                base_id = i - 1 if i % 40 == 7 else i
                rng = np.random.Generator(np.random.PCG64((SEED << 20) + base_id))
                n_words = int(rng.integers(10, 100))
                words = list(rng.choice(_BASE, size=n_words))
                if base_id % 40 == 6:
                    words[int(rng.integers(0, n_words))] = "dup"
                    if i != base_id:  # the mutated twin
                        mrng = np.random.Generator(np.random.PCG64((SEED << 21) + i))
                        for _ in range(2):
                            words[int(mrng.integers(0, n_words))] = str(
                                mrng.choice(_BASE)
                            )
                texts.append(" ".join(words))
                lrng = np.random.Generator(np.random.PCG64((SEED << 22) + i))
                langs.append(str(lrng.choice(LANGS, p=LANG_P)))
                sources.append(f"src{int(lrng.integers(0, 20))}")
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, pa.int64()),
                    pa.array(texts, pa.string()),
                    pa.array(langs, pa.string()),
                    pa.array(sources, pa.string()),
                    pa.array([len(t) for t in texts], pa.int64()),
                ],
                names=["doc_id", "text", "lang", "source", "n_chars"],
            )

    return spark.range(n).mapInArrow(
        gen, "doc_id long, text string, lang string, source string, n_chars long"
    )


def _events(spark: SparkSession, n: int, n_users: int) -> DataFrame:
    # pure Catalyst: hash-derived pseudo-random columns, 30 days of Jan 2024
    h = lambda salt: F.abs(F.xxhash64(F.col("id"), F.lit(salt)))
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), (h("ts") % 2_592_000_000_000) / 1e6)
        ).alias("ts"),
        (h("u") % n_users).alias("user_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in EVENT_TYPES]), (h("t") % 5 + 1).cast("int")
        ).alias("event_type"),
        F.round((h("v") % 49_002) / 100.0 + 0.01, 2).alias("value"),
        F.concat(F.lit('{"k": '), (h("p") % 100).cast("string"), F.lit("}")).alias(
            "props"
        ),
    )


def _embeddings(spark: SparkSession, n: int) -> DataFrame:
    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(0).to_numpy(zero_copy_only=False)
            vecs, labels = [], []
            for i in ids:
                rng = np.random.Generator(np.random.PCG64((SEED << 23) + int(i)))
                v = rng.standard_normal(EMB_DIM)
                v = (v / np.linalg.norm(v)).astype(np.float32)
                vecs.append(v)
                labels.append(int(i) % 10)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, pa.int64()),
                    pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
                    pa.array(labels, pa.int32()),
                ],
                names=["vec_id", "embedding", "label"],
            )

    return spark.range(n).mapInArrow(
        gen, "vec_id long, embedding array<float>, label int"
    )


def _orders(spark: SparkSession, n: int) -> DataFrame:
    h = lambda salt: F.abs(F.xxhash64(F.col("id"), F.lit(salt)))
    n_cust = max(1, n // 10)
    return spark.range(n).select(
        F.col("id").alias("o_orderkey"),
        (h("c") % n_cust).alias("o_custkey"),
        F.element_at(F.array(F.lit("O"), F.lit("F"), F.lit("P")), (h("s") % 3 + 1).cast("int")).alias("o_orderstatus"),
        F.round((h("p") % 50_000_000) / 100.0, 2).alias("o_totalprice"),
        (
            F.to_timestamp(F.lit("1995-01-01 00:00:00"))
            + F.make_dt_interval((h("d") % 1460).cast("int"), F.lit(0), F.lit(0), F.lit(0))
        ).alias("o_orderdate"),
        F.element_at(
            F.array(*[F.lit(p) for p in ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]]),
            (h("pr") % 5 + 1).cast("int"),
        ).alias("o_orderpriority"),
    )


def _lineitem(spark: SparkSession, n: int, n_orders: int, n_parts: int) -> DataFrame:
    h = lambda salt: F.abs(F.xxhash64(F.col("id"), F.lit(salt)))
    return spark.range(n).select(
        (h("o") % n_orders).alias("l_orderkey"),
        (h("p") % n_parts).alias("l_partkey"),
        (h("s") % max(1, n_parts // 4)).alias("l_suppkey"),
        (F.col("id") % 7 + 1).cast("int").alias("l_linenumber"),
        ((h("q") % 50) + 1.0).alias("l_quantity"),
        F.round((h("e") % 10_000_000) / 100.0, 2).alias("l_extendedprice"),
        F.round((h("d") % 11) / 100.0, 2).alias("l_discount"),
        F.round((h("t") % 9) / 100.0, 2).alias("l_tax"),
        F.element_at(F.array(F.lit("A"), F.lit("N"), F.lit("R")), (h("rf") % 3 + 1).cast("int")).alias("l_returnflag"),
        F.element_at(F.array(F.lit("O"), F.lit("F")), (h("ls") % 2 + 1).cast("int")).alias("l_linestatus"),
        (
            F.to_timestamp(F.lit("1995-01-01 00:00:00"))
            + F.make_dt_interval((h("sd") % 1460).cast("int"), F.lit(0), F.lit(0), F.lit(0))
        ).alias("l_shipdate"),
    )


def generate_sf(spark: SparkSession, out_dir: str, sf: float) -> dict[str, int]:
    """Write the five gate tables for scale factor ``sf`` under out_dir."""
    c = counts_for_sf(sf)
    _documents(spark, c["documents"]).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )
    _events(spark, c["events"], c["users"]).write.mode("overwrite").parquet(
        f"{out_dir}/events.parquet"
    )
    _embeddings(spark, c["embeddings"]).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )
    _orders(spark, c["orders"]).write.mode("overwrite").parquet(
        f"{out_dir}/orders.parquet"
    )
    _lineitem(
        spark, c["lineitem"], c["orders"], max(1, c["documents"] // 2)
    ).write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")
    return c
