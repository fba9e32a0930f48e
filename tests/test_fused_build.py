"""The fused per-partition build (strategy='fused' — MiruIndexer's shape:
tokenize+pack inside one task per doc-partition, zero posting shuffles) must
be indistinguishable from the shuffle-sort build: identical packed rows,
identical doc lengths (via the DL_TERM sentinel cell), identical queries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from miru_spark.operators import fulltext
from miru_spark.operators.build import DL_TERM, build_index


@pytest.fixture(scope="module")
def both(spark, documents):
    kw = dict(text_col="text", dense_id_col="doc_id", capacity=128)
    return (
        build_index(documents, strategy="sort", **kw),
        build_index(documents, strategy="fused", **kw),
    )


def _canon_packed(idx):
    rows = idx.packed.select(
        "part", "term", "df_part", "cum_tf_part", "ids", "tfs",
        "block_last", "block_max_tf",
    ).collect()
    return sorted(
        (r["part"], r["term"], r["df_part"], r["cum_tf_part"],
         bytes(r["ids"]), bytes(r["tfs"]),
         tuple(r["block_last"]), tuple(r["block_max_tf"]))
        for r in rows
    )


def test_fused_packed_byte_identical(both):
    i_sort, i_fused = both
    assert _canon_packed(i_sort) == _canon_packed(i_fused)


def test_fused_sentinel_not_visible(both):
    _, i_fused = both
    assert i_fused.packed.filter(F.col("term") == DL_TERM).count() == 0
    assert i_fused.stats.filter(F.col("term") == DL_TERM).count() == 0
    assert i_fused.flat.filter(F.col("term") == DL_TERM).count() == 0


def test_fused_lens_and_corpus_identical(both):
    i_sort, i_fused = both
    a = i_sort.lens.orderBy("doc_key").toPandas()
    b = i_fused.lens.orderBy("doc_key").toPandas()
    assert list(a["doc_key"]) == list(b["doc_key"])
    assert list(a["dl"]) == list(b["dl"])
    assert i_sort.corpus.n_docs == i_fused.corpus.n_docs
    assert abs(i_sort.corpus.avgdl - i_fused.corpus.avgdl) < 1e-12


def test_fused_queries_identical(both):
    i_sort, i_fused = both
    for q in ["spark AND join", "spark OR vector OR dup", "merge NOT window", "s*"]:
        a = fulltext.top_k(i_sort, q, k=50).toPandas()
        b = fulltext.top_k(i_fused, q, k=50).toPandas()
        assert list(a["doc"]) == list(b["doc"]), q
        assert list(a["score"]) == list(b["score"]), q
