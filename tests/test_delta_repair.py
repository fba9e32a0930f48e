"""O(delta) repair + budgeted compaction (round-6 top ask; the reference's
delta-merge-under-chit-budget shape, miru-service/.../partition/
MiruMergeChits.java:8-16 + LargestFirstMergeChits.java:20-90):

* upsert_docs must touch NOTHING under the merged postings/stats layout —
  a one-doc repair costs O(delta), never a corpus re-merge;
* a crash before the single manifest-save commit point leaves the index
  serving the pre-repair state exactly, and a retry converges;
* compact() folds delta waves largest-first under a posting budget with
  byte-identical query results before and after.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from miru_spark.index_store import (
    build_persistent,
    compact,
    load_index,
    remove_docs,
    upsert_docs,
)
from miru_spark.operators import fulltext
from miru_spark.operators import wand as wand_ops

KW = dict(
    text_col="text", dense_id_col="doc_id", capacity=128,
    hot_df_threshold=64, salt_buckets=4, wave_size=4, merge_partitions=4,
    aux_fields=["lang", "source"],
)

QUERIES = ["spark AND join", "zzzdelta OR merge", "s*", "lang:fr AND spark"]


def _snapshot(index_dir: str, sub: str) -> dict[str, float]:
    """name → mtime for every file under index_dir/sub (recursive)."""
    out = {}
    root = os.path.join(index_dir, sub)
    for dirpath, _, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            out[os.path.relpath(p, root)] = os.path.getmtime(p)
    return out


def _answers(spark, index_dir, k=25):
    idx = load_index(spark, index_dir)
    out = {}
    for q in QUERIES:
        out[q] = [
            (int(r["doc"]), r["score"])
            for r in fulltext.top_k(idx, q, k=k).collect()
        ]
    out["_stats_spark"] = [
        tuple(r) for r in idx.stats.filter(F.col("term") == "spark").collect()
    ]
    return out


@pytest.fixture(scope="module")
def repaired_dir(spark, documents, tmp_path_factory):
    """An index with TWO uncompacted repair waves (one repair, one insert)."""
    d = str(tmp_path_factory.mktemp("odelta") / "idx")
    build_persistent(documents, d, **KW)
    idx = load_index(spark, d)
    victim = int(fulltext.top_k(idx, "spark AND join", k=1).collect()[0]["doc"])
    # wave A: repair the victim
    upsert_docs(
        spark, d,
        documents.filter(F.col("doc_id") == victim)
        .withColumn("text", F.lit("zzzdelta fresh spark")),
    )
    # wave B: pure inserts (two brand-new doc_keys)
    base = documents.agg(F.max("doc_id")).collect()[0][0]
    ins = (
        documents.limit(2)
        .withColumn("doc_id", F.col("doc_id") + int(base) + 1)
        .withColumn("text", F.lit("zzzdelta insert join"))
    )
    upsert_docs(spark, d, ins)
    return d, victim


def test_upsert_touches_no_merged_artifact(spark, documents, tmp_path_factory):
    """Repair cost is decoupled from corpus size: the merged postings/ and
    the base stats/ file sets are BYTE-UNTOUCHED by an upsert — the repair
    lands purely as delta directories."""
    d = str(tmp_path_factory.mktemp("notouch") / "idx")
    build_persistent(documents, d, **KW)
    before_postings = _snapshot(d, "postings")
    before_stats = _snapshot(d, "stats")
    assert before_postings and before_stats
    row = documents.limit(1).withColumn("text", F.lit("zzznotouch spark"))
    rep = upsert_docs(spark, d, row)
    assert rep["repaired"] == 1
    assert _snapshot(d, "postings") == before_postings
    assert _snapshot(d, "stats") == before_stats
    # the delta artifacts exist and are manifest-listed
    with open(os.path.join(d, "manifest.json")) as f:
        m = json.load(f)
    (k,) = m["delta_waves"]
    assert os.path.isdir(os.path.join(d, f"segments/wave={k}"))
    assert os.path.isdir(os.path.join(d, f"stats_delta/wave={k}"))
    # and the repaired content answers
    hit = fulltext.top_k(load_index(spark, d), "zzznotouch", k=5).collect()
    assert len(hit) == 1


def test_compact_preserves_results_and_clears_deltas(spark, documents, repaired_dir):
    d, victim = repaired_dir
    before = _answers(spark, d)
    with open(os.path.join(d, "manifest.json")) as f:
        m = json.load(f)
    assert len(m["delta_waves"]) == 2
    rep = compact(spark, d)
    assert sorted(rep["merged"]) == sorted(int(k) for k in m["delta_waves"])
    assert rep["remaining"] == []
    with open(os.path.join(d, "manifest.json")) as f:
        m2 = json.load(f)
    assert m2["delta_waves"] == []
    assert m2["dirs"]["postings"] == f"postings_g{rep['gen']}"
    # old generation reclaimed
    assert not os.path.isdir(os.path.join(d, "postings"))
    after = _answers(spark, d)
    assert after == before
    # repaired doc still answers post-compaction
    hit = fulltext.top_k(load_index(spark, d), "zzzdelta", k=10).collect()
    assert victim in [int(r["doc"]) for r in hit]
    # idempotent no-op on a fully-compacted index
    assert compact(spark, d)["merged"] == []


def test_compact_budget_is_largest_first(spark, documents, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("budget") / "idx")
    build_persistent(documents, d, **KW)
    # wave A: 3 docs (larger), wave B: 1 doc
    a = documents.limit(3).withColumn("text", F.lit("zzzbig alpha beta gamma delta"))
    b = (
        documents.filter(F.col("doc_id") == 10)
        .withColumn("text", F.lit("zzzsmall"))
    )
    wa = upsert_docs(spark, d, a)["wave"]
    wb = upsert_docs(spark, d, b)["wave"]
    before = _answers(spark, d)
    # budget of 1 posting: still merges exactly ONE delta — the LARGEST
    rep = compact(spark, d, max_postings=1)
    assert rep["merged"] == [wa] and rep["remaining"] == [wb]
    assert _answers(spark, d) == before
    rep2 = compact(spark, d)
    assert rep2["merged"] == [wb]
    assert _answers(spark, d) == before


def test_upsert_crash_before_commit_is_invisible(spark, documents, tmp_path_factory):
    """A repair killed before the single manifest-save commit point leaves
    the index answering EXACTLY as before (orphan wave dirs are unlisted,
    so loads never see them); the retry converges to the repaired state."""
    d = str(tmp_path_factory.mktemp("crash") / "idx")
    build_persistent(documents, d, **KW)
    before = _answers(spark, d)
    row = documents.limit(1).withColumn("text", F.lit("zzzcrash spark"))
    with pytest.raises(RuntimeError, match="injected failure before upsert commit"):
        upsert_docs(spark, d, row, fail_before_commit=True)
    # orphan artifacts exist on disk…
    with open(os.path.join(d, "manifest.json")) as f:
        m = json.load(f)
    orphan = max(int(k) for k in m["waves"]) + 1
    assert os.path.isdir(os.path.join(d, f"segments/wave={orphan}"))
    # …but the index is bit-identical to pre-repair
    assert _answers(spark, d) == before
    assert fulltext.top_k(load_index(spark, d), "zzzcrash", k=5).count() == 0
    # retry lands the repair
    rep = upsert_docs(spark, d, row)
    assert rep["repaired"] == 1 and rep["wave"] == orphan
    hit = fulltext.top_k(load_index(spark, d), "zzzcrash", k=5).collect()
    assert len(hit) == 1
    # corpus stats stayed consistent through crash + retry (incremental
    # n/Σdl updates applied exactly once)
    fresh_dir = str(tmp_path_factory.mktemp("crash") / "fresh")
    vict = int(row.collect()[0]["doc_id"])
    build_persistent(
        documents.withColumn(
            "text",
            F.when(F.col("doc_id") == vict, F.lit("zzzcrash spark")).otherwise(
                F.col("text")
            ),
        ),
        fresh_dir,
        **KW,
    )
    a = load_index(spark, d).corpus
    b = load_index(spark, fresh_dir).corpus
    assert (a.n_docs, a.avgdl) == (b.n_docs, b.avgdl)


def test_remove_after_repair_and_compact(spark, documents, repaired_dir):
    d, victim = repaired_dir
    # removing the repaired doc_key kills the replacement instance too
    remove_docs(spark, d, [victim])
    idx = load_index(spark, d)
    assert fulltext.top_k(idx, "zzzdelta", k=20).filter(
        F.col("doc") == victim
    ).count() == 0
