"""WAND / TAAT / AND kernels over packed postings must be rank- AND
score-identical to the DataFrame query path (itself oracle-verified)."""

from __future__ import annotations

import pytest

from miru_spark.filters import parse_query
from miru_spark.operators import fulltext, wand

CASES = [
    ("spark", "bm25", "auto"),
    ("dup", "bm25", "auto"),
    ("spark AND join", "bm25", "auto"),
    ("spark join merge", "bm25", "auto"),
    ("spark OR vector OR dup", "bm25", "wand"),
    ("spark OR vector OR dup", "bm25", "taat"),
    ("merge NOT window", "bm25", "auto"),
    ("s*", "bm25", "wand"),
    ("s*", "bm25", "taat"),
    ("dup AND s*", "bm25", "auto"),
    ("spark OR join", "miru_tfidf", "auto"),
]


@pytest.mark.parametrize("q,scorer,kernel", CASES)
def test_wand_matches_dataframe_path(doc_index, q, scorer, kernel):
    spec = parse_query(q, k=50, scorer=scorer)
    want = fulltext.top_k(doc_index, spec).toPandas()
    got = wand.wand_topk(doc_index, spec, kernel=kernel).toPandas()
    assert list(got["doc"]) == list(want["doc"]), f"{q} ({kernel}) ids diverge"
    assert list(got["score"]) == list(want["score"]), f"{q} ({kernel}) scores diverge"


def test_wand_unknown_term_empty(doc_index):
    assert wand.wand_topk(doc_index, "zzzznotaterm", k=10).count() == 0


def test_wand_prunes(doc_index):
    # sanity: the WAND kernel returns exactly k when more docs match
    spec = parse_query("spark OR merge", k=7)
    got = wand.wand_topk(doc_index, spec, kernel="wand").toPandas()
    assert len(got) == 7


def test_and_with_unmatchable_prefix_clause_is_empty(doc_index):
    # 'spark AND qqqzz*' where no term starts with qqqzz: the conjunction is
    # unsatisfiable. The kernel path must agree with score_candidates'
    # matched == len(positive) semantics instead of silently dropping the
    # empty clause and returning all 'spark' docs.
    from miru_spark.operators import fulltext as ft
    from miru_spark.operators import wand as wand_ops

    assert wand_ops.wand_topk(doc_index, "spark AND qqqzz*", k=10).count() == 0
    assert ft.top_k(doc_index, "spark AND qqqzz*", k=10).count() == 0
