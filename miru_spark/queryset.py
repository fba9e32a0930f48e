"""Deterministic reference query-set generator (FIXTURES.md §2).

Generates the 50-query mix the fixtures spec describes — 20 single-term
(10 common / 10 rare), 15 AND conjunctions of 2-4 terms (the shape of
``MiruFullTextNGTest.queryAnd``, miru-stream-plugins-test/.../fulltext/
MiruFullTextNGTest.java:215-224), 5 OR disjunctions, 5 ``a AND NOT b``
(the pButNotQ wrap, LuceneBackedQueryParser.java:111-144), 5 prefix
queries (wildcard expansion, MiruAggregateUtil.java:826-839) — as a pure
function of (seed, the corpus term statistics). Rank-identity over this
set against the brute-force oracle is the north rule's "reference query
set" check (tests/test_queryset.py).
"""

from __future__ import annotations

import numpy as np


def generate_queries(
    term_df: list[tuple[str, int]], seed: int = 42, k: int = 100
) -> list[dict]:
    """``term_df`` = [(term, df)] for the corpus (any order). Returns 50
    records {qid, query, k, scorer} — bit-stable for a given (term_df set,
    seed)."""
    terms = sorted(term_df, key=lambda t: (-t[1], t[0]))  # df desc, term asc
    terms = [t for t in terms if len(t[0]) >= 3]
    if len(terms) < 20:
        raise ValueError(f"need ≥20 usable terms, got {len(terms)}")
    n_common = min(40, max(10, len(terms) // 2))
    common = [t for t, _ in terms[:n_common]]
    # rare = df ≥ 2 from the tail (df=1 terms make degenerate one-doc tests)
    tail = [t for t, d in terms if 2 <= d]
    rare = tail[-min(40, max(10, len(tail) // 2)) :]
    rng = np.random.Generator(np.random.PCG64(seed))

    def pick(pool: list[str], n: int) -> list[str]:
        idx = rng.choice(len(pool), size=n, replace=False)
        return [pool[int(i)] for i in idx]

    out: list[dict] = []

    def add(query: str, scorer: str) -> None:
        out.append({"qid": f"q{len(out):02d}", "query": query, "k": k, "scorer": scorer})

    for i, t in enumerate(pick(common, 10)):
        add(t, "miru_tfidf" if i % 5 == 4 else "bm25")
    for t in pick(rare, 10):
        add(t, "bm25")
    for i in range(15):
        n = int(rng.integers(2, 5))
        add(" AND ".join(pick(common, n)), "miru_tfidf" if i % 7 == 6 else "bm25")
    for _ in range(5):
        add(" OR ".join(pick(common, int(rng.integers(2, 4)))), "bm25")
    for _ in range(5):
        a, b = pick(common, 2)
        add(f"{a} AND NOT {b}", "bm25")
    for _ in range(5):
        t = pick(common, 1)[0]
        cut = int(rng.integers(2, min(4, len(t))))
        add(t[:cut] + "*", "bm25")
    assert len(out) == 50
    return out
