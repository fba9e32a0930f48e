"""Filter algebra + Lucene-lite query parser (SURVEY.md §2.2).

The reference's only IR is the recursive ``MiruFilter(operation,
fieldFilters, subFilters)`` with ops {and, or, pButNotQ}
(miru-api/.../query/filter/MiruFilter.java:9-33), produced from a Lucene
query string by LuceneBackedQueryParser:48-144 with wrap rules
MUST+MUST_NOT → pButNotQ and default operator AND.

v1 grammar (flat boolean, no parens): whitespace-separated clauses,
``AND`` / ``OR`` keywords, ``NOT term`` or ``-term`` negation, trailing
``*`` prefix wildcard. Default operator AND. While parsing we collect the
per-term query frequency qtf (+1 per positive occurrence), mirroring
MiruAggregateUtil.collectTerm (miru-plugin/.../solution/
MiruAggregateUtil.java:876-892).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from miru_spark.tokenize import tokenize_py


@dataclass(frozen=True)
class Clause:
    term: str
    prefix: bool = False  # trailing-* wildcard → dictionary range expansion
    qtf: int = 1


@dataclass
class QuerySpec:
    positive: list[Clause] = field(default_factory=list)
    negative: list[Clause] = field(default_factory=list)
    op: str = "and"  # 'and' | 'or' across positive clauses
    k: int = 100
    scorer: str = "bm25"  # 'bm25' | 'miru_tfidf' | 'time'
    max_expansion: int = 100  # maxWildcardExpansion (FullTextQuery.java:13-52)


def parse_query(query: str, k: int = 100, scorer: str = "bm25") -> QuerySpec:
    raw = query.split()
    op = "and"
    if any(w == "OR" for w in raw):
        op = "or"
    pos: dict[tuple[str, bool], int] = {}
    neg: list[Clause] = []
    negate_next = False
    for w in raw:
        if w in ("AND", "OR"):
            continue
        if w == "NOT":
            negate_next = True
            continue
        is_neg = negate_next or w.startswith("-")
        negate_next = False
        w = w.lstrip("-")
        prefix = w.endswith("*")
        w = w.rstrip("*")
        toks = tokenize_py(w)  # query and ingest share one analyzer
        if not toks:
            continue
        t = toks[0]
        if is_neg:
            neg.append(Clause(t, prefix))
        else:
            key = (t, prefix)
            pos[key] = pos.get(key, 0) + 1
    spec = QuerySpec(
        positive=[Clause(t, p, q) for (t, p), q in pos.items()],
        negative=neg,
        op=op,
        k=k,
        scorer=scorer,
    )
    return spec
