"""DuckDB oracle SQL generators.

Each generator emits ANSI SQL that DuckDB runs directly on the raw parquet
views (no index) and that reproduces the engine's results op-for-op:
identical tokenizer (tokenize.duckdb_tokens_sql), identical BM25/TF-IDF
expressions, identical ascending-term-order float summation
(list_aggregate(list(c ORDER BY term), 'sum') ↔ Spark's
aggregate(array_sort(...))), identical round(score, 6) sort key and
(score desc, doc_id desc) tie-break.

These are the correctness gate for the driver (oracle_sql()) and the test
oracles (tests/). The oracle is deliberately brute-force — it defines the
semantics; the engine must match it from the index.
"""

from __future__ import annotations

from miru_spark.filters import QuerySpec
from miru_spark.tokenize import duckdb_tokens_sql

K1 = 1.2
B = 0.75


def _q_cte(spec: QuerySpec, max_expansion: int) -> str:
    """Query-term table (term, qtf, clause), expanding prefix clauses from
    the term dictionary exactly like the engine does."""
    parts = []
    for cid, cl in enumerate(spec.positive):
        if cl.prefix:
            parts.append(
                f"SELECT term, {cl.qtf} AS qtf, {cid} AS clause FROM "
                f"(SELECT term FROM stats WHERE term LIKE '{cl.term}%' "
                f"ORDER BY term LIMIT {max_expansion})"
            )
        else:
            parts.append(f"SELECT '{cl.term}' AS term, {cl.qtf} AS qtf, {cid} AS clause")
    return " UNION ALL ".join(parts)


def _neg_pred(spec: QuerySpec) -> str:
    if not spec.negative:
        return ""
    conds = []
    for cl in spec.negative:
        if cl.prefix:
            conds.append(f"term LIKE '{cl.term}%'")
        else:
            conds.append(f"term = '{cl.term}'")
    return (
        "AND doc_id NOT IN (SELECT doc_id FROM tf WHERE " + " OR ".join(conds) + ")"
    )


def fulltext_topk_sql(
    spec: QuerySpec,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    tok = duckdb_tokens_sql(text_col)
    if spec.scorer == "bm25":
        contrib = (
            f"q.qtf * ln(1 + (corpus.n_docs - stats.df + 0.5) / (stats.df + 0.5)) "
            f"* tf.tf * ({K1} + 1) "
            f"/ (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / corpus.avgdl))"
        )
    elif spec.scorer == "miru_tfidf":
        contrib = "(q.qtf * tf.tf) / stats.cum_tf"
    else:
        raise ValueError(spec.scorer)
    matched_pred = (
        f"matched = {len(spec.positive)}" if spec.op == "and" else "matched >= 1"
    )
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id, unnest({tok}) AS term FROM {table}
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
corpus AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
stats AS (SELECT term, count(*) AS df, sum(tf) AS cum_tf FROM tf GROUP BY term),
q AS ({_q_cte(spec, spec.max_expansion)}),
contrib AS (
  SELECT tf.doc_id, tf.term, q.clause,
         CAST({contrib} AS DOUBLE) AS c
  FROM tf
  JOIN q ON q.term = tf.term
  JOIN stats ON stats.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN corpus
),
scored AS (
  SELECT doc_id,
         CAST(list_aggregate(list(c ORDER BY term), 'sum') AS DOUBLE) AS score,
         count(DISTINCT clause) AS matched
  FROM contrib GROUP BY doc_id
)
SELECT doc_id AS doc, round(score, 6) AS score
FROM scored
WHERE {matched_pred} {_neg_pred(spec)}
ORDER BY score DESC, doc DESC LIMIT {spec.k}
"""


def term_stats_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    limit: int = 100,
) -> str:
    """Term dictionary top terms by (df, term) — validates the index's global
    df/Σtf aggregates (the docId=-1 cell analog)."""
    tok = duckdb_tokens_sql(text_col)
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id, unnest({tok}) AS term FROM {table}
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term)
SELECT term, count(*) AS df, sum(tf) AS cum_tf
FROM tf GROUP BY term
ORDER BY df DESC, term LIMIT {limit}
"""


def doc_stats_sql(table: str = "documents", id_col: str = "doc_id", text_col: str = "text") -> str:
    """Corpus stats: N docs, total tokens, avg doc length (rounded)."""
    tok = duckdb_tokens_sql(text_col)
    return f"""
WITH dl AS (
  SELECT {id_col} AS doc_id, len({tok}) AS dl FROM {table}
)
SELECT count(*) AS n_docs, sum(dl) AS total_tokens, round(avg(dl), 6) AS avgdl
FROM dl
"""
