"""Text analysis operators for training-data pipelines: quality scoring,
token counting, document fingerprinting, heuristic language id. All pure
Catalyst expressions (whole-stage codegen), each with a 1:1 DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from miru_spark.tokenize import tokens_col

STOPWORDS = ["the", "a", "of", "to", "in", "and", "is", "for"]


def quality(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc quality signals: token count, char count, mean token length,
    stopword ratio, alphabetic-char ratio."""
    t = tokens_col(text_col)
    n_tok = F.size(t)
    tok_chars = F.aggregate(
        F.transform(t, lambda x: F.length(x)), F.lit(0), lambda acc, v: acc + v
    )
    n_stop = F.size(F.filter(t, lambda x: x.isin(STOPWORDS)))
    n_alpha = F.length(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z]", ""))
    return df.select(
        F.col(id_col).alias("doc"),
        n_tok.alias("n_tokens"),
        F.length(F.col(text_col)).alias("n_chars"),
        F.round(tok_chars / n_tok, 6).alias("avg_token_len"),
        F.round(n_stop / n_tok, 6).alias("stopword_ratio"),
        F.round(n_alpha / F.length(F.col(text_col)), 6).alias("alpha_ratio"),
    )


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace tokens + BPE-ish run counts (alpha runs / digit runs)."""
    lower = F.lower(F.col(text_col))
    return df.select(
        F.col(id_col).alias("doc"),
        F.size(tokens_col(text_col)).alias("n_tokens"),
        F.size(F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")).alias("n_ws_tokens"),
        F.regexp_count(lower, F.lit("[a-z]+")).alias("n_alpha_runs"),
        F.regexp_count(lower, F.lit("[0-9]+")).alias("n_digit_runs"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str, shingle_n: int = 3) -> DataFrame:
    """Content fingerprints: full-token digest + min-shingle digest (a
    1-permutation MinHash — the rolling-hash document sketch)."""
    t = tokens_col(text_col)
    sh = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(t) - shingle_n, F.lit(0))),
        lambda i: F.md5(F.array_join(F.slice(t, i + 1, shingle_n), " ")),
    )
    return df.select(
        F.col(id_col).alias("doc"),
        F.md5(F.array_join(t, " ")).alias("token_md5"),
        F.array_min(sh).alias("min_shingle_md5"),
    )


# Tiny per-language marker sets — a real pipeline would ship trained n-gram
# tables; the operator shape (score-per-language argmax) is the same.
LANG_MARKERS = {
    "en": ["the", "and", "of", "is"],
    "code": ["def", "return", "import", "const", "func", "public"],
}


def langid_lite(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic language id: marker-token hit ratio per language, argmax
    with 'unk' fallback below min_ratio."""
    t = tokens_col(text_col)
    n = F.size(t)
    scores = {
        lang: F.round(F.size(F.filter(t, lambda x: x.isin(m))) / n, 6)
        for lang, m in LANG_MARKERS.items()
    }
    pred = (
        F.when(
            (scores["code"] >= scores["en"]) & (scores["code"] > 0.01), F.lit("code")
        )
        .when(scores["en"] > 0.01, F.lit("en"))
        .otherwise(F.lit("unk"))
    )
    return df.select(
        F.col(id_col).alias("doc"),
        scores["en"].alias("en_ratio"),
        scores["code"].alias("code_ratio"),
        pred.alias("lang_pred"),
    )
