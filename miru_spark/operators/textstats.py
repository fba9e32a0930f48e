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
    with 'unk' fallback below min_ratio.

    Counting runs in ONE Arrow kernel (pyarrow.compute RE2 split + hashed
    ``is_in`` membership — guide §4.2's vectorized-native shape): the
    previous pure-Catalyst form evaluated the interpreted higher-order
    ``filter(x.isin(...))`` lambda per token per expression, and the token
    array itself (split+filter) once per referencing expression — ~6
    re-tokenizations per row. Ratios, rounding and the argmax stay
    JVM-side Catalyst over the integer counts, so every float op (the
    long/long divide, F.round, the rounded-score comparisons) is the exact
    op sequence of the r6 operator — DuckDB-oracle parity unchanged.
    Null/empty text: the kernel's fill_null('') yields 0 tokens → 0/0
    division → null ratios → 'unk', matching the null-propagating Catalyst
    form output-for-output."""
    from typing import Iterator

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from miru_spark.tokenize import TOKEN_SPLIT_RE

    marker_sets = {lang: pa.array(m, pa.string()) for lang, m in LANG_MARKERS.items()}

    def counts(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            if batch.num_rows == 0:
                continue
            ids = batch.column(0)
            toks = pc.split_pattern_regex(
                pc.utf8_lower(pc.fill_null(batch.column(1), "")), TOKEN_SPLIT_RE
            )
            offsets = toks.offsets.to_numpy().astype(np.int64)
            offsets = offsets - offsets[0]
            flat = toks.flatten()
            nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)

            def per_row(mask: np.ndarray) -> np.ndarray:
                cum = np.concatenate(([0], np.cumsum(mask, dtype=np.int64)))
                return cum[offsets[1:]] - cum[offsets[:-1]]

            hit_cols = [
                per_row(
                    pc.and_(
                        pc.is_in(flat, value_set=marker_sets[lang]),
                        pc.not_equal(flat, ""),
                    ).to_numpy(zero_copy_only=False)
                )
                for lang in ("en", "code")
            ]
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(per_row(nonempty)), pa.array(hit_cols[0]), pa.array(hit_cols[1])],
                names=["doc", "n_tok", "en_hits", "code_hits"],
            )

    counted = df.select(
        F.col(id_col).cast("long").alias("doc"), F.col(text_col)
    ).mapInArrow(counts, "doc long, n_tok long, en_hits long, code_hits long")
    scores = {
        "en": F.round(F.col("en_hits") / F.col("n_tok"), 6),
        "code": F.round(F.col("code_hits") / F.col("n_tok"), 6),
    }
    pred = (
        F.when(
            (scores["code"] >= scores["en"]) & (scores["code"] > 0.01), F.lit("code")
        )
        .when(scores["en"] > 0.01, F.lit("en"))
        .otherwise(F.lit("unk"))
    )
    return counted.select(
        F.col("doc"),
        scores["en"].alias("en_ratio"),
        scores["code"].alias("code_ratio"),
        pred.alias("lang_pred"),
    )
