"""Tokenizer spec tests (FIXTURES.md §4): golden outputs, tf preservation,
and three-way parity (Spark Catalyst expr ≡ DuckDB SQL ≡ Python oracle)."""

from __future__ import annotations

import duckdb

from miru_spark.tokenize import duckdb_tokens_sql, tokenize_py, tokens_col

GOLDEN = [
    ("Hello, World!", ["hello", "world"]),
    ("com.foo.Bar.baz(Bar.java:42)", ["com", "foo", "bar", "baz", "bar", "java", "42"]),
    ("don't snake_case camelCase x9", ["don't", "snake_case", "camelcase", "x9"]),
    ("http://ex.com/a?b=1", ["http", "ex", "com", "a", "b", "1"]),
    ("the the THE", ["the", "the", "the"]),  # tf preserved, no set-dedup
    ("...", []),
    ("", []),
    ("__init__", ["__init__"]),
]


def test_golden_python():
    for raw, want in GOLDEN:
        assert tokenize_py(raw) == want, raw


def test_camel_subsplit_option():
    assert tokenize_py("getFooBar fooBar", sub_split_camel=True) == [
        "get", "foo", "bar", "foo", "bar",
    ]


def test_duckdb_parity():
    con = duckdb.connect()
    for raw, want in GOLDEN:
        got = con.execute(
            f"SELECT {duckdb_tokens_sql('?')}", [raw]
        ).fetchone()[0]
        assert got == want, raw


def test_spark_parity(spark):
    df = spark.createDataFrame([(r,) for r, _ in GOLDEN], ["text"])
    got = [r["toks"] for r in df.select(tokens_col("text").alias("toks")).collect()]
    assert got == [w for _, w in GOLDEN]
