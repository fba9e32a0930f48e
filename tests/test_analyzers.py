"""Per-locale analyzer selection (TermAnalyzers.findAnalyzer parity —
miru-plugin/.../query/TermAnalyzers.java:119-138) and the contract that a
selected spec drops straight into build_index / parse_query kwargs."""

import inspect


from miru_spark.analyzers import (
    AnalyzerSpec,
    find_analyzer,
    register_analyzer,
)
from miru_spark.stem import get_stemmer
from miru_spark.tokenize import ENGLISH_STOPWORDS, tokenize_py


def test_english_locale_selects_stop_and_stem():
    spec = find_analyzer("en", use_stop_words=True)
    assert spec.stopwords is ENGLISH_STOPWORDS
    assert spec.stemmer == "porter"


def test_non_stopword_variant_still_stems():
    # the reference's nonStopwordAnalyzers are the SAME analyzers with an
    # empty stop set — stemming stays on (EnglishAnalyzer(EMPTY_SET))
    spec = find_analyzer("en", use_stop_words=False)
    assert spec.stopwords is None
    assert spec.stemmer == "porter"


def test_locale_tail_falls_back_to_first_segment():
    assert find_analyzer("en_US") == find_analyzer("en")
    # truncation is at the FIRST '_' (Java indexOf/substring): a registered
    # "xx_yy" is reachable only by exact match, never via "xx_yy_zz"
    register_analyzer(
        "xx_yy",
        AnalyzerSpec(stopwords=frozenset({"the"}), stemmer=None),
        AnalyzerSpec(),
    )
    try:
        assert find_analyzer("xx_yy").stopwords == frozenset({"the"})
        assert find_analyzer("xx_yy_zz") == find_analyzer(None)  # -> "xx": miss
    finally:
        from miru_spark import analyzers as A

        A._REGISTRY.pop("xx_yy", None)


def test_unknown_and_empty_locales_use_standard():
    # StandardAnalyzer fallback: English stops iff use_stop_words, never stems
    for loc in (None, "", "zz", "zz_ZZ"):
        with_stop = find_analyzer(loc, use_stop_words=True)
        without = find_analyzer(loc, use_stop_words=False)
        assert with_stop.stopwords is ENGLISH_STOPWORDS and with_stop.stemmer is None
        assert without.stopwords is None and without.stemmer is None


def test_lookup_is_case_insensitive():
    assert find_analyzer("EN_us") == find_analyzer("en")


def test_build_kwargs_match_build_index_signature():
    # the spec must drop into build_index(**spec.build_kwargs()) unchanged
    from miru_spark.operators.build import build_index

    params = inspect.signature(build_index).parameters
    for k in find_analyzer("en").build_kwargs():
        assert k in params, f"build_index lost analyzer kwarg {k}"


def test_spec_applies_like_the_dialects_it_names():
    # applying the en spec by hand = stopword filter + porter stem, the same
    # pipeline the Arrow kernels run (threading of each dialect through
    # build/query/fingerprint is covered by test_stopwords / test_stemming)
    spec = find_analyzer("en", use_stop_words=True)
    toks = tokenize_py("The runners are running THE race", stopwords=spec.stopwords)
    assert "the" not in toks and "are" not in toks
    stemmed = [get_stemmer(spec.stemmer)(t) for t in toks]
    assert stemmed == ["runner", "run", "race"]


def test_registered_locale_wins_over_fallback():
    register_analyzer(
        "pt_br",
        AnalyzerSpec(stopwords=frozenset({"de"}), stemmer=None),
        AnalyzerSpec(),
    )
    try:
        assert find_analyzer("pt_br").stopwords == frozenset({"de"})
        # sibling locale without a registration: straight to standard
        assert find_analyzer("pt") == find_analyzer(None)
    finally:
        from miru_spark import analyzers as A

        A._REGISTRY.pop("pt_br", None)


def test_cli_locale_flag_wires_find_analyzer(monkeypatch):
    # main.py build --locale must resolve through find_analyzer and hand the
    # spec's dialects to build_persistent (the CLI is the user surface the
    # reference exposes via its query/ingest endpoints)
    import types

    import main

    captured = {}

    def fake_build_persistent(src, index_dir, **kw):
        captured.update(kw)
        return types.SimpleNamespace()

    monkeypatch.setattr("miru_spark.index_store.build_persistent", fake_build_persistent)
    monkeypatch.setattr("miru_spark.sources.read_source", lambda spark, i, f: None)
    monkeypatch.setattr(main, "_spark", lambda app: None)

    args = main.build_parser().parse_args(
        ["build", "--input", "x", "--index", "y", "--locale", "en_US"]
    )
    args.fn(args)
    assert captured["stopwords"] is ENGLISH_STOPWORDS
    assert captured["stemmer"] == "porter"

    captured.clear()
    args = main.build_parser().parse_args(
        ["build", "--input", "x", "--index", "y", "--locale", "en", "--no-stop-words"]
    )
    args.fn(args)
    assert captured["stopwords"] is None and captured["stemmer"] == "porter"

    captured.clear()
    args = main.build_parser().parse_args(
        ["build", "--input", "x", "--index", "y", "--locale", "zz"]
    )
    args.fn(args)
    assert captured["stopwords"] is ENGLISH_STOPWORDS and captured["stemmer"] is None

    import pytest as _pytest

    args = main.build_parser().parse_args(
        ["build", "--input", "x", "--index", "y", "--locale", "en",
         "--stopwords", "english"]
    )
    with _pytest.raises(SystemExit):
        args.fn(args)
