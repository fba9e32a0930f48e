"""Per-locale analyzer selection — Miru's TermAnalyzers.findAnalyzer
restated over this engine's analyzer dialects.

Reference behavior (miru-plugin/src/main/java/com/jivesoftware/os/miru/
plugin/query/TermAnalyzers.java:119-138): exact locale lookup in a
stopword or non-stopword analyzer map, then repeatedly strip trailing
``_``-segments ("en_US" -> "en"), then fall back to a StandardAnalyzer
(with Lucene's English stop set iff useStopWords). The analyzer picked at
ingest is the analyzer used at query parse — one deterministic spec.

Here an analyzer IS its spec: the (stopwords, stemmer) pair threaded
through both Arrow tokenize kernels, the Catalyst tokenizer, the DuckDB
oracle dialect, the query parser and the persistent-index fingerprint
(tokenize.py / stem.py / operators/build.py). The registry ships the
locales this engine can honor faithfully with public material:

* ``en`` (and ``en_*`` via the fallback walk) — English stop set +
  Porter stemmer, the EnglishAnalyzer chain.
* ``de`` (and ``de_*``) — German Snowball stemmer + the published German
  stop set, the GermanAnalyzer chain (round 6; ``stem_de.py``).
* ``sv`` — Swedish Snowball stemmer + stop set, the SwedishAnalyzer
  chain (round 6; ``stem_sv.py``).
* ``nb`` / ``nn`` — Norwegian Snowball stemmer + stop set, one shared
  NorwegianAnalyzer chain exactly as the reference's builder map wires
  both locales (round 6; ``stem_no.py``).
* ``da`` — Danish Snowball stemmer + stop set, the DanishAnalyzer chain
  (round 6; ``stem_da.py``).
* ``nl`` — Dutch Snowball stemmer + stop set, the DutchAnalyzer chain
  (round 6; ``stem_nl.py``).
* everything else — the standard spec (LogMill code-regex tokenizer, no
  stemming; English stop set iff use_stop_words, mirroring the
  reference's STOPWORD_STANDARD_ANALYZER).

Language-specific analyzers for the remaining ~23 locales the reference
wires (Snowball stemmer family + per-language stop sets) are a DOCUMENTED
DELTA: re-implementing thirty stemmers adds no new engine machinery — the
``de``/``sv``/``nb``/``da``/``nl`` entries are the existence proof that
``register_analyzer``'s shape covers them: a registered spec flows
through build/query/fingerprint with zero further wiring (asserted
end-to-end in tests/test_analyzers.py).
"""

from __future__ import annotations

from dataclasses import dataclass

from miru_spark.tokenize import ENGLISH_STOPWORDS


@dataclass(frozen=True)
class AnalyzerSpec:
    """What build_index / parse_query consume: keyword-ready dialects."""

    stopwords: frozenset[str] | None = None
    stemmer: str | None = None

    def build_kwargs(self) -> dict:
        return {"stopwords": self.stopwords, "stemmer": self.stemmer}


# locale -> (with-stopwords spec, without-stopwords spec); the second still
# stems — the reference's nonStopwordAnalyzers are the same analyzers with
# an EMPTY stop set, not StandardAnalyzer.
def _german_registry_entry() -> tuple[AnalyzerSpec, AnalyzerSpec]:
    from miru_spark.stem_de import GERMAN_STOPWORDS

    return (
        AnalyzerSpec(stopwords=GERMAN_STOPWORDS, stemmer="german"),
        AnalyzerSpec(stopwords=None, stemmer="german"),
    )


def _swedish_registry_entry() -> tuple[AnalyzerSpec, AnalyzerSpec]:
    from miru_spark.stem_sv import SWEDISH_STOPWORDS

    return (
        AnalyzerSpec(stopwords=SWEDISH_STOPWORDS, stemmer="swedish"),
        AnalyzerSpec(stopwords=None, stemmer="swedish"),
    )


def _norwegian_registry_entry() -> tuple[AnalyzerSpec, AnalyzerSpec]:
    from miru_spark.stem_no import NORWEGIAN_STOPWORDS

    return (
        AnalyzerSpec(stopwords=NORWEGIAN_STOPWORDS, stemmer="norwegian"),
        AnalyzerSpec(stopwords=None, stemmer="norwegian"),
    )


def _danish_registry_entry() -> tuple[AnalyzerSpec, AnalyzerSpec]:
    from miru_spark.stem_da import DANISH_STOPWORDS

    return (
        AnalyzerSpec(stopwords=DANISH_STOPWORDS, stemmer="danish"),
        AnalyzerSpec(stopwords=None, stemmer="danish"),
    )


def _dutch_registry_entry() -> tuple[AnalyzerSpec, AnalyzerSpec]:
    from miru_spark.stem_nl import DUTCH_STOPWORDS

    return (
        AnalyzerSpec(stopwords=DUTCH_STOPWORDS, stemmer="dutch"),
        AnalyzerSpec(stopwords=None, stemmer="dutch"),
    )


_NORWEGIAN_PAIR = _norwegian_registry_entry()

_REGISTRY: dict[str, tuple[AnalyzerSpec, AnalyzerSpec]] = {
    "en": (
        AnalyzerSpec(stopwords=ENGLISH_STOPWORDS, stemmer="porter"),
        AnalyzerSpec(stopwords=None, stemmer="porter"),
    ),
    # round 6: the GermanAnalyzer chain (Snowball German stemmer + the
    # published German stop set) — proves register_analyzer's shape holds
    # beyond English with zero extra wiring
    "de": _german_registry_entry(),
    # round 6, second batch: the SwedishAnalyzer chain, and the
    # NorwegianAnalyzer chain wired for BOTH nb and nn exactly as the
    # reference's builder map does (TermAnalyzers.java:119-138)
    "sv": _swedish_registry_entry(),
    "nb": _NORWEGIAN_PAIR,
    "nn": _NORWEGIAN_PAIR,
    "da": _danish_registry_entry(),
    "nl": _dutch_registry_entry(),
}

_STANDARD_STOP = AnalyzerSpec(stopwords=ENGLISH_STOPWORDS, stemmer=None)
_STANDARD = AnalyzerSpec(stopwords=None, stemmer=None)


def register_analyzer(
    locale: str, with_stopwords: AnalyzerSpec, without_stopwords: AnalyzerSpec
) -> None:
    """Extension point for additional locales (the reference's builder map)."""
    _REGISTRY[locale.lower()] = (with_stopwords, without_stopwords)


def find_analyzer(locale: str | None, use_stop_words: bool = True) -> AnalyzerSpec:
    """TermAnalyzers.findAnalyzer: exact match, then strip ``_`` tails,
    then the standard analyzer (English stops iff use_stop_words)."""
    spec_pair = None
    if locale:
        code = locale.lower()
        spec_pair = _REGISTRY.get(code)
        # the reference truncates at the FIRST '_' (indexOf/substring), so
        # "pt_br_xx" falls back to "pt", never probing "pt_br" — keep that
        # exact walk, including the (at most one) re-probe
        while spec_pair is None:
            ix = code.find("_")
            if ix == -1:
                break
            code = code[:ix]
            spec_pair = _REGISTRY.get(code)
    if spec_pair is None:
        return _STANDARD_STOP if use_stop_words else _STANDARD
    return spec_pair[0] if use_stop_words else spec_pair[1]
