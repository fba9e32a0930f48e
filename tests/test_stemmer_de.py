"""German Snowball analyzer dialect (SURVEY §2.1 query-time analyzer row —
TermAnalyzers wires Lucene's GermanAnalyzer for ``de``,
m-plugin/query/TermAnalyzers.java:119-138). Proves register_analyzer's
shape beyond English: the ``de`` registry entry flows through
build/query/fingerprint with zero wiring beyond the stemmer function.

Golden vectors are hand-derived step-by-step from the PUBLISHED Snowball
German algorithm (snowballstem.org): prelude (ß→ss, u/y-between-vowels
marking), R1/R2 with the ≥3 adjustment, the three suffix steps with
longest-match-then-condition semantics, postlude umlaut folding. Each
vector's derivation is reproducible from the spec alone."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from miru_spark.analyzers import find_analyzer
from miru_spark.stem import get_stemmer
from miru_spark.stem_de import GERMAN_STOPWORDS, stem

GOLDEN = {
    # step 1 class (b): e/en/es in R1
    "katzen": "katz", "katze": "katz", "laufen": "lauf", "bilden": "bild",
    "arbeiten": "arbeit", "abendessen": "abendess", "kategorie": "kategori",
    "quelle": "quell", "schönes": "schon", "busse": "buss", "buße": "buss",
    # ...with the trailing-niss s-drop
    "ereignisse": "ereignis", "verständnisse": "verstandnis",
    # step 1 class (a): em/ern/er
    "bildern": "bild", "bücher": "buch", "häuser": "haus",
    "dichter": "dicht", "arbeiter": "arbeit", "aufeinander": "aufeinand",
    # step 1 class (c): s after a valid s-ending ('i' is not one)
    "verständnis": "verstandnis",
    # step 2: st after a valid st-ending itself preceded by ≥3 letters
    "dienst": "dien", "kunst": "kunst", "singt": "singt",
    # step 3 d-suffixes gated on R2 (+ the chained try-deletes)
    "aufregend": "aufreg", "bedeutung": "bedeut", "verwendung": "verwend",
    "verdopplung": "verdoppl", "zeitung": "zeitung", "wendung": "wendung",
    "natürlich": "natur", "unglaublich": "unglaub", "heimlich": "heimlich",
    "freundlich": "freundlich", "freundlichkeit": "freundlich",
    "verträglichkeit": "vertrag", "gelegenheit": "geleg",
    "dankbarkeit": "dankbar", "schönheit": "schonheit",
    "technologisch": "technolog", "elektrisch": "elektr",
    "gläubig": "glaubig", "königin": "konigin",
    # prelude marking: u between vowels is a consonant for the region scan
    "bauen": "bau", "treue": "treu", "trauung": "trauung",
    # prelude ß→ss
    "gewissermaßen": "gewissermass",
    # multi-step composition
    "arbeiterinnen": "arbeiterinn",
}


def test_golden_vectors():
    bad = {w: (stem(w), e) for w, e in GOLDEN.items() if stem(w) != e}
    assert not bad, bad


def test_registry_wires_german_chain():
    spec = find_analyzer("de", use_stop_words=True)
    assert spec.stopwords is GERMAN_STOPWORDS and spec.stemmer == "german"
    # fallback walk + the non-stopword variant still stems (GermanAnalyzer
    # with an empty stop set, like the reference's nonStopwordAnalyzers)
    assert find_analyzer("de_AT") == find_analyzer("de")
    no_stop = find_analyzer("de", use_stop_words=False)
    assert no_stop.stopwords is None and no_stop.stemmer == "german"
    # the stemmer resolves through the same registry the kernels use
    assert get_stemmer("german")("katzen") == "katz"


@pytest.fixture(scope="module")
def german_index(spark):
    from miru_spark.operators.build import build_index

    docs = spark.createDataFrame(
        [
            (0, "die arbeiter laufen schnell nach hause"),
            (1, "der dichter kennt keine katzen"),
            (2, "ein system ohne verwendung und ohne bedeutung"),
        ],
        "doc_id long, text string",
    )
    spec = find_analyzer("de", use_stop_words=True)
    return build_index(
        docs, text_col="text", dense_id_col="doc_id", capacity=8,
        **spec.build_kwargs(),
    )


def test_german_ingest_query_symmetry(german_index):
    """Morphological variants in the QUERY hit documents containing other
    variants — both sides run the identical German chain."""
    from miru_spark.operators import fulltext

    # 'arbeiten' stems to 'arbeit', matching doc 0's 'arbeiter'
    hits = {r["doc"] for r in fulltext.top_k(german_index, "arbeiten", k=10).collect()}
    assert len(hits) == 1
    # 'katze' → 'katz' matches doc 1's 'katzen'
    assert fulltext.top_k(german_index, "katze", k=10).count() == 1
    # 'verwendungen' → step1 'en' then step3 'ung' → 'verwend' matches doc 2
    assert fulltext.top_k(german_index, "verwendungen", k=10).count() == 1


def test_german_stopwords_dropped_at_ingest(german_index):
    terms = {r["term"] for r in german_index.stats.select("term").collect()}
    assert "arbeit" in terms and "katz" in terms
    for stop in ("die", "der", "keine", "ohne", "und", "nach"):
        assert stem(stop) not in terms and stop not in terms


def test_german_spec_reaches_persistent_fingerprint(tmp_path, spark):
    """The de spec lands in the persisted manifest fingerprint: a stale
    index can never serve the wrong analyzer's postings (a restart with a
    different analyzer wipes and rebuilds)."""
    import json

    from miru_spark.index_store import build_persistent

    docs = spark.createDataFrame(
        [(0, "die arbeiter laufen"), (1, "katzen laufen")],
        "doc_id long, text string",
    )
    spec = find_analyzer("de")
    d = str(tmp_path / "idx_de")
    build_persistent(
        docs, d, text_col="text", dense_id_col="doc_id", capacity=8,
        wave_size=4, **spec.build_kwargs(),
    )
    with open(f"{d}/manifest.json") as f:
        fp = json.load(f)["fingerprint"]
    assert fp["stemmer"] == "german"
    assert "aber" in fp["stopwords"].split(",")  # the German stop set, sorted
