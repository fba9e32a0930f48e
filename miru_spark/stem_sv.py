"""Swedish Snowball stemmer — the third stemming analyzer dialect.

Reference parity: TermAnalyzers wires Lucene's ``SwedishAnalyzer`` for the
``sv`` locale (miru-plugin/src/main/java/com/jivesoftware/os/miru/plugin/
query/TermAnalyzers.java:119-138); Lucene's SwedishAnalyzer applies the
Swedish Snowball stemmer after stopword removal. This is a faithful
pure-Python implementation of the PUBLISHED algorithm (M. F. Porter's
Snowball project, "Swedish stemming algorithm", snowballstem.org — public
knowledge), structured exactly like ``stem.py``/``stem_de.py``: one
deterministic per-token function behind the ``STEMMERS`` registry.

Algorithm outline (the published spec, restated):

* regions: R1 = after the first non-vowel following a vowel, adjusted so
  at least 3 letters precede it. Vowels: ``a e i o u y ä å ö``.
* step 1 — the suffix SEARCH IS LIMITED TO R1 (the spec's ``setlimit
  tomark p1``): the longest list suffix lying wholly inside R1 wins, so a
  longer suffix straddling the R1 boundary never blocks a shorter one
  (contrast the German dialect, whose steps match first and test R1
  after). Longest of ``a arna erna heterna orna ad e ade ande arne are
  aste en anden aren heten ern ar er heter or as arnas ernas ornas es
  ades andes ens arens hetens erns at andet het ast`` — delete; or ``s``
  — delete when preceded by a valid s-ending (``b c d f g h j k l m n o
  p r t v y``; the preceding letter itself may sit outside R1).
* step 2 — if the word ends ``dd gd nn dt gt kt tt`` wholly in R1,
  delete the last letter.
* step 3 — longest of, wholly in R1: ``lig ig els`` → delete;
  ``löst`` → ``lös``; ``fullt`` → ``full``.

No prelude/postlude (Swedish marks no consonantal u/y and folds no
umlauts — ``ä å ö`` are first-class vowels and survive stemming).
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouyäåö")
_S_ENDING = frozenset("bcdfghjklmnoprtvy")

# length-descending so the first fitting match IS the among's longest match
_STEP1 = tuple(
    sorted(
        (
            "a", "arna", "erna", "heterna", "orna", "ad", "e", "ade",
            "ande", "arne", "are", "aste", "en", "anden", "aren", "heten",
            "ern", "ar", "er", "heter", "or", "as", "arnas", "ernas",
            "ornas", "es", "ades", "andes", "ens", "arens", "hetens",
            "erns", "at", "andet", "het", "ast", "s",
        ),
        key=len,
        reverse=True,
    )
)

_PAIRS = frozenset(("dd", "gd", "nn", "dt", "gt", "kt", "tt"))


def _r1(w: str) -> int:
    """After the first non-vowel following a vowel; at least 3 in."""
    n = len(w)
    i = 0
    while i < n and w[i] not in _VOWELS:
        i += 1
    while i < n and w[i] in _VOWELS:
        i += 1
    return max(i + 1 if i < n else n, 3)


def stem(word: str) -> str:
    """Snowball-stem one lowercase Swedish token."""
    w = word
    r1 = _r1(w)  # marked once on the input, as the spec's mark_regions does

    # step 1 — longest suffix wholly inside R1 (setlimit semantics)
    for suf in _STEP1:
        p = len(w) - len(suf)
        if p >= r1 and w.endswith(suf):
            if suf == "s":
                if p > 0 and w[p - 1] in _S_ENDING:
                    w = w[:p]
            else:
                w = w[:p]
            break

    # step 2 — undouble a consonant pair wholly inside R1
    if len(w) - 2 >= r1 and w[-2:] in _PAIRS:
        w = w[:-1]

    # step 3 — other suffixes, wholly inside R1
    for suf in ("fullt", "löst", "lig", "els", "ig"):
        p = len(w) - len(suf)
        if p >= r1 and w.endswith(suf):
            if suf == "fullt" or suf == "löst":
                w = w[:-1]  # fullt→full, löst→lös: drop the t
            else:
                w = w[:p]
            break

    return w


_CACHE: dict[str, str] = {}


def stem_cached(word: str) -> str:
    s = _CACHE.get(word)
    if s is None:
        if len(_CACHE) > 1_000_000:  # bound executor-resident memo
            _CACHE.clear()
        s = _CACHE[word] = stem(word)
    return s


# the published Snowball Swedish stop word list (snowballstem.org, public)
SWEDISH_STOPWORDS = frozenset(
    """och det att i en jag hon som han på den med var sig för så till är
men ett om hade de av icke mig du henne då sin nu har inte hans honom
skulle hennes där min man ej vid kunde något från ut när efter upp vi dem
vara vad över än dig kan sina här ha mot alla under någon eller allt
mycket sedan ju denna själv detta åt utan varit hur ingen mitt ni bli
blev oss din dessa några deras blir mina samma vilken er sådan vår blivit
dess inom mellan sådant varför varje vilka ditt vem vilket sitta sådana
vart dina vars vårt våra ert era vilkas""".split()
)
