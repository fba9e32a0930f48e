"""Norwegian Snowball stemmer — the fourth stemming analyzer dialect.

Reference parity: TermAnalyzers wires Lucene's ``NorwegianAnalyzer`` for
BOTH the ``nb`` (Bokmål) and ``nn`` (Nynorsk) locales (miru-plugin/src/
main/java/com/jivesoftware/os/miru/plugin/query/TermAnalyzers.java:
119-138); Lucene's NorwegianAnalyzer applies the Norwegian Snowball
stemmer after stopword removal. This is a faithful pure-Python
implementation of the PUBLISHED algorithm (Snowball project, "Norwegian
stemming algorithm", snowballstem.org — public knowledge), structured
exactly like ``stem_sv.py``.

Algorithm outline (the published spec, restated):

* regions: R1 = after the first non-vowel following a vowel, adjusted so
  at least 3 letters precede it. Vowels: ``a e i o u y æ å ø``.
* step 1 — suffix search limited to R1 (``setlimit tomark p1``, same
  longest-fitting-inside-R1 semantics as the Swedish dialect). Longest
  of ``a e ede ande ende ane ene hetene en heten ar er heter as es edes
  endes enes hetenes ens hetens ers ets et het ast`` — delete; ``s`` —
  delete when preceded by a valid s-ending (``b c d f g h j l m n o p r
  t v y z``, or ``k`` itself preceded by a non-vowel; the preceding
  letters may sit outside R1, and a word-initial ``k`` has no preceding
  letter so fails); ``erte ert`` — replace with ``er``.
* step 2 — if the word ends ``dt`` or ``vt`` wholly in R1, delete the
  ``t``.
* step 3 — longest of, wholly in R1: ``leg eleg ig eig lig elig els lov
  elov slov hetslov`` — delete.

No prelude/postlude (``æ å ø`` are first-class vowels and survive).
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouyæåø")
_S_ENDING = frozenset("bcdfghjlmnoprtvyz")

# length-descending so the first fitting match IS the among's longest match
_STEP1 = tuple(
    sorted(
        (
            "a", "e", "ede", "ande", "ende", "ane", "ene", "hetene", "en",
            "heten", "ar", "er", "heter", "as", "es", "edes", "endes",
            "enes", "hetenes", "ens", "hetens", "ers", "ets", "et", "het",
            "ast", "s", "erte", "ert",
        ),
        key=len,
        reverse=True,
    )
)

_STEP3 = tuple(
    sorted(
        (
            "leg", "eleg", "ig", "eig", "lig", "elig", "els", "lov",
            "elov", "slov", "hetslov",
        ),
        key=len,
        reverse=True,
    )
)


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
    """Snowball-stem one lowercase Norwegian token."""
    w = word
    r1 = _r1(w)  # marked once on the input, as the spec's mark_regions does

    # step 1 — longest suffix wholly inside R1 (setlimit semantics)
    for suf in _STEP1:
        p = len(w) - len(suf)
        if p >= r1 and w.endswith(suf):
            if suf == "s":
                prev = w[p - 1] if p > 0 else ""
                if prev in _S_ENDING or (
                    prev == "k" and p >= 2 and w[p - 2] not in _VOWELS
                ):
                    w = w[:p]
            elif suf in ("erte", "ert"):
                w = w[:p] + "er"
            else:
                w = w[:p]
            break

    # step 2 — final dt/vt wholly inside R1: delete the t
    if len(w) - 2 >= r1 and w[-2:] in ("dt", "vt"):
        w = w[:-1]

    # step 3 — other suffixes, wholly inside R1
    for suf in _STEP3:
        p = len(w) - len(suf)
        if p >= r1 and w.endswith(suf):
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


# the Snowball Norwegian stop word list (snowballstem.org, public; covers
# both Bokmål and Nynorsk function words — reconstructed offline, and a
# registry datum rather than an algorithm claim: ingest, query parse and
# the DuckDB oracle all consume this same set, so internal consistency
# holds regardless of any word-level delta from the upstream file)
NORWEGIAN_STOPWORDS = frozenset(
    """og i jeg det at en et den til er som på de med han av ikke ikkje
der så var meg seg men ett har om vi min mitt ha hadde hun nå over da ved
fra du ut sin dem oss opp man kan hans hvor eller hva skal selv sjøl her
alle vil bli ble blei blitt kunne inn når være kom noen noe ville dere
deres kun ja etter ned skulle denne for deg si sine sitt mot å meget
hvorfor dette disse uten hvordan ingen din ditt blir samme hvilken hvilke
sånn inni mellom vår hver hvem vors hvis både bare enn fordi før mange
også slik vært båe begge siden dykk dykkar dei deira deires deim di då eg
ein eit eitt elles honom hjå ho hoe henne hennar hennes hoss hossen ingi
inkje korleis korso kva kvar kvarhelst kven kvi kvifor me medan mi mine
mykje no nokon noka nokor noko nokre sia sidan so somt somme um upp vere
vore verte vort varte vart""".split()
)
