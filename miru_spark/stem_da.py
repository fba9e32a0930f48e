"""Danish Snowball stemmer — the fifth stemming analyzer dialect.

Reference parity: TermAnalyzers wires Lucene's ``DanishAnalyzer`` for the
``da`` locale (miru-plugin/src/main/java/com/jivesoftware/os/miru/plugin/
query/TermAnalyzers.java:61); Lucene's DanishAnalyzer applies the Danish
Snowball stemmer after stopword removal. This is a faithful pure-Python
implementation of the PUBLISHED algorithm (Snowball project, "Danish
stemming algorithm", snowballstem.org — public knowledge), structured
exactly like ``stem_sv.py``/``stem_no.py``.

Algorithm outline (the published spec, restated):

* regions: R1 = after the first non-vowel following a vowel, adjusted so
  at least 3 letters precede it. Vowels: ``a e i o u y æ å ø``.
* step 1 — suffix search limited to R1 (``setlimit tomark p1``, the same
  longest-fitting-inside-R1 semantics as the other Scandinavian
  dialects). Longest of ``hed ethed ered e erede ende erende ene erne
  ere en heden eren er heder erer heds es endes erendes enes ernes eres
  ens hedens erens ers ets erets et eret`` — delete; ``s`` — delete when
  preceded by a valid s-ending (``a b c d f g h j k l m n o p r t v y z
  å``; the preceding letter may sit outside R1).
* step 2 — if the word ends ``gd dt gt kt`` wholly in R1, delete the
  last letter.
* step 3 — first, a final ``st`` preceded by ``ig`` is deleted
  (``igst`` → ``ig``). Then, wholly in R1: longest of ``ig lig elig
  els`` — delete, then re-run step 2 on the result; ``løst`` → ``løs``.
* step 4 (undouble) — if the word ends in two identical non-vowels and
  the final letter sits inside R1, delete the final letter.

No prelude/postlude (``æ å ø`` are first-class vowels and survive).
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouyæåø")
_S_ENDING = frozenset("abcdfghjklmnoprtvyzå")

# length-descending so the first fitting match IS the among's longest match
_STEP1 = tuple(
    sorted(
        (
            "hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene",
            "erne", "ere", "en", "heden", "eren", "er", "heder", "erer",
            "heds", "es", "endes", "erendes", "enes", "ernes", "eres",
            "ens", "hedens", "erens", "ers", "ets", "erets", "et", "eret",
            "s",
        ),
        key=len,
        reverse=True,
    )
)

_PAIRS = ("gd", "dt", "gt", "kt")


def _r1(w: str) -> int:
    """After the first non-vowel following a vowel; at least 3 in."""
    n = len(w)
    i = 0
    while i < n and w[i] not in _VOWELS:
        i += 1
    while i < n and w[i] in _VOWELS:
        i += 1
    return max(i + 1 if i < n else n, 3)


def _consonant_pair(w: str, r1: int) -> str:
    if len(w) - 2 >= r1 and w[-2:] in _PAIRS:
        return w[:-1]
    return w


def stem(word: str) -> str:
    """Snowball-stem one lowercase Danish token."""
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

    # step 2 — consonant pair wholly inside R1: delete the last letter
    w = _consonant_pair(w, r1)

    # step 3 — igst → ig (unconditional), then other suffixes in R1
    if w.endswith("igst"):
        w = w[:-2]
    for suf in ("elig", "løst", "lig", "els", "ig"):
        p = len(w) - len(suf)
        if p >= r1 and w.endswith(suf):
            if suf == "løst":
                w = w[:-1]  # løst→løs: drop the t
            else:
                w = w[:p]
                w = _consonant_pair(w, r1)  # the spec's `do consonant_pair`
            break

    # step 4 — undouble a final identical non-vowel pair ending inside R1
    if (
        len(w) >= 2
        and w[-1] == w[-2]
        and w[-1] not in _VOWELS
        and len(w) - 1 >= r1
    ):
        w = w[:-1]

    return w


_CACHE: dict[str, str] = {}


def stem_cached(word: str) -> str:
    s = _CACHE.get(word)
    if s is None:
        if len(_CACHE) > 1_000_000:  # bound executor-resident memo
            _CACHE.clear()
        s = _CACHE[word] = stem(word)
    return s


# the Snowball Danish stop word list (snowballstem.org, public;
# reconstructed offline — a registry datum rather than an algorithm
# claim: ingest, query parse and the DuckDB oracle all consume this same
# set, so internal consistency holds regardless of any word-level delta
# from the upstream file)
DANISH_STOPWORDS = frozenset(
    """og i jeg det at en den til er som på de med han af for ikke der
var mig sig men et har om vi min havde ham hun nu over da fra du ud sin
dem os op man hans hvor eller hvad skal selv her alle vil blev kunne ind
når være dog noget ville jo deres efter ned skulle denne end dette mit
også under have dig anden hende mine alt meget sit sine vor mod disse
hvis din nogle hos blive mange ad bliver hendes været thi jer sådan""".split()
)
