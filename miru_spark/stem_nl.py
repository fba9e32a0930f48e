"""Dutch Snowball stemmer — the sixth stemming analyzer dialect.

Reference parity: TermAnalyzers wires Lucene's ``DutchAnalyzer`` for the
``nl`` locale (miru-plugin/src/main/java/com/jivesoftware/os/miru/plugin/
query/TermAnalyzers.java:74); Lucene's DutchAnalyzer applies the Dutch
Snowball stemmer after stopword removal. This is a faithful pure-Python
implementation of the PUBLISHED algorithm (Snowball project, "Dutch
stemming algorithm", snowballstem.org — public knowledge), structured
like the other dialect modules.

Algorithm outline (the published spec, restated):

* prelude: fold umlauted/acute vowels (``ä á→a ë é→e ï í→i ö ó→o ü ú→u``,
  ``è`` is a first-class vowel and stays); word-initial ``y`` → ``Y``;
  after a vowel, ``i`` followed by a vowel → ``I`` and ``y`` → ``Y``
  (upper case marks them consonants for every later test).
* regions: R1/R2 standard, R1 adjusted so ≥3 letters precede it.
  Vowels: ``a e i o u y è``.
* step 1 (longest match, THEN condition — the German-style among):
  ``heden`` → ``heid`` in R1; ``en ene`` → delete in R1 when preceded by
  a valid en-ending (a non-vowel, and the stem does not end ``gem``),
  then undouble (a final ``kk dd tt`` drops its last letter);
  ``s se`` → delete in R1 when preceded by a valid s-ending (a
  non-vowel other than ``j``).
* step 2: delete a final ``e`` in R1 preceded by a non-vowel, then
  undouble; record that an e was removed (the ``bar`` gate below).
* step 3a: ``heid`` → delete in R2 when not preceded by ``c``; then a
  now-final ``en`` is treated as in step 1(b).
* step 3b (longest of): ``end ing`` → delete in R2, then a preceding
  ``ig`` in R2 not after ``e`` also deletes, else undouble; ``ig`` →
  delete in R2 when not after ``e``; ``lijk`` → delete in R2 then repeat
  step 2; ``baar`` → delete in R2; ``bar`` → delete in R2 only if step 2
  removed an e.
* step 4 (undouble vowel): word ends C·VV·D with C a non-vowel, VV a
  double ``a e o u``, D a non-vowel other than ``I`` → drop one vowel
  (``brood`` → ``brod``).
* postlude: ``Y``→``y``, ``I``→``i``.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouyè")
_ACCENT_FOLD = str.maketrans(
    {"ä": "a", "á": "a", "ë": "e", "é": "e", "ï": "i", "í": "i",
     "ö": "o", "ó": "o", "ü": "u", "ú": "u"}
)
_POSTLUDE = str.maketrans({"Y": "y", "I": "i"})


def _prelude(word: str) -> str:
    w = word.translate(_ACCENT_FOLD)
    chars = list(w)
    if chars and chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i - 1] in _VOWELS:
            if chars[i] == "i" and i + 1 < len(chars) and chars[i + 1] in _VOWELS:
                chars[i] = "I"
            elif chars[i] == "y":
                chars[i] = "Y"
    return "".join(chars)


def _region_after(w: str, begin: int) -> int:
    n = len(w)
    i = begin
    while i < n and w[i] not in _VOWELS:
        i += 1
    while i < n and w[i] in _VOWELS:
        i += 1
    return i + 1 if i < n else n


def _undouble(w: str) -> str:
    return w[:-1] if w[-2:] in ("kk", "dd", "tt") else w


def stem(word: str) -> str:
    """Snowball-stem one lowercase Dutch token."""
    w = _prelude(word)
    r1 = max(_region_after(w, 0), 3)
    r2 = _region_after(w, _region_after(w, 0))

    def en_ending_ok(p: int) -> bool:
        return (
            p >= r1
            and p > 0
            and w[p - 1] not in _VOWELS
            and not w[:p].endswith("gem")
        )

    # step 1 — longest match first, then the condition (among semantics)
    for suf in ("heden", "ene", "en", "se", "s"):
        if w.endswith(suf):
            p = len(w) - len(suf)
            if suf == "heden":
                if p >= r1:
                    w = w[:p] + "heid"
            elif suf in ("en", "ene"):
                if en_ending_ok(p):
                    w = _undouble(w[:p])
            else:  # s / se
                if p >= r1 and p > 0 and w[p - 1] not in _VOWELS and w[p - 1] != "j":
                    w = w[:p]
            break

    # step 2 — final e in R1 after a non-vowel; remember for 'bar'
    e_found = False
    if w.endswith("e") and len(w) - 1 >= r1 and len(w) >= 2 and w[-2] not in _VOWELS:
        w = _undouble(w[:-1])
        e_found = True

    # step 3a — heid (not after c) in R2, then a now-final en as in 1(b)
    if w.endswith("heid") and len(w) - 4 >= r2 and (len(w) < 5 or w[-5] != "c"):
        w = w[:-4]
        if w.endswith("en") and en_ending_ok(len(w) - 2):
            w = _undouble(w[:-2])

    # step 3b — d-suffixes, longest match first
    for suf in ("lijk", "baar", "end", "ing", "bar", "ig"):
        if w.endswith(suf):
            p = len(w) - len(suf)
            if suf in ("end", "ing"):
                if p >= r2:
                    w = w[:p]
                    if (
                        w.endswith("ig")
                        and len(w) - 2 >= r2
                        and (len(w) < 3 or w[-3] != "e")
                    ):
                        w = w[:-2]
                    else:
                        w = _undouble(w)
            elif suf == "ig":
                if p >= r2 and (p == 0 or w[p - 1] != "e"):
                    w = w[:p]
            elif suf == "lijk":
                if p >= r2:
                    w = w[:p]
                    # repeat step 2
                    if (
                        w.endswith("e")
                        and len(w) - 1 >= r1
                        and len(w) >= 2
                        and w[-2] not in _VOWELS
                    ):
                        w = _undouble(w[:-1])
            elif suf == "baar":
                if p >= r2:
                    w = w[:p]
            else:  # bar — only when step 2 removed an e
                if p >= r2 and e_found:
                    w = w[:p]
            break

    # step 4 — undouble vowel: C + aa/ee/oo/uu + (non-vowel ≠ I)
    if (
        len(w) >= 4
        and w[-1] not in _VOWELS
        and w[-1] != "I"
        and w[-2] == w[-3]
        and w[-2] in "aeou"
        and w[-4] not in _VOWELS
    ):
        w = w[:-2] + w[-1]

    return w.translate(_POSTLUDE)


_CACHE: dict[str, str] = {}


def stem_cached(word: str) -> str:
    s = _CACHE.get(word)
    if s is None:
        if len(_CACHE) > 1_000_000:  # bound executor-resident memo
            _CACHE.clear()
        s = _CACHE[word] = stem(word)
    return s


# the Snowball Dutch stop word list (snowballstem.org, public;
# reconstructed offline — a registry datum rather than an algorithm
# claim: ingest, query parse and the DuckDB oracle all consume this same
# set, so internal consistency holds regardless of any word-level delta
# from the upstream file)
DUTCH_STOPWORDS = frozenset(
    """de en van ik te dat die in een hij het niet zijn is was op aan met
als voor had er maar om hem dan zou of wat mijn men dit zo door over ze
zich bij ook tot je mij uit der daar haar naar heb hoe heeft hebben deze
u want nog zal me zij nu ge geen omdat iets worden toch al waren veel
meer doen toen moet ben zonder kan hun dus alles onder ja eens hier wie
werd altijd doch wordt wezen kunnen ons zelf tegen na reeds wil kon
niets uw iemand geweest andere""".split()
)
