"""Porter stemmer — faithful Python implementation of the original algorithm.

Porter, 1980, "An algorithm for suffix stripping", Program 14(3) 130-137;
reference implementation published at tartarus.org/~martin/PorterStemmer
(public domain).  The reference engine uses the classic tartarus Java
version verbatim (``QP/Stemmer.java:45-359``), so token-identity requires
this *exact* variant — including its quirks:

* words of length <= 2 are returned unchanged (``Stemmer.java:357`` guards
  the steps with ``k > 1``);
* step 1c turns a terminal ``y`` into ``i`` whenever the stem contains a
  vowel (``Stemmer.java:253``);
* step 2 includes the updated ``logi -> log`` rule (``Stemmer.java:288``);
* in step 5 (Java ``step6``) ``j`` is pinned to the *entry* value of ``k``,
  so the ``m()`` used by rule 5b still sees the ``e`` removed by 5a
  (``Stemmer.java:341-348``).

NLTK / PyStemmer "porter" variants differ subtly from this; do not swap
them in.  Golden tests: ``tests/test_porter.py``.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")


class _P:
    """Mutable stemming state over a char buffer, mirroring the original
    algorithm's (b, j, k) index machinery so edge-case behavior matches."""

    __slots__ = ("b", "j", "k")

    def __init__(self, word: str) -> None:
        self.b = list(word)
        self.j = 0
        self.k = len(word) - 1

    def cons(self, i: int) -> bool:
        ch = self.b[i]
        if ch in _VOWELS:
            return False
        if ch == "y":
            return True if i == 0 else not self.cons(i - 1)
        return True

    def m(self) -> int:
        """Number of consonant-vowel sequences in b[0..j]."""
        n = 0
        i = 0
        while True:
            if i > self.j:
                return n
            if not self.cons(i):
                break
            i += 1
        i += 1
        while True:
            while True:
                if i > self.j:
                    return n
                if self.cons(i):
                    break
                i += 1
            i += 1
            n += 1
            while True:
                if i > self.j:
                    return n
                if not self.cons(i):
                    break
                i += 1
            i += 1

    def vowelinstem(self) -> bool:
        return any(not self.cons(i) for i in range(self.j + 1))

    def doublec(self, j: int) -> bool:
        if j < 1:
            return False
        if self.b[j] != self.b[j - 1]:
            return False
        return self.cons(j)

    def cvc(self, i: int) -> bool:
        if i < 2 or not self.cons(i) or self.cons(i - 1) or not self.cons(i - 2):
            return False
        return self.b[i] not in ("w", "x", "y")

    def ends(self, s: str) -> bool:
        l = len(s)
        o = self.k - l + 1
        if o < 0:
            return False
        for i in range(l):
            if self.b[o + i] != s[i]:
                return False
        self.j = self.k - l
        return True

    def setto(self, s: str) -> None:
        o = self.j + 1
        for i, ch in enumerate(s):
            if o + i < len(self.b):
                self.b[o + i] = ch
            else:
                self.b.append(ch)
        self.k = self.j + len(s)

    def r(self, s: str) -> None:
        if self.m() > 0:
            self.setto(s)

    # -- steps (numbered as in the Java reference: step1..step6) ----------

    def step1(self) -> None:
        if self.b[self.k] == "s":
            if self.ends("sses"):
                self.k -= 2
            elif self.ends("ies"):
                self.setto("i")
            elif self.b[self.k - 1] != "s":
                self.k -= 1
        if self.ends("eed"):
            if self.m() > 0:
                self.k -= 1
        elif (self.ends("ed") or self.ends("ing")) and self.vowelinstem():
            self.k = self.j
            if self.ends("at"):
                self.setto("ate")
            elif self.ends("bl"):
                self.setto("ble")
            elif self.ends("iz"):
                self.setto("ize")
            elif self.doublec(self.k):
                self.k -= 1
                if self.b[self.k] in ("l", "s", "z"):
                    self.k += 1
            elif self.m() == 1 and self.cvc(self.k):
                self.setto("e")

    def step2(self) -> None:
        if self.ends("y") and self.vowelinstem():
            self.b[self.k] = "i"

    _STEP3 = {
        "a": (("ational", "ate"), ("tional", "tion")),
        "c": (("enci", "ence"), ("anci", "ance")),
        "e": (("izer", "ize"),),
        "l": (("bli", "ble"), ("alli", "al"), ("entli", "ent"), ("eli", "e"),
              ("ousli", "ous")),
        "o": (("ization", "ize"), ("ation", "ate"), ("ator", "ate")),
        "s": (("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
              ("ousness", "ous")),
        "t": (("aliti", "al"), ("iviti", "ive"), ("biliti", "ble")),
        "g": (("logi", "log"),),
    }

    def step3(self) -> None:
        if self.k == 0:
            return
        for suf, rep in self._STEP3.get(self.b[self.k - 1], ()):
            if self.ends(suf):
                self.r(rep)
                return

    _STEP4 = {
        "e": (("icate", "ic"), ("ative", ""), ("alize", "al")),
        "i": (("iciti", "ic"),),
        "l": (("ical", "ic"), ("ful", "")),
        "s": (("ness", ""),),
    }

    def step4(self) -> None:
        for suf, rep in self._STEP4.get(self.b[self.k], ()):
            if self.ends(suf):
                self.r(rep)
                return

    def step5(self) -> None:
        if self.k == 0:
            return
        ch = self.b[self.k - 1]
        if ch == "a":
            if not self.ends("al"):
                return
        elif ch == "c":
            if not (self.ends("ance") or self.ends("ence")):
                return
        elif ch == "e":
            if not self.ends("er"):
                return
        elif ch == "i":
            if not self.ends("ic"):
                return
        elif ch == "l":
            if not (self.ends("able") or self.ends("ible")):
                return
        elif ch == "n":
            if not (self.ends("ant") or self.ends("ement")
                    or self.ends("ment") or self.ends("ent")):
                return
        elif ch == "o":
            if not ((self.ends("ion") and self.j >= 0
                     and self.b[self.j] in ("s", "t")) or self.ends("ou")):
                return
        elif ch == "s":
            if not self.ends("ism"):
                return
        elif ch == "t":
            if not (self.ends("ate") or self.ends("iti")):
                return
        elif ch == "u":
            if not self.ends("ous"):
                return
        elif ch == "v":
            if not self.ends("ive"):
                return
        elif ch == "z":
            if not self.ends("ize"):
                return
        else:
            return
        if self.m() > 1:
            self.k = self.j

    def step6(self) -> None:
        # j pinned to the entry k on purpose — see module docstring.
        self.j = self.k
        if self.b[self.k] == "e":
            a = self.m()
            if a > 1 or (a == 1 and not self.cvc(self.k - 1)):
                self.k -= 1
        if self.b[self.k] == "l" and self.doublec(self.k) and self.m() > 1:
            self.k -= 1


def stem(word: str) -> str:
    """Stem a single lowercase word.  Length <= 2 is returned unchanged."""
    if len(word) <= 2:
        return word
    p = _P(word)
    p.step1()
    p.step2()
    p.step3()
    p.step4()
    p.step5()
    p.step6()
    return "".join(p.b[: p.k + 1])


class CachingStemmer:
    """Per-actor memoized stemmer.  Vocabulary is Zipfian, so a plain dict
    cache turns the per-token cost into a dict hit for almost all tokens."""

    __slots__ = ("_cache",)

    def __init__(self) -> None:
        self._cache: dict[str, str] = {}

    def stem(self, word: str) -> str:
        s = self._cache.get(word)
        if s is None:
            s = stem(word)
            self._cache[word] = s
        return s
