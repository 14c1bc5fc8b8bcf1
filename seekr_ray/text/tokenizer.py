"""Tokenization with reference-identical semantics.

Mirrors ``Indexer/Tokenizer.java`` behavior exactly (see SURVEY.md §1.3,
§2.2 M6/M7/M10):

* word regex ``\\b[\\w']+\\b`` over the lowercased text, ASCII classes
  (``Tokenizer.java:79,105``);
* validity filter on the *original* token: 2 <= len <= 45, ``^[a-zA-Z]+$``,
  not a stopword (``Tokenizer.java:118-123``);
* survivors are Porter-stemmed (``Tokenizer.java:102-116``);
* per-document aggregation: each occurrence of a stem adds its section
  weight to the stem's count and appends its index *within the section's
  valid-token list* to the stem's position list
  (``Tokenizer.java:227-253``);
* the per-doc denominator is the count of stems that are *themselves*
  valid words — the reference re-applies ``isValidWord`` to the stemmed
  output in ``countTokens`` (``Tokenizer.java:255-259``), so a stem that
  collapses onto a stopword still scores but does not count toward the
  total.  Every count is divided by that total (``Tokenizer.java:218-222``).

For the source-code corpus we run in single-section mode (everything is
"content", weight 1.0) so positions are global offsets in the valid-token
stream — FIXTURES.md §4.  The HTML-style section weights
(``Tokenizer.java:26-33``) are supported via ``tokenize_sections`` for
parity with the weighted path.
"""

from __future__ import annotations

import re
from typing import Iterable

from .porter import CachingStemmer
from .stopwords import STOPWORDS

# Java Pattern \w is ASCII [a-zA-Z0-9_]; Python needs re.ASCII to match.
WORD_RE = re.compile(r"\b[\w']+\b", re.ASCII)
ALPHA_RE = re.compile(r"^[a-zA-Z]+$")

_MISS = object()

MIN_WORD_LENGTH = 2
MAX_WORD_LENGTH = 45

# HTML-section weights (Tokenizer.java:26-33)
SECTION_WEIGHTS = {
    "title": 5.0,
    "h1": 4.0,
    "h2": 3.0,
    "h3": 2.5,
    "h4": 2.0,
    "h5": 1.8,
    "h6": 1.5,
    "content": 1.0,
}


def is_valid_word(word: str, remove_stopwords: bool = True) -> bool:
    return (
        MIN_WORD_LENGTH <= len(word) <= MAX_WORD_LENGTH
        and ALPHA_RE.match(word) is not None
        and (not remove_stopwords or word not in STOPWORDS)
    )


class Tokenizer:
    """Stateful tokenizer: stopword set + memoized Porter stemmer.

    Construct once per worker/actor (SURVEY.md §2.3 T1); the stem cache is
    the mutable state that makes per-token cost a dict lookup.
    """

    _CACHE_MAX = 1_000_000  # bound per-actor memory on open vocabularies

    def __init__(self) -> None:
        self._stemmer = CachingStemmer()
        # token -> (stem | None-if-dropped, stem-passes-validity) — one
        # dict hit per occurrence (vocabulary is Zipfian, so ~every token
        # after warmup is a cache hit); the bool is the denominator quirk
        self._tok_cache: dict[str, tuple[str | None, bool]] = {}
        # validity-of-stem cache for the denominator quirk
        self._valid_stem: dict[str, bool] = {}

    def tokenize_string(self, text: str, remove_stopwords: bool = True) -> list[str]:
        """Lowercase, regex-split, validity-filter, stem.  One stem per
        surviving token, in occurrence order (``Tokenizer.java:102-116``)."""
        if not remove_stopwords:
            stem = self._stemmer.stem
            return [
                stem(w)
                for w in WORD_RE.findall(text.lower())
                if is_valid_word(w, False)
            ]
        cache = self._tok_cache
        out: list[str] = []
        append = out.append
        miss = _MISS
        for word in WORD_RE.findall(text.lower()):
            e = cache.get(word, miss)
            if e is miss:
                if is_valid_word(word, True):
                    s = self._stemmer.stem(word)
                    e = (s, self._stem_is_valid(s))
                else:
                    e = (None, False)
                if len(cache) >= self._CACHE_MAX:
                    cache.clear()
                cache[word] = e
            if e[0] is not None:
                append(e[0])
        return out

    def resolve(self, word: str) -> tuple[str | None, bool]:
        """(stem | None-if-dropped, counts-toward-denominator) for one
        lowercased token through the per-worker cache — the fused
        per-token step of ``tokenize_document``, exposed for the
        vocabulary-at-a-time vectorized batch kernel (one call per
        DISTINCT token per batch instead of per occurrence)."""
        e = self._tok_cache.get(word, _MISS)
        if e is _MISS:
            if is_valid_word(word, True):
                s = self._stemmer.stem(word)
                e = (s, self._stem_is_valid(s))
            else:
                e = (None, False)
            if len(self._tok_cache) >= self._CACHE_MAX:
                self._tok_cache.clear()
            self._tok_cache[word] = e
        return e

    def _stem_is_valid(self, s: str) -> bool:
        v = self._valid_stem.get(s)
        if v is None:
            v = is_valid_word(s, True)
            self._valid_stem[s] = v
        return v

    def count_valid_stems(self, stems: Iterable[str]) -> int:
        """The reference denominator: stems that re-pass the validity filter
        (``Tokenizer.java:255-259``)."""
        return sum(1 for s in stems if self._stem_is_valid(s))

    def tokenize_document(
        self, text: str
    ) -> tuple[dict[str, tuple[float, list[int]]], int]:
        """Single-section tokenization of one document.

        Returns ``({stem: (tf, positions)}, n_valid)`` where ``tf`` is the
        normalized weighted count (count / n_valid; 0-division guarded like
        the reference: if n_valid == 0 counts stay unnormalized) and
        ``positions`` are indices into the valid-token stream.

        Single fused pass: each token resolves through one cache entry
        carrying (stem | None, counts-toward-denominator) so the hot loop
        is one dict hit + two dict updates per surviving token.
        """
        cache = self._tok_cache
        counts: dict[str, float] = {}
        positions: dict[str, list[int]] = {}
        total = 0
        i = 0
        miss = _MISS
        for word in WORD_RE.findall(text.lower()):
            e = cache.get(word, miss)
            if e is miss:
                if is_valid_word(word, True):
                    s = self._stemmer.stem(word)
                    e = (s, self._stem_is_valid(s))
                else:
                    e = (None, False)
                if len(cache) >= self._CACHE_MAX:
                    cache.clear()
                cache[word] = e
            s = e[0]
            if s is None:
                continue
            if e[1]:
                total += 1
            c = counts.get(s)
            if c is None:
                counts[s] = 1.0
                positions[s] = [i]
            else:
                counts[s] = c + 1.0
                positions[s].append(i)
            i += 1
        if total > 0:
            return (
                {s: (c / total, positions[s]) for s, c in counts.items()},
                total,
            )
        return ({s: (c, positions[s]) for s, c in counts.items()}, 0)

    def tokenize_sections(
        self, sections: list[tuple[str, str]]
    ) -> tuple[dict[str, tuple[float, list[int], str]], int]:
        """Weighted multi-section tokenization (``Tokenizer.java:126-253``).

        ``sections`` is ``[(section_name, text), ...]``; unknown names get
        content weight.  Positions are per-section indices and interleave
        into one list per stem, exactly like the reference's concurrent-map
        accumulation (``Tokenizer.java:235-241``).  Returns
        ``({stem: (tf, positions, best_section)}, n_valid)``.
        """
        counts: dict[str, float] = {}
        positions: dict[str, list[int]] = {}
        best: dict[str, str] = {}
        total = 0
        for name, text in sections:
            if not text:
                continue
            w = SECTION_WEIGHTS.get(name, 1.0)
            stems = self.tokenize_string(text, True)
            for i, s in enumerate(stems):
                counts[s] = counts.get(s, 0.0) + w
                ps = positions.get(s)
                if ps is None:
                    positions[s] = [i]
                else:
                    ps.append(i)
                prev = best.get(s)
                if prev is None or w > SECTION_WEIGHTS.get(prev, 1.0):
                    best[s] = name
            total += self.count_valid_stems(stems)
        if total > 0:
            return (
                {s: (c / total, positions[s], best[s]) for s, c in counts.items()},
                total,
            )
        return ({s: (c, positions[s], best[s]) for s, c in counts.items()}, 0)
