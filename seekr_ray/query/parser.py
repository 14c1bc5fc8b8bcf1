"""Query-string parsing — exact port of the reference semantics.

``QP/QP.java:360-422`` rules:

* operator detection order OR > AND > NOT, raw ``contains(" OP ")`` match
  (``QP.java:368-373``); split once (limit 2, ``QP.java:360-366``); a split
  that does not yield exactly 2 parts falls back to a plain query
  (``QP.java:118-121``);
* quoted means starts-with AND ends-with ``"`` (``QP.java:375-377``);
* query-side ``tokenizeAndStem`` (``QP.java:379-422``) does NOT apply the
  index validity filter: it whitespace-splits, lowercases, Porter-stems
  every token (stopwords included — they simply match nothing in the
  index), dedups stems, and records stem -> original-cased token.

Determinization (documented divergence): the reference keeps stems in a
``HashSet`` and fills ``stemToOriginal`` from racing futures, so its stem
order and last-writer are JVM-unstable.  We use first-seen insertion order
for stems and last-in-token-order for the stem->original mapping; ranking
is insensitive to this except for ties the reference itself leaves
unspecified.
"""

from __future__ import annotations

from ..text.porter import CachingStemmer

_shared_stemmer = CachingStemmer()


def detect_operator(query: str) -> str:
    if " OR " in query:
        return "OR"
    if " AND " in query:
        return "AND"
    if " NOT " in query:
        return "NOT"
    return ""


def split_query(query: str) -> list[str]:
    query = query.strip()
    for op in (" OR ", " AND ", " NOT "):
        if op in query:
            return query.split(op, 1)
    return [query]


def is_quoted(q: str | None) -> bool:
    return q is not None and q.startswith('"') and q.endswith('"')


def strip_quotes(q: str) -> str:
    out = q
    if out.startswith('"'):
        out = out[1:]
    if out.endswith('"'):
        out = out[:-1]
    return out


def tokenize_and_stem(text: str) -> tuple[list[str], dict[str, str]]:
    """Returns (stems in first-seen order, stem -> original token)."""
    if text is None or not text.strip():
        return [], {}
    if is_quoted(text):
        tokens = [strip_quotes(text)]
    else:
        tokens = text.split()
    stems: list[str] = []
    seen: set[str] = set()
    stem_to_original: dict[str, str] = {}
    for token in tokens:
        if not token.strip():
            continue
        lower = token.lower()
        if not lower:
            continue
        s = _shared_stemmer.stem(lower)
        if s:
            if s not in seen:
                seen.add(s)
                stems.append(s)
            stem_to_original[s] = token
    return stems, stem_to_original
