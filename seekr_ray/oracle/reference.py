"""In-process reference oracle (FIXTURES.md §4).

A deliberately naive, single-process reimplementation of the reference
formulas (SURVEY.md §1.3, §2.9) straight from the raw corpus rows — no
segments, no codecs, no Ray.  Rank-identity tests compare the engine's
output against this, so the two paths share only the tokenizer (which has
its own golden tests) and must agree end-to-end:

* tf(t,d) = count(t,d) / n_valid(d)  (single-section weight 1.0)
* idf(t)  = log10(N / df(t))         (SQLite LOG is base-10)
* score   = 0.7 * Σ tf·idf·1.0 + 0.3 * pagerank
* boolean AND/OR/NOT incl. AND's left-wordInfo bias and OR's
  right-overwrite merge; phrase walk with MAX_GAP=3 and the in-range
  slide quirk; ordering score desc then doc_id asc.
"""

from __future__ import annotations

import math

from ..query.parser import (
    detect_operator,
    is_quoted,
    split_query,
    strip_quotes,
    tokenize_and_stem,
)
from ..text.tokenizer import Tokenizer

TFIDF_WEIGHT = 0.7
PAGERANK_WEIGHT = 0.3
MAX_GAP = 3


class OracleIndex:
    def __init__(self, docs: list[tuple[int, str]], pagerank: dict[int, float] | None = None):
        """docs: [(doc_id, content)] — duplicates must be removed upstream."""
        tok = Tokenizer()
        self.n_docs = len(docs)
        # term -> {doc_id: (tf, positions)}
        self.index: dict[int, dict[str, tuple[float, list[int]]]] = {}
        self.postings: dict[str, dict[int, tuple[float, list[int]]]] = {}
        for doc_id, content in docs:
            info, _ = tok.tokenize_document(content or "")
            self.index[doc_id] = info
            for term, (tf, pos) in info.items():
                self.postings.setdefault(term, {})[doc_id] = (tf, pos)
        self.idf = {
            t: math.log10(self.n_docs / len(d)) for t, d in self.postings.items()
        }
        self.pagerank = pagerank or {}

    # -- component paths ----------------------------------------------------

    def _free_text(self, query: str):
        stems, stem_to_original = tokenize_and_stem(query)
        query_words = list(stem_to_original.values())
        docs: dict[int, dict[str, tuple[float, float]]] = {}
        for s in stems:
            posting = self.postings.get(s)
            if not posting:
                continue
            orig = stem_to_original.get(s, s)
            for doc_id, (tf, _pos) in posting.items():
                docs.setdefault(doc_id, {})[orig] = (tf, self.idf[s])
        return docs, query_words

    def _phrase(self, query: str):
        clean = strip_quotes(query)
        original_words = clean.split() or [clean]
        stems, _ = tokenize_and_stem(clean)
        docs: dict[int, dict[str, tuple[float, float]]] = {}
        if not stems:
            return docs, list(original_words)
        stem_to_original = {
            stems[i]: original_words[i]
            for i in range(min(len(stems), len(original_words)))
        }
        candidates = None
        for s in stems:
            ids = set(self.postings.get(s, {}))
            candidates = ids if candidates is None else candidates & ids
        for doc_id in sorted(candidates or ()):
            pos_lists = [list(self.postings[s][doc_id][1]) for s in stems]
            if any(not pl for pl in pos_lists):
                continue
            if self._check_sequential(pos_lists):
                docs[doc_id] = {
                    stem_to_original.get(s, s): (
                        self.postings[s][doc_id][0],
                        self.idf[s],
                    )
                    for s in stems
                }
        return docs, list(original_words)

    @staticmethod
    def _check_sequential(pos_lists: list[list[int]]) -> bool:
        for start in pos_lists[0]:
            current = start
            valid = True
            for wi in range(1, len(pos_lists)):
                found = False
                for p in pos_lists[wi]:
                    if current < p <= current + MAX_GAP:
                        if not found or p < current + MAX_GAP:
                            current = p
                            found = True
                if not found:
                    valid = False
                    break
            if valid:
                return True
        return False

    def _component(self, query: str):
        if is_quoted(query):
            return self._phrase(query)
        return self._free_text(query)

    # -- full query ---------------------------------------------------------

    def search(self, query: str, k: int | None = None):
        """Returns ranked [(doc_id, score)] — the rank-identity contract."""
        if query is None or not query.strip():
            return []
        operator = detect_operator(query)
        if operator:
            parts = split_query(query)
            if len(parts) == 2:
                ldocs, lwords = self._component(parts[0].strip())
                rdocs, rwords = self._component(parts[1].strip())
                words = lwords + rwords
                if operator == "AND":
                    docs = {
                        d: wi for d, wi in ldocs.items() if d in rdocs
                    }  # left wordInfo only (B1)
                elif operator == "OR":
                    docs = {}
                    for d, wi in ldocs.items():
                        docs[d] = dict(wi)
                    for d, wi in rdocs.items():
                        if d in docs:
                            docs[d].update(wi)  # right overwrites (B2)
                        else:
                            docs[d] = dict(wi)
                else:  # NOT
                    docs = {d: wi for d, wi in ldocs.items() if d not in rdocs}
            else:
                docs, words = self._component(query)
        else:
            docs, words = self._component(query)

        ranked = []
        for doc_id, wi in docs.items():
            tfidf = 0.0
            for w in words:
                info = wi.get(w)
                if info is not None:
                    tfidf += info[0] * info[1]
            score = TFIDF_WEIGHT * tfidf + PAGERANK_WEIGHT * self.pagerank.get(
                doc_id, 0.0
            )
            ranked.append((doc_id, score))
        ranked.sort(key=lambda t: (-t[1], t[0]))
        return ranked if k is None else ranked[:k]


def reference_pagerank(
    edges: list[tuple[int, int]], damping: float = 0.85, epsilon: float = 1e-5
) -> dict[int, float]:
    """Naive dict-based PageRank mirroring ``PageRank.java:56-105``:
    synchronous updates, dangling redistribution, max-norm stop."""
    adj: dict[int, list[int]] = {}
    for s, d in edges:
        adj.setdefault(s, [])
        adj.setdefault(d, [])
        if d not in adj[s]:
            adj[s].append(d)
    n = len(adj)
    if n == 0:
        return {}
    prob = {node: 1.0 / n for node in adj}
    while True:
        dangling = sum(prob[x] for x, e in adj.items() if not e)
        new_prob = {}
        for i in adj:
            rank = (1 - damping) / n
            for j, e in adj.items():
                if i in e:
                    rank += damping * prob[j] / len(e)
            rank += damping * dangling / n
            new_prob[i] = rank
        exit_ = all(abs(prob[x] - new_prob[x]) <= epsilon for x in prob)
        prob = new_prob
        if exit_:
            return prob
