"""Snippet generation — port of ``BackendManager.generateSnippet``
(``BackendManager.java:121-276``) and the HTML->text cleaner (M8).

Driver-side post-processing over the page of top-k rows only (k <= 100),
so no distributed operator is involved (SURVEY.md §2.2 M9).  The cleaning
regex chain is applied verbatim even though the code corpus stores plain
text — the tag/entity passes are no-ops there, the whitespace and
punctuation normalization is not.
"""

from __future__ import annotations

import re

_CLEAN_STEPS = [
    (re.compile(r"(?is)<script\b[^<]*(?:(?!</script>)<[^<]*)*</script>"), " "),
    (re.compile(r"(?is)<style\b[^<]*(?:(?!</style>)<[^<]*)*</style>"), " "),
    (re.compile(r"(?s)<!--.*?-->"), " "),
    (re.compile(r"<[^>]+>"), " "),
    (re.compile("&nbsp;|[ ]"), " "),
    (re.compile(r"&amp;"), "&"),
    (re.compile(r"&lt;"), "<"),
    (re.compile(r"&gt;"), ">"),
    (re.compile(r"&quot;"), '"'),
    (re.compile(r"&#39;"), "'"),
    (re.compile(r"&#[0-9]+;"), " "),
    (re.compile(r"&[a-zA-Z0-9#]+;"), " "),
    # control chars except \n \t  (Java [\p{Cntrl}&&[^\n\t]])
    (re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"), ""),
    (re.compile(r"\s*[\r\n]+\s*"), " "),
    (re.compile(r"\s*[.,!?]+\s*"), ". "),
    (re.compile(r"\.+"), "."),
    (re.compile(r"\s+"), " "),
]

_SNIPPET_CLEAN = [
    (re.compile(r"\s+"), " "),
    (re.compile(r"\s*[.,!?]+\s*"), ". "),
    (re.compile(r"\.+"), "."),
    (re.compile(r"^[^a-zA-Z0-9]+"), ""),
    (re.compile(r"[^a-zA-Z0-9]+$"), ""),
]

NO_PREVIEW = "No preview available for this result."


def clean_html(html: str) -> str:
    text = html
    for pattern, repl in _CLEAN_STEPS:
        text = pattern.sub(repl, text)
    return text.strip()


def generate_snippet(
    content: str | None,
    word_info: dict[str, tuple[float, float]],
    query_words: set[str],
) -> str:
    if not content:
        return NO_PREVIEW
    text = clean_html(content)

    best_position = -1
    lower = text.lower()
    for word in query_words:
        pos = lower.find(word.lower())
        if pos != -1:
            best_position = pos
            break
    if best_position == -1:
        # fallback quirk (BackendManager.java:174-188): "positions" here is
        # the wordInfo [frequency, IDF] list, so the frequency is used as a
        # character offset
        for word in query_words:
            info = word_info.get(word)
            if info:
                position = int(info[0])
                if position < len(text):
                    best_position = position
                    break
    if best_position == -1:
        return NO_PREVIEW

    start = best_position
    end = best_position
    while start > 0 and start > best_position - 150:
        if start >= 2 and text[start - 2 : start] == ". ":
            start -= 2
            break
        start -= 1
    while end < len(text) and end < best_position + 150:
        if end + 2 <= len(text) and text[end : end + 2] == ". ":
            end += 2
            break
        end += 1
    start = max(0, start)
    end = min(len(text), end)

    prefix = "..." if start > 0 else ""
    snippet_text = text[start:end].strip()

    contains = any(w.lower() in snippet_text.lower() for w in query_words)
    if not contains:
        start = max(0, best_position - 100)
        end = min(len(text), best_position + 100)
        snippet_text = text[start:end].strip()

    for pattern, repl in _SNIPPET_CLEAN:
        snippet_text = pattern.sub(repl, snippet_text)
    snippet_text = snippet_text.strip()

    for word in query_words:
        snippet_text = re.sub(
            r"(?i)\b" + re.escape(word) + r"\b",
            lambda m: f"<strong>{m.group(0)}</strong>",
            snippet_text,
        )

    suffix = "..." if end < len(text) else ""
    return prefix + snippet_text + suffix
