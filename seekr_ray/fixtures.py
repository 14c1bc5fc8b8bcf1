"""Deterministic synthetic fixtures (FIXTURES.md).

``corpus`` — the primary input table of BASELINE.json's ``input_hint``:
``(repo, path, commit, lang, content)``.  Generation is keyed per-row by
``seed + row_index`` so any parallel partitioning produces identical rows
(bit-stable across runs and parallelism levels — SURVEY.md §7.5.4), and a
scale's corpus is NOT a prefix-dependent stream: row i is always the same.

``links`` — crawl-graph analog of ``extracted_links``
(``Crawler.java:404-407``): src key columns + ``dst_url``; ~10% dangling
targets; hubs via preferential-attachment-ish target choice; a 2-cycle and
a clique for PageRank convergence cases.

``QUERY_SET`` — the rank-identity query corpus covering every query-path
branch (FIXTURES.md §3).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

# ---------------------------------------------------------------------------
# vocabulary
# ---------------------------------------------------------------------------

_BASE_WORDS = [
    # code-like identifiers (FIXTURES.md §1)
    "parse", "parser", "parsing", "buffer", "buffered", "index", "indexing",
    "token", "tokenizer", "stream", "streaming", "query", "queries", "merge",
    "merging", "shard", "sharding", "vector", "matrix", "kernel", "module",
    "compile", "compiler", "compiled", "runtime", "thread", "threading",
    "socket", "packet", "cache", "caching", "cached", "hash", "hashing",
    "encode", "encoder", "encoding", "decode", "decoder", "decoding",
    "schema", "column", "partition", "partitioned", "cluster", "clustered",
    "replica", "replication", "commit", "commits", "branch", "branches",
    # morphology families for stemmer coverage
    "travel", "traveling", "traveler", "travelling", "connect", "connection",
    "connected", "connecting", "relate", "relational", "relating",
    "operate", "operator", "operation", "operational",
    "general", "generalize", "generalization",
]

_SYLLABLES = [
    "ba", "co", "de", "fi", "ga", "hu", "ji", "ka", "lo", "mi", "na", "po",
    "qu", "ra", "si", "ta", "ur", "va", "wo", "xe", "yo", "zu", "bel", "cor",
    "dun", "fen", "gor", "hin", "jar", "kel", "lim", "mon", "nor", "pel",
]

# tokens the validity filter must drop (FIXTURES.md §1)
_JUNK = ["x", "q7", "42", "snake_case", "camel_CASE9", "a" * 46, "don't"]

_STOP_SAMPLE = ["the", "and", "of", "to", "in", "for", "with", "about"]

# deliberately hot terms appearing in >50% of docs (hot-term salting path)
HOT_TERMS = ["hotspot", "ubiquit", "everywhere"]


def build_vocab(size: int = 5000) -> list[str]:
    rng = np.random.default_rng(SEED)
    vocab = list(_BASE_WORDS)
    seen = set(vocab)
    while len(vocab) < size:
        n = rng.integers(2, 5)
        w = "".join(rng.choice(_SYLLABLES) for _ in range(n))
        if w not in seen and 2 <= len(w) <= 45:
            seen.add(w)
            vocab.append(w)
    return vocab


_VOCAB: list[str] | None = None


def vocab() -> list[str]:
    global _VOCAB
    if _VOCAB is None:
        _VOCAB = build_vocab()
    return _VOCAB


# ---------------------------------------------------------------------------
# corpus rows
# ---------------------------------------------------------------------------

_EXTS = ["py", "java", "js", "md"]
_LANG_BY_EXT = {"py": "python", "java": "java", "js": "javascript", "md": "markdown"}
_DIRS = ["core", "util", "io", "net", "api", "db", "ui", "test"]

# Zipf-ish weights over 20 repos (repo = skew/domain key, Crawler.java:27-31)
_N_REPOS = 20


def _repo_of(rng: np.random.Generator) -> str:
    # zipf over 20 repos, exponent ~1.1
    ranks = np.arange(1, _N_REPOS + 1, dtype=np.float64)
    w = 1.0 / ranks**1.1
    w /= w.sum()
    i = rng.choice(_N_REPOS, p=w)
    return f"org{i % 4}/repo{i}"


def _commit_of(repo: str, path: str) -> str:
    return hashlib.sha256(f"{repo}:{path}".encode()).hexdigest()[:40]


def _content_of(rng: np.random.Generator, voc: list[str]) -> str:
    n_words = int(rng.integers(50, 2001))
    # Zipfian draw over the vocab
    ranks = rng.zipf(1.3, size=n_words)
    ranks = np.minimum(ranks, len(voc)) - 1
    words = [voc[r] for r in ranks]
    # sprinkle stopwords (~20%), junk (~2%)
    out: list[str] = []
    for w in words:
        out.append(w)
        r = rng.random()
        if r < 0.20:
            out.append(_STOP_SAMPLE[int(rng.integers(len(_STOP_SAMPLE)))])
        elif r < 0.22:
            out.append(_JUNK[int(rng.integers(len(_JUNK)))])
    # hot terms in >50% of docs, several occurrences
    for h in HOT_TERMS:
        if rng.random() < 0.6:
            for _ in range(int(rng.integers(1, 4))):
                out.insert(int(rng.integers(len(out) + 1)), h)
    return " ".join(out)


def corpus_row(i: int, voc: list[str]) -> dict:
    """Row ``i`` of the corpus — pure function of (SEED, i)."""
    rng = np.random.default_rng(SEED + 1000 + i)
    repo = _repo_of(rng)
    name = f"f{i:06d}"
    path = f"src/{_DIRS[int(rng.integers(len(_DIRS)))]}/{name}.{_EXTS[int(rng.integers(len(_EXTS)))]}"
    ext = path.rsplit(".", 1)[1]
    # ~2% duplicate-content pairs: every 50th row copies the previous row's
    # content (exact-dedup path, Crawler.java:163-169)
    if i % 50 == 49 and i > 0:
        content = corpus_row(i - 1, voc)["content"]
    else:
        content = _content_of(rng, voc)
    return {
        "repo": repo,
        "path": path,
        "commit": _commit_of(repo, path),
        "lang": _LANG_BY_EXT[ext],
        "content": content,
    }


def corpus_key(i: int) -> dict:
    """(repo, path, commit) of row ``i`` without generating its content.
    Draws the same leading RNG values as ``corpus_row`` so keys agree."""
    rng = np.random.default_rng(SEED + 1000 + i)
    repo = _repo_of(rng)
    name = f"f{i:06d}"
    path = f"src/{_DIRS[int(rng.integers(len(_DIRS)))]}/{name}.{_EXTS[int(rng.integers(len(_EXTS)))]}"
    return {"repo": repo, "path": path, "commit": _commit_of(repo, path)}


def corpus_batch(indices: np.ndarray) -> pa.Table:
    voc = vocab()
    rows = [corpus_row(int(i), voc) for i in indices]
    return pa.table(
        {
            "repo": [r["repo"] for r in rows],
            "path": [r["path"] for r in rows],
            "commit": [r["commit"] for r in rows],
            "lang": [r["lang"] for r in rows],
            "content": [r["content"] for r in rows],
        }
    )


def corpus_dataset(n_rows: int):
    """Distributed deterministic corpus generation as a Ray Dataset."""
    import ray.data as rd

    return rd.range(n_rows).map_batches(
        lambda b: corpus_batch(b["id"]), batch_format="numpy", batch_size=256
    )


def write_corpus_parquet(n_rows: int, out_path: str, row_group_size: int = 2048) -> str:
    """Driver-side corpus writer with /tmp caching by (n_rows, seed)."""
    if os.path.exists(out_path):
        return out_path
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    voc = vocab()
    tables = []
    for start in range(0, n_rows, 4096):
        idx = np.arange(start, min(start + 4096, n_rows))
        tables.append(corpus_batch(idx))
    table = pa.concat_tables(tables)
    tmp = out_path + ".tmp"
    pq.write_table(table, tmp, row_group_size=row_group_size)
    os.replace(tmp, out_path)
    return out_path


def cached_corpus_path(n_rows: int, base_dir: str = "/tmp/seekr_fixtures") -> str:
    path = os.path.join(base_dir, f"corpus_n{n_rows}_seed{SEED}.parquet")
    return write_corpus_parquet(n_rows, path)


def cached_corpus_dir(n_rows: int, base_dir: str = "/tmp/seekr_fixtures") -> str:
    """Parallel corpus generation via Ray into a cached directory.  Row i
    is a pure function of (SEED, i), so the distributed generation yields
    the same rows as the driver-side writer regardless of partitioning."""
    out_dir = os.path.join(base_dir, f"corpus_n{n_rows}_seed{SEED}_dir")
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    import ray

    if not ray.is_initialized():
        # modest fallback when no session exists (tests pre-generate)
        return cached_corpus_path(n_rows, base_dir)
    corpus_dataset(n_rows).write_parquet(out_dir, mode="overwrite")
    with open(marker, "w") as f:
        f.write("")
    return out_dir


# ---------------------------------------------------------------------------
# links
# ---------------------------------------------------------------------------


def doc_url(repo: str, path: str) -> str:
    return f"repo://{repo}/{path}"


def links_rows(n_docs: int) -> pa.Table:
    """Link graph over the first ``n_docs`` corpus rows (FIXTURES.md §2)."""
    keys = [corpus_key(i) for i in range(n_docs)]
    rng = np.random.default_rng(SEED + 77)
    src_repo, src_path, src_commit, dst_url = [], [], [], []

    def add(i: int, url: str) -> None:
        src_repo.append(keys[i]["repo"])
        src_path.append(keys[i]["path"])
        src_commit.append(keys[i]["commit"])
        dst_url.append(url)

    for i in range(n_docs):
        # ~15% of docs have no out-edges at all (dangling-mass path)
        if rng.random() < 0.15:
            continue
        n_out = int(rng.integers(1, 6))
        for _ in range(n_out):
            if rng.random() < 0.10:
                add(i, f"repo://nowhere/gone{int(rng.integers(1_000_000))}")
                continue
            # preferential-attachment-ish: low indices are hubs
            j = int(rng.zipf(1.4)) % n_docs
            add(i, doc_url(keys[j]["repo"], keys[j]["path"]))
    # a 2-cycle between the last two docs
    if n_docs >= 2:
        a, b = n_docs - 2, n_docs - 1
        add(a, doc_url(keys[b]["repo"], keys[b]["path"]))
        add(b, doc_url(keys[a]["repo"], keys[a]["path"]))
    # a self-contained 3-clique
    if n_docs >= 6:
        cl = [n_docs - 5, n_docs - 4, n_docs - 3]
        for x in cl:
            for y in cl:
                if x != y:
                    add(x, doc_url(keys[y]["repo"], keys[y]["path"]))
    return pa.table(
        {
            "src_repo": src_repo,
            "src_path": src_path,
            "src_commit": src_commit,
            "dst_url": dst_url,
        }
    )


def cached_links_path(n_docs: int, base_dir: str = "/tmp/seekr_fixtures") -> str:
    path = os.path.join(base_dir, f"links_n{n_docs}_seed{SEED}.parquet")
    if not os.path.exists(path):
        os.makedirs(base_dir, exist_ok=True)
        tmp = path + ".tmp"
        pq.write_table(links_rows(n_docs), tmp)
        os.replace(tmp, path)
    return path


# ---------------------------------------------------------------------------
# query set (FIXTURES.md §3)
# ---------------------------------------------------------------------------

QUERY_SET: list[tuple[str, str, int]] = [
    # (query_id, query_string, k)
    ("single_term", "parse", 10),
    ("single_term_morph", "parsing", 10),
    ("multi_term", "parse buffer index", 10),
    ("morph_family", "travel traveling traveler", 10),
    ("hot_term", "hotspot", 10),
    ("stopword_only", "the and of", 10),
    ("empty", "", 10),
    ("too_long_token", "a" * 46 + " parse", 10),
    ("mixed_case", "PArse BUFFER", 10),
    ("dup_words", "parse parse buffer", 10),
    ("phrase_adjacent", '"travel connect"', 10),
    ("phrase_gap", '"parse buffer"', 10),
    ("phrase_three", '"parse buffer index"', 10),
    ("phrase_absent", '"zzqqx yyzz"', 10),
    ("quoted_single", '"parse"', 10),
    ("bool_and", "parse AND buffer", 10),
    ("bool_or", "parse OR buffer", 10),
    ("bool_not", "parse NOT buffer", 10),
    ("bool_precedence", "parse OR buffer AND index", 10),
    ("bool_quoted_operand", '"travel connect" AND parse', 10),
    ("bool_malformed", "AND parse", 10),
    ("unknown_term", "qqqqzzzz", 10),
]
