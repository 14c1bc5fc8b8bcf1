"""Link extraction + key normalization for the code corpus.

The crawl-side operators of SURVEY.md §2.2 re-expressed for source files:

* **M1/M2 analog** — ``normalize_keys``: canonicalize the (repo, path)
  identity the way the crawler canonicalizes URLs
  (``Crawler.java:491-529``): lowercase the repo (the "scheme+host"),
  strip leading "./"/"/" and collapse duplicate slashes in the path,
  drop a trailing slash; rows whose key is unusable are dropped (the
  normalizer's null-on-parse-failure).  ``repo`` doubles as the domain
  key for skew caps (``Crawler.java:531-540``).
* **M4 analog** — ``extract_links``: per-language import/include
  extraction from ``content`` producing out-edge rows
  ``(src_repo, src_path, src_commit, dst_url)`` with ``repo://`` URLs,
  capped at ``max_links_per_doc`` like the crawler's per-page cap
  (``Crawler.java:475-489``, cap at 10).  Python/Java/JS imports are
  resolved repo-relative; unresolvable targets stay as dangling URLs the
  resolve join will drop (J1 semantics).
"""

from __future__ import annotations

import re

import pyarrow as pa

MAX_LINKS_PER_DOC = 10

_IMPORT_RES = {
    "python": re.compile(r"^\s*(?:from|import)\s+([A-Za-z_][\w.]*)", re.M),
    "java": re.compile(r"^\s*import\s+([A-Za-z_][\w.]*)\s*;", re.M),
    "javascript": re.compile(
        r"""(?:require\(|from\s+)['"]([^'"]+)['"]""", re.M
    ),
}


def normalize_repo(repo: str | None) -> str | None:
    if not repo:
        return None
    r = repo.strip().lower().strip("/")
    return r or None


def normalize_path(path: str | None) -> str | None:
    if not path:
        return None
    p = path.strip()
    while p.startswith("./"):
        p = p[2:]
    p = re.sub(r"/{2,}", "/", p).lstrip("/")
    if p.endswith("/"):
        p = p[:-1]
    return p or None


def normalize_keys(ds):
    """Canonicalize (repo, path); drop rows with unusable keys."""

    def norm(batch: pa.Table) -> pa.Table:
        repos, paths, keep = [], [], []
        for r, p in zip(batch["repo"].to_pylist(), batch["path"].to_pylist()):
            nr, np_ = normalize_repo(r), normalize_path(p)
            keep.append(nr is not None and np_ is not None)
            repos.append(nr or "")
            paths.append(np_ or "")
        out = batch.drop_columns(["repo", "path"])
        out = out.append_column("repo", pa.array(repos, pa.string()))
        out = out.append_column("path", pa.array(paths, pa.string()))
        return out.filter(pa.array(keep))

    return ds.map_batches(norm, batch_format="pyarrow")


def _module_to_path(module: str, lang: str, src_dir: str) -> str:
    if lang == "python":
        return "src/" + module.replace(".", "/") + ".py"
    if lang == "java":
        return "src/" + module.replace(".", "/") + ".java"
    # javascript relative require
    mod = module
    if mod.startswith("./"):
        return f"{src_dir}/{mod[2:]}" + ("" if mod.endswith(".js") else ".js")
    return "src/" + mod.lstrip("/") + ("" if mod.endswith(".js") else ".js")


def extract_links(docs_ds, max_links: int = MAX_LINKS_PER_DOC):
    """documents (repo, path, commit, lang, content) -> link rows.

    Vectorized per batch with precompiled per-language regexes (compiled
    once at module import — the stateless-task analog of the stateful
    pattern cache)."""

    def links(batch: pa.Table) -> pa.Table:
        src_repo, src_path, src_commit, dst_url = [], [], [], []
        for repo, path, commit, lang, content in zip(
            batch["repo"].to_pylist(),
            batch["path"].to_pylist(),
            batch["commit"].to_pylist(),
            batch["lang"].to_pylist(),
            batch["content"].to_pylist(),
        ):
            pat = _IMPORT_RES.get(lang)
            if pat is None or not content:
                continue
            src_dir = path.rsplit("/", 1)[0] if "/" in path else ""
            seen = set()
            for m in pat.findall(content):
                if len(seen) >= max_links:
                    break
                target = _module_to_path(m, lang, src_dir)
                url = f"repo://{repo}/{target}"
                if url in seen:
                    continue
                seen.add(url)
                src_repo.append(repo)
                src_path.append(path)
                src_commit.append(commit)
                dst_url.append(url)
        return pa.table(
            {
                "src_repo": pa.array(src_repo, pa.string()),
                "src_path": pa.array(src_path, pa.string()),
                "src_commit": pa.array(src_commit, pa.string()),
                "dst_url": pa.array(dst_url, pa.string()),
            }
        )

    return docs_ds.map_batches(links, batch_format="pyarrow")
