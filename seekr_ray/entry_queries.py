"""Driver-contract query implementations (``__ray_entry__.queries``).

Each function takes ``sf_dir`` (a /root/testdata/sf* directory) and
returns a pyarrow Table / pandas DataFrame / Ray Dataset.  The functions
with DuckDB oracles (``__ray_entry__.oracle_sql``) use the *simplified
shared tokenization* of extras/textstats.py so both sides are
expressible exactly; the fully-faithful reference path (Porter stemming,
section weights, WAND, phrase walk) is covered by the pytest oracle
(tests/test_rank_identity.py) and by the rows-only corpus_* entries here.

Float outputs are rounded to 6dp on BOTH sides and every LIMIT has a full
tie-break so the driver's value-hash compare is deterministic.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .extras.textstats import (
    LANGID_THRESHOLD,
    round6,
    round6_arr,
    doc_fingerprints,
    doc_token_counts,
    langid_heuristic,
    quality_stats,
    simple_tokens,
    token_count_by_lang,
)

SEARCH_TERMS = ["spark", "join", "merge"]  # fixed scoring query, present in documents
SUGGEST_PREFIX = "s"
BOOL_TERM_A, BOOL_TERM_B = "spark", "window"
PHRASE_W1, PHRASE_W2 = "batch", "stream"
ANN_K = 10
NEARDUP_LIMIT = 300
# calibrated to the driver's random-embedding fixture so the entry is
# NON-trivial (41-97 pairs at sf0.01/sf0.001; round 1 used 0.9 and
# green-checked an empty result).  Both sides compare on the 6dp-rounded
# cosine, and the nearest pair sits >2e-4 from the boundary at sf0.01, so
# matmul-vs-sequential FP order cannot flip membership.
NEARDUP_THRESHOLD = 0.38
# n-gram Jaccard near-dup: trigram shingles; at 0.5 the entry catches the
# fixture's built-in near-dup band (~25 pairs at sf0.01, jaccard ≥ 0.9)
# while the unrelated-doc background (≤ 0.09) stays far from the boundary.
NGRAM_K = 3
NGRAM_JACCARD_THRESHOLD = 0.5


def _docs(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"))


def _docs_text(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )


# ---------------------------------------------------------------------------
# SQL-oracled operators
# ---------------------------------------------------------------------------


def q_doc_token_counts(sf_dir: str):
    return doc_token_counts(_docs_text(sf_dir))


def q_token_count_by_lang(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "lang"]
    )
    out = token_count_by_lang(ds)
    return out.map_batches(
        lambda b: b.rename_columns(["lang", "n_tokens"]), batch_format="pyarrow"
    )


def q_quality_stats(sf_dir: str):
    return quality_stats(_docs_text(sf_dir))


def q_langid(sf_dir: str):
    return langid_heuristic(_docs_text(sf_dir))


def _df_and_n(sf_dir: str, terms: list[str] | None = None, with_len: bool = False):
    """df per term (optionally restricted) + N (+ total token count when
    ``with_len``, for BM25's avgdl), via per-batch partials."""

    def partial(batch: pa.Table) -> pa.Table:
        acc: dict[str, int] = {}
        n = 0
        total_len = 0
        for t in batch["text"].to_pylist():
            n += 1
            toks = simple_tokens(t or "")
            total_len += len(toks)
            for term in set(toks):
                if terms is None or term in terms:
                    acc[term] = acc.get(term, 0) + 1
        acc["\x00N"] = n
        acc["\x00L"] = total_len
        return pa.table(
            {
                "term": pa.array(list(acc.keys()), pa.string()),
                "c": pa.array(list(acc.values()), pa.int64()),
            }
        )

    from .bucket_agg import bucketed_group_agg

    agg = bucketed_group_agg(
        _docs_text(sf_dir).map_batches(partial, batch_format="pyarrow"),
        "term",
        [("c", "sum")],
    ).to_pandas()
    dfs = dict(zip(agg["term"], agg["sum(c)"]))
    n = int(dfs.pop("\x00N"))
    total_len = int(dfs.pop("\x00L"))
    if with_len:
        return dfs, n, total_len
    return dfs, n


def q_term_df_idf(sf_dir: str):
    """(term, df, idf) over all documents — A2/A3/A4 with log10."""
    dfs, n = _df_and_n(sf_dir)
    terms = sorted(dfs)
    return pa.table(
        {
            "term": pa.array(terms, pa.string()),
            "df": pa.array([int(dfs[t]) for t in terms], pa.int64()),
            "idf": pa.array(
                [round6(math.log10(n / dfs[t])) for t in terms], pa.float64()
            ),
        }
    )


def q_term_tf(sf_dir: str):
    """(doc_id, term, tf) for the fixed SEARCH_TERMS — the tf formula
    count/len over the shared tokenization."""
    wanted = set(SEARCH_TERMS)

    def tf(batch: pa.Table) -> pa.Table:
        out_d, out_t, out_f = [], [], []
        for d, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            toks = simple_tokens(text or "")
            if not toks:
                continue
            n = len(toks)
            for term in SEARCH_TERMS:
                c = toks.count(term)
                if c:
                    out_d.append(d)
                    out_t.append(term)
                    out_f.append(round6(c / n))
        return pa.table(
            {
                "doc_id": pa.array(out_d, pa.int64()),
                "term": pa.array(out_t, pa.string()),
                "tf": pa.array(out_f, pa.float64()),
            }
        )

    return _docs_text(sf_dir).map_batches(tf, batch_format="pyarrow")


def q_search_tfidf_topk(sf_dir: str):
    """Top-20 docs for the fixed query by 0.7*Σ tf·idf (K1 sort + J2
    lookup shape, no stemming).  Fixed term order in the FP sum so the
    oracle adds in the same order."""
    dfs, n = _df_and_n(sf_dir, terms=set(SEARCH_TERMS))
    idf = {t: math.log10(n / dfs[t]) for t in SEARCH_TERMS if t in dfs}
    import ray

    idf_ref = ray.put(idf)

    def score(batch: pa.Table) -> pa.Table:
        idf_map = ray.get(idf_ref)
        out_d, out_s = [], []
        for d, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            toks = simple_tokens(text or "")
            if not toks:
                continue
            n = len(toks)
            s = 0.0
            hit = False
            for term in SEARCH_TERMS:
                idf_t = idf_map.get(term)
                if idf_t is not None:
                    c = toks.count(term)
                    s += (c / n) * idf_t
                    if c:
                        hit = True
            if hit:
                out_d.append(d)
                out_s.append(0.7 * s)
        return pa.table(
            {
                "doc_id": pa.array(out_d, pa.int64()),
                "score_raw": pa.array(out_s, pa.float64()),
            }
        )

    scored = _docs_text(sf_dir).map_batches(score, batch_format="pyarrow")
    top = scored.sort(["score_raw", "doc_id"], descending=[True, False]).limit(20)
    tbl = top.to_pandas()
    return pa.table(
        {
            "doc_id": pa.array(tbl["doc_id"], pa.int64()),
            "score": pa.array(
                [round6(s) for s in tbl["score_raw"]], pa.float64()
            ),
        }
    )


def q_exact_dedup(sf_dir: str):
    from .extras.dedup import exact_dedup_groups

    return exact_dedup_groups(_docs_text(sf_dir))


def q_ngram_jaccard(sf_dir: str):
    """Exact trigram-shingle Jaccard near-dup pairs over documents
    (distributed block-pair; the verify kernel of the MinHash pipeline as
    a first-class operator)."""
    from .extras.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _docs_text(sf_dir), k=NGRAM_K, threshold=NGRAM_JACCARD_THRESHOLD
    )


PAGERANK_FIXED_ITERS = 4
PAGERANK_FIXED_DAMPING = 0.85


def q_pagerank_lineitem(sf_dir: str):
    """Fixed-iteration PageRank (A5's oracle-comparable form: exactly K
    synchronous steps instead of ε-convergence) over the lineitem
    order→part bipartite graph.  Node ids: 2·l_orderkey for orders,
    2·l_partkey+1 for parts (disjoint id spaces)."""
    import ray.data as rd

    from .graph.pagerank import dedup_edges, pagerank_fixed_iters

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey"],
    )

    def to_edges(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(ok * 2, pa.int64()),
                "dst": pa.array(pk * 2 + 1, pa.int64()),
            }
        )

    edges = dedup_edges(ds.map_batches(to_edges, batch_format="pyarrow"))
    tbl = pagerank_fixed_iters(
        edges, damping=PAGERANK_FIXED_DAMPING, n_iters=PAGERANK_FIXED_ITERS
    )
    pr = tbl["page_rank"].to_numpy(zero_copy_only=False)
    pr6 = np.copysign(np.floor(np.abs(pr) * 1e6 + 0.5), pr) / 1e6
    return pa.table(
        {"node": tbl["node"], "page_rank": pa.array(pr6, pa.float64())}
    )


def q_pagerank_weighted(sf_dir: str):
    """Edge-weighted PageRank over the order→part graph, weight =
    summed quantity per (order, part): transition mass w_e / W_src
    instead of 1/outdeg.  Same fixed-K synchronous discipline as
    pagerank_lineitem; integer weights aggregate exactly before the
    float iteration."""
    import ray.data as rd

    from .graph.wpagerank import wpagerank_fixed_iters

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey", "l_quantity"],
    )

    def to_edges(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        q = np.rint(
            batch["l_quantity"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        tbl = pa.table(
            {
                "src": pa.array(ok * 2, pa.int64()),
                "dst": pa.array(pk * 2 + 1, pa.int64()),
                "w": pa.array(q, pa.int64()),
            }
        )
        agg = tbl.group_by(["src", "dst"]).aggregate([("w", "sum")])
        return agg.rename_columns(["src", "dst", "w"])

    edges = (
        ds.map_batches(to_edges, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .sum("w")
        .map_batches(
            lambda b: pa.table(
                {
                    "src": b["src"],
                    "dst": b["dst"],
                    "w": pc.cast(b["sum(w)"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )
    tbl = wpagerank_fixed_iters(
        edges, damping=PAGERANK_FIXED_DAMPING, n_iters=PAGERANK_FIXED_ITERS
    )
    pr = tbl["page_rank"].to_numpy(zero_copy_only=False)
    pr6 = np.copysign(np.floor(np.abs(pr) * 1e6 + 0.5), pr) / 1e6
    return pa.table(
        {"node": tbl["node"], "page_rank": pa.array(pr6, pa.float64())}
    )


def _pagerank_weighted_sql(k: int, d: float) -> str:
    """Unrolled K-iteration WEIGHTED PageRank (w_e / W_src transition),
    mirroring _wpagerank_numpy's float order per term."""
    parts = [
        """WITH edges AS MATERIALIZED (
  SELECT l_orderkey * 2 AS src, l_partkey * 2 + 1 AS dst,
         sum(round(l_quantity)::BIGINT)::BIGINT AS w
  FROM lineitem GROUP BY 1, 2
),
nodes AS MATERIALIZED (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
outw AS MATERIALIZED (SELECT src AS node, sum(w)::DOUBLE AS wsum FROM edges GROUP BY src),
nc AS (SELECT count(*)::DOUBLE AS n FROM nodes),
r0 AS MATERIALIZED (SELECT node, 1.0 / (SELECT n FROM nc) AS pr FROM nodes)"""
    ]
    for i in range(1, k + 1):
        parts.append(
            f""",
d{i - 1} AS (SELECT coalesce(sum(r.pr), 0) AS dm
  FROM r{i - 1} r LEFT JOIN outw o ON r.node = o.node WHERE o.node IS NULL),
r{i} AS MATERIALIZED (
  SELECT n.node,
         (1 - {d}) / (SELECT n FROM nc)
         + {d} * coalesce(c.contrib, 0)
         + {d} * (SELECT dm FROM d{i - 1}) / (SELECT n FROM nc) AS pr
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, sum(r.pr * (e.w / o.wsum)) AS contrib
    FROM edges e JOIN r{i - 1} r ON r.node = e.src JOIN outw o ON o.node = e.src
    GROUP BY e.dst) c ON c.node = n.node
)"""
        )
    parts.append(f"\nSELECT node, round(pr, 6) AS page_rank FROM r{k}")
    return "".join(parts)


HITS_FIXED_ITERS = 4


def q_hits_lineitem(sf_dir: str):
    """Fixed-iteration L1-normalized HITS over the same order→part
    bipartite graph as pagerank_lineitem: orders are pure hubs, parts
    pure authorities; (node, hub, authority), 6dp half-away rounding
    mirroring the SQL oracle's round()."""
    import ray.data as rd

    from .graph.hits import hits_fixed_iters
    from .graph.pagerank import dedup_edges

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey"],
    )

    def to_edges(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(ok * 2, pa.int64()),
                "dst": pa.array(pk * 2 + 1, pa.int64()),
            }
        )

    edges = dedup_edges(ds.map_batches(to_edges, batch_format="pyarrow"))
    tbl = hits_fixed_iters(edges, n_iters=HITS_FIXED_ITERS)

    def r6(col: str) -> pa.Array:
        v = tbl[col].to_numpy(zero_copy_only=False)
        return pa.array(
            np.copysign(np.floor(np.abs(v) * 1e6 + 0.5), v) / 1e6,
            pa.float64(),
        )

    return pa.table(
        {"node": tbl["node"], "hub": r6("hub"), "authority": r6("authority")}
    )


def _hits_lineitem_sql(k: int) -> str:
    """Unrolled K-iteration L1-normalized HITS (MATERIALIZED per step,
    the _pagerank_lineitem_sql discipline)."""
    parts = [
        """WITH edges AS MATERIALIZED (
  SELECT DISTINCT l_orderkey * 2 AS src, l_partkey * 2 + 1 AS dst FROM lineitem
),
nodes AS MATERIALIZED (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
nc AS (SELECT count(*)::DOUBLE AS n FROM nodes),
h0 AS MATERIALIZED (SELECT node, 1.0 / (SELECT n FROM nc) AS s FROM nodes)"""
    ]
    for i in range(1, k + 1):
        parts.append(
            f""",
ar{i} AS MATERIALIZED (
  SELECT n.node, coalesce(c.v, 0) AS v
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, sum(h.s) AS v
    FROM edges e JOIN h{i - 1} h ON h.node = e.src
    GROUP BY e.dst) c ON c.node = n.node),
a{i} AS MATERIALIZED (
  SELECT node, v / (SELECT sum(v) FROM ar{i}) AS s FROM ar{i}),
hr{i} AS MATERIALIZED (
  SELECT n.node, coalesce(c.v, 0) AS v
  FROM nodes n LEFT JOIN (
    SELECT e.src AS node, sum(a.s) AS v
    FROM edges e JOIN a{i} a ON a.node = e.dst
    GROUP BY e.src) c ON c.node = n.node),
h{i} AS MATERIALIZED (
  SELECT node, v / (SELECT sum(v) FROM hr{i}) AS s FROM hr{i})"""
        )
    parts.append(
        f"""
SELECT h{k}.node, round(h{k}.s, 6) AS hub, round(a{k}.s, 6) AS authority
FROM h{k} JOIN a{k} ON a{k}.node = h{k}.node"""
    )
    return "".join(parts)


PPR_SEEDS_MOD = 16


def q_ppr_lineitem(sf_dir: str):
    """Personalized PageRank (restart on the deterministic seed set
    node % 16 == 1) over the same order→part bipartite graph — the
    local-relevance / recommendation variant of pagerank_lineitem; both
    driver-numpy and distributed paths run the identical seeded update
    (asserted equal by pytest)."""
    import ray.data as rd

    from .graph.pagerank import dedup_edges, personalized_pagerank_fixed_iters

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey"],
    )

    def to_edges(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(ok * 2, pa.int64()),
                "dst": pa.array(pk * 2 + 1, pa.int64()),
            }
        )

    edges = dedup_edges(ds.map_batches(to_edges, batch_format="pyarrow"))
    tbl = personalized_pagerank_fixed_iters(
        edges,
        seeds_mod=PPR_SEEDS_MOD,
        damping=PAGERANK_FIXED_DAMPING,
        n_iters=PAGERANK_FIXED_ITERS,
    )
    pr = tbl["ppr"].to_numpy(zero_copy_only=False)
    pr6 = np.copysign(np.floor(np.abs(pr) * 1e6 + 0.5), pr) / 1e6
    return pa.table({"node": tbl["node"], "ppr": pa.array(pr6, pa.float64())})


def _ppr_lineitem_sql(k: int, d: float, m: int) -> str:
    """Unrolled K-iteration PERSONALIZED PageRank: the teleport terms
    land only on the seed rows (CASE), mirroring _pagerank_numpy's
    seeded update expression-for-expression."""
    parts = [
        f"""WITH edges AS MATERIALIZED (
  SELECT DISTINCT l_orderkey * 2 AS src, l_partkey * 2 + 1 AS dst FROM lineitem
),
nodes AS MATERIALIZED (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
outdeg AS MATERIALIZED (SELECT src AS node, count(*)::DOUBLE AS deg FROM edges GROUP BY src),
sc AS (SELECT count(*)::DOUBLE AS s FROM nodes WHERE node % {m} = 1),
r0 AS MATERIALIZED (SELECT node,
        CASE WHEN node % {m} = 1 THEN 1.0 / (SELECT s FROM sc) ELSE 0.0 END AS pr
      FROM nodes)"""
    ]
    for i in range(1, k + 1):
        parts.append(
            f""",
d{i - 1} AS (SELECT coalesce(sum(r.pr), 0) AS dm
  FROM r{i - 1} r LEFT JOIN outdeg o ON r.node = o.node WHERE o.node IS NULL),
r{i} AS MATERIALIZED (
  SELECT n.node,
         {d} * coalesce(c.contrib, 0)
         + CASE WHEN n.node % {m} = 1
                THEN (1 - {d}) / (SELECT s FROM sc)
                     + {d} * (SELECT dm FROM d{i - 1}) / (SELECT s FROM sc)
                ELSE 0.0 END AS pr
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, sum(r.pr / o.deg) AS contrib
    FROM edges e JOIN r{i - 1} r ON r.node = e.src JOIN outdeg o ON o.node = e.src
    GROUP BY e.dst) c ON c.node = n.node
)"""
        )
    parts.append(f"\nSELECT node, round(pr, 6) AS ppr FROM r{k}")
    return "".join(parts)


def _pagerank_lineitem_sql(k: int, d: float) -> str:
    """Unrolled K-iteration PageRank in plain SQL (MATERIALIZED per step
    so CTE inlining stays linear in K)."""
    parts = [
        """WITH edges AS MATERIALIZED (
  SELECT DISTINCT l_orderkey * 2 AS src, l_partkey * 2 + 1 AS dst FROM lineitem
),
nodes AS MATERIALIZED (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
outdeg AS MATERIALIZED (SELECT src AS node, count(*)::DOUBLE AS deg FROM edges GROUP BY src),
nc AS (SELECT count(*)::DOUBLE AS n FROM nodes),
r0 AS MATERIALIZED (SELECT node, 1.0 / (SELECT n FROM nc) AS pr FROM nodes)"""
    ]
    for i in range(1, k + 1):
        parts.append(
            f""",
d{i - 1} AS (SELECT coalesce(sum(r.pr), 0) AS dm
  FROM r{i - 1} r LEFT JOIN outdeg o ON r.node = o.node WHERE o.node IS NULL),
r{i} AS MATERIALIZED (
  SELECT n.node,
         (1 - {d}) / (SELECT n FROM nc)
         + {d} * coalesce(c.contrib, 0)
         + {d} * (SELECT dm FROM d{i - 1}) / (SELECT n FROM nc) AS pr
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, sum(r.pr / o.deg) AS contrib
    FROM edges e JOIN r{i - 1} r ON r.node = e.src JOIN outdeg o ON o.node = e.src
    GROUP BY e.dst) c ON c.node = n.node
)"""
        )
    parts.append(f"\nSELECT node, round(pr, 6) AS page_rank FROM r{k}")
    return "".join(parts)


def _corpus_pagerank_chain(k: int, d: float, eps: float) -> str:
    """ε-convergence PageRank replay over the EXPORTED corpus links +
    id assignment (see ``_export_oracle_input``): K unrolled synchronous
    steps, each carrying its max-|Δ| vs the previous step, and the final
    ``prtbl`` takes the FIRST step whose delta is <= eps — exactly the
    numpy loop's stopping rule (``graph/pagerank.py::_pagerank_numpy``
    returns the NEW vector of the converged step).  K bounds convergence
    with ~2x headroom (measured 21-23 iterations at all three fixture
    scales).  Returns the WITH-chain up through
    ``prtbl AS (node, pr)`` so the search-scoring oracles can extend it
    with their own CTEs."""
    parts = [
        f"""WITH docs AS MATERIALIZED (
  SELECT doc_id, url FROM read_parquet('{ORACLE_EXPORT_DIR}/corpus_docs.parquet')
),
links AS (
  SELECT 'repo://' || src_repo || '/' || src_path AS src_url, dst_url
  FROM read_parquet('{ORACLE_EXPORT_DIR}/corpus_links.parquet')
),
edges AS MATERIALIZED (
  SELECT DISTINCT s.doc_id AS src, t.doc_id AS dst
  FROM links l JOIN docs s ON s.url = l.src_url
  JOIN docs t ON t.url = l.dst_url
),
nodes AS MATERIALIZED (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
outdeg AS MATERIALIZED (SELECT src AS node, count(*)::DOUBLE AS deg FROM edges GROUP BY src),
nc AS (SELECT count(*)::DOUBLE AS n FROM nodes),
r0 AS MATERIALIZED (SELECT node, 1.0 / (SELECT n FROM nc) AS pr FROM nodes)"""
    ]
    for i in range(1, k + 1):
        parts.append(
            f""",
d{i - 1} AS (SELECT coalesce(sum(r.pr), 0) AS dm
  FROM r{i - 1} r LEFT JOIN outdeg o ON r.node = o.node WHERE o.node IS NULL),
r{i} AS MATERIALIZED (
  SELECT n.node,
         (1 - {d}) / (SELECT n FROM nc)
         + {d} * coalesce(c.contrib, 0)
         + {d} * (SELECT dm FROM d{i - 1}) / (SELECT n FROM nc) AS pr
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, sum(r.pr / o.deg) AS contrib
    FROM edges e JOIN r{i - 1} r ON r.node = e.src JOIN outdeg o ON o.node = e.src
    GROUP BY e.dst) c ON c.node = n.node
),
x{i} AS MATERIALIZED (
  SELECT {i} AS step, a.node, a.pr,
         (SELECT max(abs(p.pr - q.pr))
          FROM r{i} p JOIN r{i - 1} q ON p.node = q.node) AS delta
  FROM r{i} a
)"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT * FROM x{i}" for i in range(1, k + 1)
    )
    parts.append(
        f""",
allsteps AS MATERIALIZED ({union}),
stop AS (SELECT min(step) AS s FROM allsteps WHERE delta <= {eps}),
prtbl AS MATERIALIZED (
  SELECT node, pr FROM allsteps WHERE step = (SELECT s FROM stop)
)"""
    )
    return "".join(parts)


def _corpus_pagerank_sql(k: int, d: float, eps: float) -> str:
    return (
        _corpus_pagerank_chain(k, d, eps)
        + "\nSELECT node AS doc_id, round(pr, 6) AS page_rank FROM prtbl"
    )


def _corpus_scoring_ctes(
    w_tfidf: float, w_pr: float, k1: float, b: float
) -> str:
    """Shared scoring CTEs over the EXPORTED per-stem postings, doclen
    sidecar and query->stem map: df/idf recomputed from the postings
    themselves (idf = log10(N/df), N = exported doc count), BM25 raw
    counts recovered as round(tf*dl) (round(tf) where dl=0 — the
    unnormalized-tf guard), pagerank from the independent replay chain,
    ranking under (score DESC, doc_id ASC) for BOTH scorers.  The cut
    line: query tokenization/Porter stemming and the postings DECODE
    are taken from the export (both pytest-pinned — Porter goldens,
    codec round-trips, vectorized≡scalar tokenize); every aggregation
    and scoring step downstream is recomputed by DuckDB."""
    return f""",
postings AS MATERIALIZED (
  SELECT stem, doc_id, tf
  FROM read_parquet('{ORACLE_EXPORT_DIR}/corpus_postings.parquet')
),
dl AS MATERIALIZED (
  SELECT doc_id, doclen
  FROM read_parquet('{ORACLE_EXPORT_DIR}/corpus_doclen.parquet')
),
qs AS (
  SELECT query_id, stem
  FROM read_parquet('{ORACLE_EXPORT_DIR}/corpus_queries.parquet')
),
nstat AS (SELECT count(*)::DOUBLE AS n FROM docs),
avgdl AS (
  SELECT CASE WHEN count(*) > 0 AND sum(doclen) > 0
              THEN sum(doclen)::DOUBLE / count(*) ELSE 1.0 END AS a
  FROM dl
),
tstats AS (SELECT stem, count(*)::DOUBLE AS df FROM postings GROUP BY stem),
contrib AS MATERIALIZED (
  SELECT p.stem, p.doc_id,
         log10((SELECT n FROM nstat) / t.df)
         * (c * ({k1} + 1.0))
         / (c + {k1} * (1.0 - {b} + {b} * dlv / (SELECT a FROM avgdl))) AS bc,
         p.tf * log10((SELECT n FROM nstat) / t.df) AS tc
  FROM (
    SELECT p.stem, p.doc_id, p.tf,
           CASE WHEN coalesce(d.doclen, 0) > 0
                THEN round(p.tf * d.doclen, 0)
                ELSE round(p.tf, 0) END AS c,
           coalesce(d.doclen, 0)::DOUBLE AS dlv
    FROM postings p LEFT JOIN dl d ON d.doc_id = p.doc_id
  ) p JOIN tstats t USING (stem)
),
scored AS MATERIALIZED (
  SELECT q.query_id, p.doc_id,
         {w_tfidf} * sum(p.bc) + {w_pr} * coalesce(any_value(pr.pr), 0)
           AS score_bm25,
         {w_tfidf} * sum(p.tc) + {w_pr} * coalesce(any_value(pr.pr), 0)
           AS score_tfidf
  FROM qs q JOIN contrib p ON p.stem = q.stem
  LEFT JOIN prtbl pr ON pr.node = p.doc_id
  GROUP BY q.query_id, p.doc_id
),
ranked_bm25 AS MATERIALIZED (
  SELECT query_id, doc_id, score_bm25 AS score,
         row_number() OVER (
           PARTITION BY query_id ORDER BY score_bm25 DESC, doc_id
         ) AS rnk
  FROM scored
),
ranked_tfidf AS MATERIALIZED (
  SELECT query_id, doc_id, score_tfidf AS score,
         row_number() OVER (
           PARTITION BY query_id ORDER BY score_tfidf DESC, doc_id
         ) AS rnk
  FROM scored
)"""


def _corpus_bm25_sql(
    k: int, d: float, eps: float, topk: int, w_tfidf: float, w_pr: float,
    k1: float, b: float,
) -> str:
    return (
        _corpus_pagerank_chain(k, d, eps)
        + _corpus_scoring_ctes(w_tfidf, w_pr, k1, b)
        + f"""
SELECT query_id, (rnk - 1)::INT AS rank, doc_id, round(score, 6) AS score
FROM ranked_bm25 WHERE rnk <= {topk}"""
    )


def _corpus_rank_agreement_sql(
    k: int, d: float, eps: float, depth: int, p: float,
    w_tfidf: float, w_pr: float, k1: float, b: float,
) -> str:
    """RBO@depth between the tfidf and bm25 rankings, both recomputed by
    the shared scoring CTEs: rbo = (1-p) * Σ_i p^(i-1) * |A_i ∩ B_i| / i
    with A_i/B_i the depth-i prefixes; queries with no scored docs emit
    (overlap10 0, rbo 0) like the engine loop."""
    return (
        _corpus_pagerank_chain(k, d, eps)
        + _corpus_scoring_ctes(w_tfidf, w_pr, k1, b)
        + f""",
qids AS (SELECT DISTINCT query_id FROM qs),
a AS (SELECT query_id, doc_id, rnk FROM ranked_tfidf WHERE rnk <= {depth}),
bq AS (SELECT query_id, doc_id, rnk FROM ranked_bm25 WHERE rnk <= {depth}),
depths AS (SELECT unnest(generate_series(1, {depth})) AS i),
ov AS (
  SELECT a.query_id, d.i, count(*)::DOUBLE AS o
  FROM a JOIN bq ON a.query_id = bq.query_id AND a.doc_id = bq.doc_id
  JOIN depths d ON a.rnk <= d.i AND bq.rnk <= d.i
  GROUP BY a.query_id, d.i
),
rbo AS (
  SELECT query_id,
         (1.0 - {p}) * sum(pow({p}, i - 1) * o / i) AS r
  FROM ov GROUP BY query_id
),
ov10 AS (
  SELECT a.query_id, count(*)::BIGINT AS o10
  FROM a JOIN bq ON a.query_id = bq.query_id AND a.doc_id = bq.doc_id
  GROUP BY a.query_id
)
SELECT q.query_id,
       coalesce(o.o10, 0) AS overlap10,
       round(coalesce(r.r, 0.0), 6) AS rbo
FROM qids q
LEFT JOIN ov10 o ON o.query_id = q.query_id
LEFT JOIN rbo r ON r.query_id = q.query_id"""
    )


def _phrase_match_ctes(tag: str, stems: list[str], gap: int) -> tuple[str, str]:
    """CTE chain deciding one phrase's matched-doc set from the exported
    position lists — the reference ``checkSequentialPositions`` walk
    (pytest-pinned equal to ``_phrase_walk_vectorized``): per start
    position of word 0, each later word ENTERS at its first position >
    cursor (required <= cursor+gap, non-strict) and the cursor SLIDES to
    the end of the strict-delta run containing the entry (runs split
    where a consecutive delta reaches gap).  Single-word phrases reduce
    to stem membership."""
    name = f"m_{tag}"
    if len(stems) == 1:
        return (
            f",\n{name} AS (SELECT DISTINCT doc_id FROM contrib "
            f"WHERE stem = '{stems[0]}')",
            name,
        )
    txt: list[str] = []
    for i, s in enumerate(stems):
        txt.append(
            f",\npp_{tag}_{i} AS (SELECT doc_id, pos FROM positions "
            f"WHERE stem = '{s}')"
        )
        if i >= 1:
            txt.append(
                f""",
rr_{tag}_{i} AS (
  SELECT doc_id, pos, max(pos) OVER (PARTITION BY doc_id, grp) AS run_end
  FROM (
    SELECT doc_id, pos,
           sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS UNBOUNDED PRECEDING) AS grp
    FROM (
      SELECT doc_id, pos,
             CASE WHEN pos >= lag(pos) OVER (
                    PARTITION BY doc_id ORDER BY pos) + {gap}
                  THEN 1 ELSE 0 END AS brk
      FROM pp_{tag}_{i}))
)"""
            )
    txt.append(
        f",\nst_{tag}_0 AS (SELECT doc_id, pos AS p0, pos AS cur "
        f"FROM pp_{tag}_0)"
    )
    for i in range(1, len(stems)):
        txt.append(
            f""",
en_{tag}_{i} AS (
  SELECT s.doc_id, s.p0, s.cur, min(r.pos) AS ent
  FROM st_{tag}_{i - 1} s JOIN rr_{tag}_{i} r
    ON r.doc_id = s.doc_id AND r.pos > s.cur
  GROUP BY s.doc_id, s.p0, s.cur
  HAVING min(r.pos) <= s.cur + {gap}
),
st_{tag}_{i} AS (
  SELECT e.doc_id, e.p0, r.run_end AS cur
  FROM en_{tag}_{i} e JOIN rr_{tag}_{i} r
    ON r.doc_id = e.doc_id AND r.pos = e.ent
)"""
        )
    txt.append(
        f",\n{name} AS (SELECT DISTINCT doc_id "
        f"FROM st_{tag}_{len(stems) - 1})"
    )
    return ("".join(txt), name)


def _corpus_search_sql(
    k: int, d: float, eps: float, topk: int, w_tfidf: float, w_pr: float,
    k1: float, b: float, gap: int = 3,
) -> str:
    """Full-query-set search replay: per QUERY_SET entry a generated
    fragment with the engine's OWN routing baked in at SQL-build time
    (same parser calls: operator precedence, 2-part split or malformed
    fallthrough, quote detection, Porter stems — the pytest-pinned cut
    line), scoring recomputed from exported postings: plain = sum of
    tf·idf contribs over the stem-union docs; boolean = set algebra on
    component candidate sets with LEFT-only wordInfo scoring for AND/NOT
    (B1) and both-side scoring over the union for OR (operand stem sets
    are asserted disjoint, so the right-overwrite merge (B2) is the
    identity); phrase = the position-walk matched set, scored over its
    stems.  Ranking under (score DESC, doc_id ASC), 6dp pinning."""
    plans = _query_set_plans()
    ctes: list[str] = []
    frags: list[str] = []

    def score_frag(qid: str, stems: list[str], cand: str | None) -> str:
        # one contrib row per (stem, doc): a REPEATED stem would need
        # the reference's duplicate-double-count law (engine `mult`) —
        # fail loudly at SQL-build time if the query set ever grows one
        assert len(set(stems)) == len(stems), (qid, stems)
        lst = ", ".join(f"'{s}'" for s in stems)
        join = (
            f"JOIN {cand} kk ON kk.doc_id = c.doc_id\n  " if cand else ""
        )
        return f"""SELECT '{qid}' AS query_id, c.doc_id,
       {w_tfidf} * sum(c.tc) + {w_pr} * coalesce(any_value(p.pr), 0) AS score
FROM contrib c
  {join}LEFT JOIN prtbl p ON p.node = c.doc_id
WHERE c.stem IN ({lst})
GROUP BY c.doc_id"""

    def cand_plain(stems: list[str]) -> str:
        if not stems:
            return "SELECT doc_id FROM contrib WHERE 1 = 0"
        lst = ", ".join(f"'{s}'" for s in stems)
        return f"SELECT DISTINCT doc_id FROM contrib WHERE stem IN ({lst})"

    for qid, plan, _k in plans:
        kind, payload = plan
        if kind == "empty":
            continue
        if kind == "plain":
            if payload:
                frags.append(score_frag(qid, payload, None))
            continue
        if kind == "phrase":
            if not payload:
                continue
            assert len(set(payload)) == len(payload), qid
            cte, name = _phrase_match_ctes(qid, payload, gap)
            ctes.append(cte)
            frags.append(score_frag(qid, payload, name))
            continue
        op, (lkind, lstems), (rkind, rstems) = payload

        def side_cand(side: str, kindx: str, stemsx: list[str]) -> str:
            if kindx == "phrase" and stemsx:
                cte, name = _phrase_match_ctes(f"{qid}_{side}", stemsx, gap)
                ctes.append(cte)
                return f"SELECT doc_id FROM {name}"
            return cand_plain(stemsx if kindx == "plain" else [])

        lc = side_cand("l", lkind, lstems)
        rc = side_cand("r", rkind, rstems)
        if op == "AND":
            cand_sql, score_stems = f"{lc} INTERSECT {rc}", lstems
        elif op == "NOT":
            cand_sql, score_stems = f"{lc} EXCEPT {rc}", lstems
        else:
            # OR: right-overwrite merge (B2) is the identity when the
            # operand stem sets are disjoint — asserted so a future
            # query-set change fails loudly instead of silently
            assert not (set(lstems) & set(rstems)), qid
            assert lkind == rkind == "plain", qid
            cand_sql, score_stems = f"{lc} UNION {rc}", lstems + rstems
        if not score_stems:
            continue
        cname = f"cand_{qid}"
        ctes.append(f",\n{cname} AS ({cand_sql})")
        frags.append(score_frag(qid, score_stems, cname))

    union = "\nUNION ALL\n".join(frags)
    return (
        _corpus_pagerank_chain(k, d, eps)
        + _corpus_scoring_ctes(w_tfidf, w_pr, k1, b)
        + f""",
positions AS MATERIALIZED (
  SELECT stem, doc_id, pos
  FROM read_parquet('{ORACLE_EXPORT_DIR}/corpus_positions.parquet')
)"""
        + "".join(ctes)
        + f""",
allq AS ({union}),
rankedq AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id
         ) AS rnk
  FROM allq
)
SELECT query_id, (rnk - 1)::INT AS rank, doc_id, round(score, 6) AS score
FROM rankedq WHERE rnk <= {topk}"""
    )


def _sha64le_expr(hx: str) -> str:
    """First 8 bytes of a sha256 HEX column, little-endian, as HUGEINT —
    ``stable_hash_str`` rebuilt in SQL (byte i = hex pair 2i..2i+1,
    weighted 256^i)."""
    terms = []
    for i in range(8):
        hi = f"(strpos('0123456789abcdef', substr({hx}, {2 * i + 1}, 1)) - 1)"
        lo = f"(strpos('0123456789abcdef', substr({hx}, {2 * i + 2}, 1)) - 1)"
        terms.append(f"(({hi} * 16 + {lo})::HUGEINT * {256 ** i}::HUGEINT)")
    return "(" + " + ".join(terms) + ")"


def _segmeta_partition_cte(src: str, num_partitions: int) -> str:
    """Per-chunk rows with the partition RE-DERIVED from the term via
    the routing law: sha256 of the term (or term\\x00salt for salted
    chunks), first 8 bytes little-endian, mod P."""
    return f"""WITH seg AS (
  SELECT term, salt, n_docs,
         sha256(CASE WHEN salt = 0 THEN term
                     ELSE term || chr(0) || salt::VARCHAR END) AS hx
  FROM read_parquet('{ORACLE_EXPORT_DIR}/{src}')
),
hp AS (
  SELECT term, salt, n_docs,
         ({_sha64le_expr('hx')} % {num_partitions})::BIGINT AS part
  FROM seg
)"""


def _corpus_manifest_sql(num_partitions: int) -> str:
    return (
        _segmeta_partition_cte("corpus_segmeta.parquet", num_partitions)
        + """
SELECT part AS partition, count(DISTINCT term)::BIGINT AS n_terms,
       count(*)::BIGINT AS n_chunks, sum(n_docs)::BIGINT AS n_postings
FROM hp GROUP BY part ORDER BY part"""
    )


def _corpus_merge_parity_sql(num_partitions: int) -> str:
    return (
        _segmeta_partition_cte("corpus_segmeta.parquet", num_partitions)
        + """
SELECT part AS partition, count(DISTINCT term)::BIGINT AS n_terms,
       sum(n_docs)::BIGINT AS n_postings, TRUE AS parity
FROM hp GROUP BY part ORDER BY part"""
    )


def _bpe_merge_chain(k: int, top_v: int) -> str:
    """Unrolled replay of the BPE training loop (``extras/bpe.py``
    ``_merge_loop``) as SQL CTEs, appended after the shared ``toks``
    tokenization: words render as '(s)(y)(m)' strings (each symbol owns
    its delimiters, so DuckDB's left-to-right non-overlapping
    ``replace`` of '(l)(r)' -> '(lr)' applies a merge EXACTLY like the
    Python walk — shared-boundary separators would double-consume);
    each step counts adjacent pairs weighted by word freq, picks the
    (cnt DESC, (l, r) ASC) argmax — 'l r' concat with a space separator
    orders identically to the tuple because ' ' sorts below [a-z] — and
    rewrites the vocabulary.  Steps after pair exhaustion contribute no
    rows (empty argmax; the replace pattern falls back to an unmatchable
    chr(1)).  Ends with ``w{k}`` (final symbol sequences — for trained
    words this IS the rank-order encode) and ``merges``."""
    parts = [
        f""", wf AS (
  SELECT t AS word, count(*)::BIGINT AS freq
  FROM (SELECT unnest(tokens) AS t FROM toks) GROUP BY t
),
w0 AS MATERIALIZED (
  SELECT word, freq,
         array_to_string(list_transform(range(1, length(word) + 1),
                         i -> '(' || word[i] || ')'), '') AS seq
  FROM (SELECT word, freq FROM wf ORDER BY freq DESC, word LIMIT {top_v})
)"""
    ]
    for i in range(1, k + 1):
        parts.append(
            f""",
s{i} AS (SELECT string_split(trim(seq, '()'), ')(') AS s, freq FROM w{i - 1}),
p{i} AS (
  SELECT s[j] AS l, s[j + 1] AS r, sum(freq)::BIGINT AS cnt
  FROM s{i}, unnest(generate_series(1, len(s) - 1)) AS u(j)
  GROUP BY 1, 2
),
b{i} AS MATERIALIZED (
  SELECT l, r, cnt FROM p{i} ORDER BY cnt DESC, l || ' ' || r LIMIT 1
),
w{i} AS MATERIALIZED (
  SELECT word, freq,
         replace(seq,
                 coalesce((SELECT '(' || l || ')(' || r || ')' FROM b{i}), chr(1)),
                 coalesce((SELECT '(' || l || r || ')' FROM b{i}), chr(1))) AS seq
  FROM w{i - 1}
)"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT {i - 1}::BIGINT AS rank, l, r, cnt FROM b{i}"
        for i in range(1, k + 1)
    )
    parts.append(f""",
merges AS ({union})""")
    return "".join(parts)


CONTAINMENT_THRESHOLD = 0.8


def q_containment(sf_dir: str):
    """Directed shingle-containment pairs (|S(src) ∩ S(dst)| / |S(src)|
    >= t) — the asymmetric near-copy relation Jaccard misses (quotes,
    excerpts, templates)."""
    from .extras.dedup import containment_pairs

    return containment_pairs(
        _docs_text(sf_dir), k=NGRAM_K, threshold=CONTAINMENT_THRESHOLD
    )


def q_jaccard_clusters(sf_dir: str):
    """Connected components over the exact trigram-Jaccard pair graph
    (min-label propagation; cluster_id = min doc_id in component) —
    the clustering stage of the dedup family with a recursive-CTE SQL
    oracle."""
    from .extras.dedup import jaccard_clusters

    return jaccard_clusters(
        _docs_text(sf_dir), k=NGRAM_K, threshold=NGRAM_JACCARD_THRESHOLD
    )


def _doc_ids_with_term(sf_dir: str, term: str) -> set[int]:
    out = set()
    for b in _docs_text(sf_dir).iter_batches(batch_format="pyarrow"):
        for d, t in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            if term in simple_tokens(t or ""):
                out.add(d)
    return out


def _ids_table(ids) -> pa.Table:
    return pa.table({"doc_id": pa.array(sorted(ids), pa.int64())})


def q_bool_and(sf_dir: str):
    a = _doc_ids_with_term(sf_dir, BOOL_TERM_A)
    b = _doc_ids_with_term(sf_dir, BOOL_TERM_B)
    return _ids_table(a & b)


def q_bool_or(sf_dir: str):
    a = _doc_ids_with_term(sf_dir, BOOL_TERM_A)
    b = _doc_ids_with_term(sf_dir, BOOL_TERM_B)
    return _ids_table(a | b)


def q_bool_not(sf_dir: str):
    a = _doc_ids_with_term(sf_dir, BOOL_TERM_A)
    b = _doc_ids_with_term(sf_dir, BOOL_TERM_B)
    return _ids_table(a - b)


def q_phrase_match(sf_dir: str):
    """Docs where PHRASE_W2 follows PHRASE_W1 within the MAX_GAP=3 window
    over filtered-token positions (the 2-word phrase walk reduces to an
    exists-in-(p, p+3] check, QueryIndex.java:341-395)."""

    def match(batch: pa.Table) -> pa.Table:
        out = []
        for d, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            toks = simple_tokens(text or "")
            p1 = [i for i, t in enumerate(toks) if t == PHRASE_W1]
            p2 = [i for i, t in enumerate(toks) if t == PHRASE_W2]
            if any(a < b <= a + 3 for a in p1 for b in p2):
                out.append(d)
        return pa.table({"doc_id": pa.array(out, pa.int64())})

    return _docs_text(sf_dir).map_batches(match, batch_format="pyarrow")


def q_suggestions(sf_dir: str):
    """K3 prefix-suggestion ranking over the distinct term vocabulary."""
    dfs, _ = _df_and_n(sf_dir)
    matches = [t for t in dfs if t.startswith(SUGGEST_PREFIX)]
    matches.sort(
        key=lambda w: (
            1 if w == SUGGEST_PREFIX else 2 if w.startswith(SUGGEST_PREFIX + " ") else 3,
            w,
        )
    )
    return pa.table({"term": pa.array(matches[:5], pa.string())})


def q_events_recent_counts(sf_dir: str):
    """S10/A7 analog: rows within 12h of the max event ts, counted per
    event_type (batch-time stand-in for the reference's now()-12h)."""
    import ray.data as rd
    import pyarrow.compute as pc
    from datetime import timedelta

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "event_type"]
    )
    max_ts = ds.max("ts")
    cutoff = max_ts - timedelta(hours=12)

    def recent(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch["ts"], pa.scalar(cutoff)))

    out = (
        ds.map_batches(recent, batch_format="pyarrow")
        .groupby("event_type")
        .count()
    )
    return out.map_batches(
        lambda b: b.rename_columns(["event_type", "n"]), batch_format="pyarrow"
    )


QLOG_PREFIXES = ["c", "e", "p", "s", "v", "cl", "si", "purchase", "view u1"]


def q_query_log_suggest(sf_dir: str):
    """End-to-end query-log -> suggestions composition (S10 writer + A7
    12h aggregation + T6 Trie + top-5 serve; ``DataBaseManager.java:19-35``
    read side, ``Trie.java:6-73`` structure): a synthetic query log
    derives deterministically from the events table
    (query = event_type || ' u' || user_id % 97, ts = event ts); each
    worker batch APPENDS its own part file through the real
    ``QueryLogWriter`` (the no-coordination serving write path — one
    uuid-named parquet per writer, tmp+rename); the written log is read
    back as a Dataset, aggregated under the 12-hour recency window
    (``aggregate_query_log``); the (n desc, query asc)-ordered counts
    populate the Trie (per-node top-10, insertion-stable), and each
    probe prefix serves its top-5.  Output (prefix, rank, query, n) —
    the Trie's truncation law makes lookup(p)[:5] exactly the SQL
    row_number() <= 5 under (n DESC, query ASC), which the oracle
    replays."""
    import shutil
    import tempfile

    import ray.data as rd

    from .query.query_log import QueryLogWriter, read_query_log
    from .query.suggestions import aggregate_query_log, trie_from_counts

    log_dir = tempfile.mkdtemp(prefix="seekr_qlog_")
    try:
        ev = rd.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["ts", "event_type", "user_id"],
        )

        def append_log(batch: pa.Table) -> pa.Table:
            w = QueryLogWriter(log_dir, flush_every=1 << 30)
            uids = batch["user_id"].to_numpy(zero_copy_only=False)
            for et, u, t in zip(
                batch["event_type"].to_pylist(), uids, batch["ts"].to_pylist()
            ):
                w.record(f"{et} u{int(u) % 97}", t)
            w.flush()
            return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

        for _ in ev.map_batches(
            append_log, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow"):
            pass
        counts_rows: list[tuple[str, int]] = []
        for t in aggregate_query_log(
            read_query_log(log_dir), hours=12.0
        ).iter_batches(batch_format="pyarrow"):
            counts_rows.extend(
                zip(t["query"].to_pylist(), t["count()"].to_pylist())
            )
        counts_rows.sort(key=lambda r: (-int(r[1]), r[0]))
        trie = trie_from_counts(counts_rows)
        nmap = dict(counts_rows)
        out_p: list[str] = []
        out_r: list[int] = []
        out_q: list[str] = []
        out_n: list[int] = []
        for p in QLOG_PREFIXES:
            for r, q in enumerate(trie.lookup(p)[:5], 1):
                out_p.append(p)
                out_r.append(r)
                out_q.append(q)
                out_n.append(int(nmap[q]))
        return pa.table(
            {
                "prefix": pa.array(out_p, pa.string()),
                "rank": pa.array(out_r, pa.int64()),
                "query": pa.array(out_q, pa.string()),
                "n": pa.array(out_n, pa.int64()),
            }
        )
    finally:
        shutil.rmtree(log_dir, ignore_errors=True)


def q_orders_by_nation(sf_dir: str):
    """Broadcast hash join (the J1 pattern over relational tables):
    customer's (custkey → nationkey) side is ``ray.put`` ONCE as sorted
    parallel arrays; each orders block resolves via ``searchsorted``
    inside ``map_batches`` and partial-aggregates per nation before the
    O(nations) exchange — no all-to-all shuffle of the big side."""
    import ray
    import ray.data as rd

    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    )
    keys_parts, nat_parts = [], []
    for b in cust.iter_batches(batch_format="pyarrow"):
        keys_parts.append(b["c_custkey"].to_numpy(zero_copy_only=False))
        nat_parts.append(b["c_nationkey"].to_numpy(zero_copy_only=False))
    keys = np.concatenate(keys_parts) if keys_parts else np.empty(0, np.int64)
    nats = np.concatenate(nat_parts) if nat_parts else np.empty(0, np.int64)
    order = np.argsort(keys)
    side_ref = ray.put((keys[order], nats[order]))

    def join_partial(batch: pa.Table) -> pa.Table:
        skeys, snats = ray.get(side_ref)
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(skeys, ck)
        pos_c = np.minimum(pos, max(len(skeys) - 1, 0))
        found = (len(skeys) > 0) & (skeys[pos_c] == ck)
        nation = snats[pos_c[found]]
        # sum exact integer CENTS (prices are 2dp): integer-valued
        # doubles below 2^53 sum exactly, so the result is invariant to
        # block layout / parallelism — a float-dollar sum at ~6e8 is not
        # (its 6dp rounding sits within summation-order ulp noise)
        price = np.rint(
            batch["o_totalprice"].to_numpy(zero_copy_only=False)[found] * 100.0
        )
        un, inv = np.unique(nation, return_inverse=True)
        n_part = np.bincount(inv)
        sum_part = np.bincount(inv, weights=price)
        return pa.table(
            {
                "nation": pa.array(un, pa.int64()),
                "n_part": pa.array(n_part, pa.int64()),
                "sum_part": pa.array(sum_part, pa.float64()),
            }
        )

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_totalprice"],
    )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "nation": batch["nation"],
                "n": pc.cast(batch["sum(n_part)"], pa.int64()),
                "total": pa.array(
                    [round6(v / 100.0) for v in batch["sum(sum_part)"].to_pylist()],
                    pa.float64(),
                ),
            }
        )

    return (
        orders.map_batches(join_partial, batch_format="pyarrow")
        .groupby("nation")
        .sum(["n_part", "sum_part"])
        .map_batches(finalize, batch_format="pyarrow")
    )


def q_events_hourly(sf_dir: str):
    """Tumbling-window aggregate (hourly count + value sum per event
    type) — the S10/A7 aggregation generalized to time windows, partial-
    aggregated per block before the O(groups) exchange."""
    import ray.data as rd

    from .extras.windows import tumbling_agg

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "event_type", "value"],
    )
    return tumbling_agg(ds, unit="hour")


def _query_vec(ds) -> np.ndarray:
    """The (1, dim) query matrix: the vec_id=0 embedding — the ONE home
    of the query-vector scan the four ANN entries share."""
    for b in ds.iter_batches(batch_format="pyarrow"):
        ids = b["vec_id"].to_pylist()
        if 0 in ids:
            q = np.asarray(
                b["embedding"][ids.index(0)].as_py(), dtype=np.float64
            )
            return q[None, :]
    raise ValueError("embeddings fixture has no vec_id=0 row")


def q_ann_topk(sf_dir: str):
    """Brute-force cosine top-k vs the vec_id=0 embedding (exact ANN
    baseline)."""
    import ray.data as rd
    from .extras.similarity import ann_topk_bruteforce

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    out = ann_topk_bruteforce(ds, _query_vec(ds), k=ANN_K)
    return out.select(["rank", "vec_id", "cos"])


def q_embedding_neardup(sf_dir: str):
    import ray.data as rd
    from .extras.dedup import embedding_neardup_pairs

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return embedding_neardup_pairs(ds, NEARDUP_THRESHOLD, id_limit=NEARDUP_LIMIT)


ASOF_BUILD_TYPE = "purchase"  # the feature event looked up as-of each event
LOOKBACK_HOURS = 24  # sliding lookback window before each label event
SESSION_GAP_HOURS = 6  # session break when a user pauses longer than this


def q_asof_prev_purchase(sf_dir: str):
    """Point-in-time (as-of) join: every event gets its user's most
    recent '{purchase}' event strictly before it (ties broken by max
    event_id) — the feature-at-label-time join of a training pipeline."""
    import ray.data as rd

    from .extras.joins import asof_join_prev

    cols = ["event_id", "user_id", "ts"]
    left = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=cols)
    build = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=cols + ["event_type"],
    ).map_batches(
        lambda b: b.filter(
            pc.equal(b["event_type"], ASOF_BUILD_TYPE)
        ).select(cols),
        batch_format="pyarrow",
    )
    return asof_join_prev(left, build)


def q_lookback_24h(sf_dir: str):
    """Sliding lookback-window range join: per 'purchase' label event,
    count + value sum of the same user's events in the prior 24 h."""
    import ray.data as rd

    from .extras.joins import range_lookback_agg

    path = os.path.join(sf_dir, "events.parquet")
    build = rd.read_parquet(
        path, columns=["event_id", "user_id", "ts", "value"]
    )
    labels = rd.read_parquet(
        path, columns=["event_id", "user_id", "ts", "event_type"]
    ).map_batches(
        lambda b: b.filter(pc.equal(b["event_type"], ASOF_BUILD_TYPE)).select(
            ["event_id", "user_id", "ts"]
        ),
        batch_format="pyarrow",
    )
    return range_lookback_agg(
        labels, build, window_us=LOOKBACK_HOURS * 3_600_000_000
    )


TRAIN_PCT = 80  # deterministic hash-split train share
TOPK_PER_USER = 3  # per-user top-k events


def q_top_events_per_user(sf_dir: str):
    """Exact per-user top-3 events by (value desc, event_id asc) —
    two-phase partial top-k so the shuffle moves O(users*k) rows."""
    import ray.data as rd

    from .extras.topk import topk_per_group

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "value"],
    )
    return topk_per_group(
        ds, key="user_id", value="value", id_col="event_id", k=TOPK_PER_USER
    )


def q_hll_vocab(sf_dir: str):
    """HyperLogLog register table (bucket, max rho) sketching the
    corpus's distinct-token count — integer sketch state, SQL-replicable
    bit-for-bit; the float estimate is pytest-asserted separately."""
    from .extras.sketch import hll_token_registers

    return hll_token_registers(_docs_text(sf_dir))


HH_PHI_PPM = 5000  # heavy-hitter support threshold: 0.5% of all tokens


def q_heavy_hitters(sf_dir: str):
    """Exact frequent tokens (count ≥ phi·N) via the two-pass plan:
    local-threshold prune (guaranteed candidate superset, O(blocks/phi)
    exchange) then exact recount of the broadcast candidates — never an
    O(vocab) shuffle."""
    from .extras.sketch import heavy_hitters_exact

    return heavy_hitters_exact(_docs_text(sf_dir), phi_ppm=HH_PHI_PPM)


def q_hash_split(sf_dir: str):
    """Deterministic md5-keyed train/test split over documents."""
    import ray.data as rd

    from .extras.split import hash_split

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )
    return hash_split(ds, id_col="doc_id", train_pct=TRAIN_PCT)


HOP_WINDOW_HOURS = 2  # hopping-window span
HOP_HOURS = 1  # hop (slide) interval
SAMPLE_RATES = {"click": 0.25, "view": 0.5, "purchase": 1.0}


def q_hll_event_ids(sf_dir: str):
    """HLL register table over distinct event ids (the raw-estimate
    regime, ~10k distincts at sf0.01 — complements q_hll_vocab's tiny
    linear-counting fixture vocabulary)."""
    import ray.data as rd

    from .extras.sketch import hll_registers

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id"]
    )
    return hll_registers(ds, "event_id")


def q_events_hopping(sf_dir: str):
    """Hopping (sliding) window aggregate: 2 h windows every 1 h —
    each event explodes into exactly 2 windows, partial-aggregated per
    block before the O(windows×types) exchange."""
    import ray.data as rd

    from .extras.windows import hopping_agg

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "event_type", "value"],
    )
    return hopping_agg(
        ds,
        window_us=HOP_WINDOW_HOURS * 3_600_000_000,
        hop_us=HOP_HOURS * 3_600_000_000,
    )


def q_stratified_sample(sf_dir: str):
    """Deterministic class-rebalancing sample: keep 25% of clicks, 50%
    of views, 100% of purchases (other types dropped), md5-keyed."""
    import ray.data as rd

    from .extras.split import stratified_sample

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "event_type"],
    )
    return stratified_sample(
        ds, id_col="event_id", group_col="event_type", rates=SAMPLE_RATES
    )


def q_sessions(sf_dir: str):
    """Gap-based session windows (6 h inactivity breaks a session):
    one row per (user, session ordinal) with bounds, count, value sum."""
    import ray.data as rd

    from .extras.windows import sessionize

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "value"],
    )
    return sessionize(ds, gap_us=SESSION_GAP_HOURS * 3_600_000_000)


QUANTILE_QS = [0.25, 0.5, 0.9, 0.99]  # fixed grouped-quantile probe points
SHUFFLE_SALT = "ep1"  # epoch salt: a different salt = an independent permutation
SHUFFLE_BUCKETS = 256
WINSOR_QLO, WINSOR_QHI = 0.05, 0.95
NTILE_K = 10
EMB_DIM = 64  # embeddings fixture dimensionality (TESTDATA.md)
CENTROID_SCALE = 1_000_000
CURATE_MIN_TOKENS = 25  # drops the short tail (~p22 at sf0.01)
CURATE_MIN_ALPHA = 0.82  # ~median ASCII-letter fraction
KMEANS_K = 8  # deterministic init: the first K vec_ids
KSAMPLE_K = 500  # deterministic uniform sample size
DUP_SPAN_K = 5  # duplicated-span shingle width (tokens)
BM25_K1 = 1.2
BM25_B = 0.75


def q_quantiles_price(sf_dir: str):
    """Exact per-returnflag continuous quantiles of l_extendedprice —
    the distribution profiler of a curation pipeline.  The oracle SQL
    replicates the interpolation expression term-for-term (same FP
    order), so the compare is bit-exact rather than trusting
    ``quantile_cont``'s unspecified form."""
    import ray.data as rd

    from .extras.stats import grouped_quantiles

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_extendedprice"],
    )
    return grouped_quantiles(
        ds, key_col="l_returnflag", val_col="l_extendedprice", qs=QUANTILE_QS
    )


def q_global_shuffle(sf_dir: str):
    """Deterministic epoch shuffle over the corpus: exact global rank in
    the md5-keyed permutation via a bucketed prefix-sum — no RNG state,
    no single-worker sort.  The oracle is a plain ROW_NUMBER over the
    same hash order (``md5_number_upper`` == md5 first-8-bytes LE)."""
    import ray.data as rd

    from .extras.split import global_shuffle

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )
    return global_shuffle(
        ds, id_col="doc_id", salt=SHUFFLE_SALT, num_buckets=SHUFFLE_BUCKETS
    )


def q_winsorize_price(sf_dir: str):
    """Per-returnflag winsorization of l_extendedprice at the exact
    [5th, 95th] continuous quantiles — outlier clipping with broadcast
    bounds; the corpus never shuffles.  Bounds are 6dp-rounded on both
    sides so the clip decision is FP-noise-insensitive."""
    import ray.data as rd

    from .extras.stats import winsorize_grouped

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=[
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            "l_extendedprice",
        ],
    )
    return winsorize_grouped(
        ds,
        key_col="l_returnflag",
        val_col="l_extendedprice",
        id_cols=["l_orderkey", "l_linenumber"],
        q_lo=WINSOR_QLO,
        q_hi=WINSOR_QHI,
    )


def q_curate_corpus(sf_dir: str):
    """Composed curation pipeline (the extras' headline use case):
    exact dedup winners ∩ quality thresholds ∩ 'en' language heuristic,
    one streaming pass over the corpus + an O(winners) key broadcast."""
    import ray.data as rd

    from .extras.curate import curate_corpus

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "text"],
    )
    return curate_corpus(
        ds, min_tokens=CURATE_MIN_TOKENS, min_alpha_ratio=CURATE_MIN_ALPHA
    )


def q_value_rank(sf_dir: str):
    """Distributed exact ROW_NUMBER + NTILE over (value, event_id) order
    — value-range buckets + prefix-sum; no single-worker sort."""
    import ray.data as rd

    from .extras.stats import global_value_rank

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "value"]
    )
    return global_value_rank(
        ds, val_col="value", id_col="event_id", ntile=NTILE_K
    )


def q_label_centroids(sf_dir: str):
    """Exact per-label embedding centroids via floor-quantized integer
    sums (order-invariant, SQL-replicable bit-for-bit); O(labels x dim)
    exchange."""
    import ray.data as rd

    from .extras.similarity import label_centroids

    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["label", "embedding"],
    )
    return label_centroids(ds, label_col="label", vec_col="embedding")


def q_kmeans_step(sf_dir: str):
    """One distributed Lloyd iteration (spherical k-means) from the
    deterministic vec_id<K init: 6dp-rounded-cosine assignment (smaller
    cid tie-break) + floor-quantized exact integer centroid means.  The
    iterated fit (kmeans_fit) replays this step; pytest covers it."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from .extras.similarity import _to_matrix, kmeans_step

    path = os.path.join(sf_dir, "embeddings.parquet")
    init_tbl = pq.read_table(
        path, columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", KMEANS_K)],
    ).sort_by("vec_id")
    init = _to_matrix(init_tbl["embedding"])
    ds = rd.read_parquet(path, columns=["embedding"])
    return kmeans_step(ds, init)


def q_lineitem_stats(sf_dir: str):
    """Per-group describe (n, min, max, mean, stddev_pop) via mergeable
    (n, Σx, Σx², min, max) partials — O(groups) exchange."""
    import ray.data as rd

    from .extras.stats import grouped_stats

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_extendedprice"],
    )
    return grouped_stats(ds, key_col="l_returnflag", val_col="l_extendedprice")


def q_revenue_rollup(sf_dir: str):
    """GROUP BY ROLLUP(l_returnflag, l_linestatus) revenue: detail cells
    from ONE partial-agg pass; subtotals and the grand total derived from
    the O(cells) detail rows instead of re-aggregating the input per
    grouping set."""
    import ray.data as rd

    from .extras.stats import rollup_agg

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_linestatus", "l_extendedprice"],
    )

    # exact integer cents (2dp prices): parallelism-invariant sums (see
    # q_orders_by_nation); divide back to dollars after the rollup
    def to_cents(batch: pa.Table) -> pa.Table:
        cents = np.rint(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
        )
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "l_extendedprice": pa.array(cents, pa.float64()),
            }
        )

    out = rollup_agg(
        ds.map_batches(to_cents, batch_format="pyarrow"),
        key_cols=["l_returnflag", "l_linestatus"],
        val_col="l_extendedprice",
    )
    return pa.table(
        {
            "l_returnflag": out["l_returnflag"],
            "l_linestatus": out["l_linestatus"],
            "n": out["n"],
            "total": pa.array(
                [round6(v / 100.0) for v in out["total"].to_pylist()],
                pa.float64(),
            ),
        }
    )


def q_revenue_cube(sf_dir: str):
    """GROUP BY CUBE(l_returnflag, l_linestatus) revenue — the full
    2-key grouping-set lattice (detail, both one-key subtotal sets, and
    the grand total).  Same single-pass discipline as q_revenue_rollup:
    detail cells from ONE partial-agg pass, every coarser set derived
    from those O(cells) rows; the b-only set CUBE adds over ROLLUP is
    one more O(cells) re-group, not a second scan of the input."""
    import ray.data as rd

    from .extras.stats import cube_agg

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_linestatus", "l_extendedprice"],
    )

    # exact integer cents → parallelism-invariant sums (q_revenue_rollup)
    def to_cents(batch: pa.Table) -> pa.Table:
        cents = np.rint(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
        )
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "l_extendedprice": pa.array(cents, pa.float64()),
            }
        )

    out = cube_agg(
        ds.map_batches(to_cents, batch_format="pyarrow"),
        key_cols=["l_returnflag", "l_linestatus"],
        val_col="l_extendedprice",
    )
    return pa.table(
        {
            "l_returnflag": out["l_returnflag"],
            "l_linestatus": out["l_linestatus"],
            "n": out["n"],
            "total": pa.array(
                [round6(v / 100.0) for v in out["total"].to_pylist()],
                pa.float64(),
            ),
        }
    )


def q_event_sample(sf_dir: str):
    """Deterministic uniform 500-sample of events: the k smallest
    md5(event_id) keys, per-block partial top-k (distributed-reservoir
    analog, no RNG state, SQL-replicable membership)."""
    import ray.data as rd

    from .extras.stats import hash_ksample

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id"]
    )
    return hash_ksample(ds, id_col="event_id", k=KSAMPLE_K)


def q_inactive_customers(sf_dir: str):
    """Anti join (WHERE NOT EXISTS): customers with no event activity —
    the right side shrinks to distinct user ids where it lives, then
    broadcasts once; the left side never shuffles."""
    import ray.data as rd

    from .extras.joins import key_filter_join

    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"]
    )
    events = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id"]
    )
    return key_filter_join(
        cust,
        events,
        left_key="c_custkey",
        right_key="user_id",
        anti=True,
        columns=["c_custkey"],
    )


def q_dup_spans(sf_dir: str):
    """Exact duplicated 5-token spans across >= 2 documents (substring-
    level dedup signal; Lee et al. 2022) with occurrence counts and the
    canonical (minimum) containing doc."""
    from .extras.dedup import duplicate_ngram_spans

    return duplicate_ngram_spans(_docs_text(sf_dir), k=DUP_SPAN_K, min_docs=2)


def q_distinct_users(sf_dir: str):
    """Exact COUNT(DISTINCT user_id) per event type — HLL's exact
    sibling: per-block distinct pairs, pair-level groupby, O(keys)
    count."""
    import ray.data as rd

    from .extras.stats import distinct_count_per_group

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "user_id"],
    )
    return distinct_count_per_group(ds, key_col="event_type", val_col="user_id")


def q_search_bm25_topk(sf_dir: str):
    """Top-20 docs for the fixed query under BM25 (k1=1.2, b=0.75,
    idf=log10(N/df) to stay on the reference's idf form) — the modern
    ranking alternative to the reference's tf·idf, same two-phase plan:
    stats pass (df, N, avgdl partials), then score + partial top-k.
    Constants appear as literals in the same positions in the oracle SQL
    so both sides evaluate the identical FP expression."""
    dfs, n, total_len = _df_and_n(sf_dir, terms=set(SEARCH_TERMS), with_len=True)
    avgdl = total_len / n
    idf = {t: math.log10(n / dfs[t]) for t in SEARCH_TERMS if t in dfs}
    import ray

    idf_ref = ray.put((idf, avgdl))

    def score(batch: pa.Table) -> pa.Table:
        idf_map, adl = ray.get(idf_ref)
        out_d, out_s = [], []
        for d, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            toks = simple_tokens(text or "")
            if not toks:
                continue
            dl = len(toks)
            s = 0.0
            hit = False
            for term in SEARCH_TERMS:
                idf_t = idf_map.get(term)
                if idf_t is None:
                    continue
                c = toks.count(term)
                s += idf_t * ((c * 2.2) / (c + 1.2 * (0.25 + 0.75 * dl / adl)))
                if c:
                    hit = True
            if hit:
                out_d.append(d)
                out_s.append(s)
        return pa.table(
            {
                "doc_id": pa.array(out_d, pa.int64()),
                "score_raw": pa.array(out_s, pa.float64()),
            }
        )

    scored = _docs_text(sf_dir).map_batches(score, batch_format="pyarrow")
    top = scored.sort(["score_raw", "doc_id"], descending=[True, False]).limit(20)
    tbl = top.to_pandas()
    return pa.table(
        {
            "doc_id": pa.array(tbl["doc_id"], pa.int64()),
            "score": pa.array([round6(s) for s in tbl["score_raw"]], pa.float64()),
        }
    )


PROPS_FIELD = "k"  # integer field inside events.props JSON
REDACT_PATTERN = "[0-9]+"


def q_repetition_stats(sf_dir: str):
    """Gopher-style repetition quality signals per document: duplicate-
    token fraction and the most-common-bigram share."""
    from .extras.patterns import repetition_stats

    return repetition_stats(_docs_text(sf_dir))


def q_redact_props(sf_dir: str):
    """PII-shaped scrubbing: redact digit runs in events.props with one
    vectorized RE2 pass and fingerprint the redacted form."""
    import ray.data as rd

    from .extras.patterns import regex_redact

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "props"]
    )
    return regex_redact(
        ds, id_col="event_id", text_col="props", pattern=REDACT_PATTERN
    )


def q_props_sum_by_type(sf_dir: str):
    """Semi-structured parse: extract the integer `k` field from the
    props JSON with one vectorized regex (no per-row json.loads) and
    aggregate per event type."""
    import ray.data as rd

    from .extras.patterns import json_int_field_agg

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "props"],
    )
    return json_int_field_agg(
        ds, group_col="event_type", json_col="props", field=PROPS_FIELD
    )


def q_revenue_by_region(sf_dir: str):
    """Multi-hop broadcast join: orders→customer→nation→region revenue
    rollup.  The three dimension sides collapse into ONE broadcast
    (custkey → region id via two tiny driver-side hops composed before
    ray.put), so the fact table resolves region in a single searchsorted
    per block and partial-aggregates before the O(regions) exchange."""
    import pyarrow.parquet as pq_mod

    import ray
    import ray.data as rd

    nation = pq_mod.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_regionkey"],
    )
    region = pq_mod.read_table(
        os.path.join(sf_dir, "region.parquet"), columns=["r_regionkey", "r_name"]
    )
    nat_to_reg = dict(
        zip(nation["n_nationkey"].to_pylist(), nation["n_regionkey"].to_pylist())
    )
    reg_names = dict(
        zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist())
    )

    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    )
    keys_parts, reg_parts = [], []
    for b in cust.iter_batches(batch_format="pyarrow"):
        keys_parts.append(b["c_custkey"].to_numpy(zero_copy_only=False))
        nk = b["c_nationkey"].to_numpy(zero_copy_only=False)
        reg_parts.append(
            np.fromiter((nat_to_reg[int(x)] for x in nk), np.int64, len(nk))
        )
    keys = np.concatenate(keys_parts) if keys_parts else np.empty(0, np.int64)
    regs = np.concatenate(reg_parts) if reg_parts else np.empty(0, np.int64)
    order = np.argsort(keys)
    side_ref = ray.put((keys[order], regs[order]))

    def join_partial(batch: pa.Table) -> pa.Table:
        skeys, sregs = ray.get(side_ref)
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(skeys, ck)
        pos_c = np.minimum(pos, max(len(skeys) - 1, 0))
        found = (len(skeys) > 0) & (skeys[pos_c] == ck)
        reg = sregs[pos_c[found]]
        # exact integer cents (see q_orders_by_nation)
        price = np.rint(
            batch["o_totalprice"].to_numpy(zero_copy_only=False)[found] * 100.0
        )
        un, inv = np.unique(reg, return_inverse=True)
        return pa.table(
            {
                "regionkey": pa.array(un, pa.int64()),
                "n_part": pa.array(np.bincount(inv), pa.int64()),
                "sum_part": pa.array(
                    np.bincount(inv, weights=price), pa.float64()
                ),
            }
        )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "r_name": pa.array(
                    [reg_names[int(x)] for x in batch["regionkey"].to_pylist()],
                    pa.string(),
                ),
                "n": pc.cast(batch["sum(n_part)"], pa.int64()),
                "total": pa.array(
                    [round6(v / 100.0) for v in batch["sum(sum_part)"].to_pylist()],
                    pa.float64(),
                ),
            }
        )

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_totalprice"],
    )
    return (
        orders.map_batches(join_partial, batch_format="pyarrow")
        .groupby("regionkey")
        .sum(["n_part", "sum_part"])
        .map_batches(finalize, batch_format="pyarrow")
    )


def q_priority_revenue(sf_dir: str):
    """Large×large SHUFFLE hash join (no broadcast side): lineitem ⋈
    orders on orderkey via ``Dataset.join`` — the all-to-all exchange
    path the broadcast entries (orders_by_nation, revenue_by_region)
    deliberately avoid; here both sides are fact-sized so the hash
    repartition IS the right plan.  Joined rows partial-aggregate per
    block before the O(priorities) final exchange."""
    import ray.data as rd

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority"],
    )
    joined = li.join(
        orders,
        join_type="inner",
        num_partitions=16,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def partial(batch: pa.Table) -> pa.Table:
        # exact integer units of 1e-4 dollars (price is 2dp, discount is
        # 2dp): integer-valued doubles sum exactly below 2^53, making the
        # result invariant to join partitioning / summation order
        cents = np.rint(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
        )
        pct = np.rint(
            batch["l_discount"].to_numpy(zero_copy_only=False) * 100.0
        )
        rev = cents * (100.0 - pct)
        pri = batch["o_orderpriority"].to_numpy(zero_copy_only=False)
        un, inv = np.unique(pri, return_inverse=True)
        return pa.table(
            {
                "o_orderpriority": pa.array(un, pa.string()),
                "n_part": pa.array(np.bincount(inv), pa.int64()),
                "rev_part": pa.array(
                    np.bincount(inv, weights=rev), pa.float64()
                ),
            }
        )

    agg = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .sum(["n_part", "rev_part"])
        .to_pandas()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "o_orderpriority": pa.array(agg["o_orderpriority"], pa.string()),
            "n": pa.array(agg["sum(n_part)"].astype("int64"), pa.int64()),
            "revenue": pa.array(
                [round6(v / 10000.0) for v in agg["sum(rev_part)"]],
                pa.float64(),
            ),
        }
    )


def q_jaccard_join_prefix(sf_dir: str):
    """Prefix-filtered EXACT set-similarity join (PPJoin/Vernica) — the
    sub-quadratic scale path for ngram_jaccard: rarity-ordered prefixes
    route each doc to the few groups that can contain its >= t partners;
    verification is exact in-group.  Same output as the brute-force
    block-pair form (same SQL oracle)."""
    from .extras.dedup import ngram_jaccard_pairs_prefix

    out = (
        ngram_jaccard_pairs_prefix(
            _docs_text(sf_dir),
            k=NGRAM_K,
            threshold_mille=round(NGRAM_JACCARD_THRESHOLD * 1000),
        )
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "a": pa.array(out["a"], pa.int64()),
            "b": pa.array(out["b"], pa.int64()),
            "jaccard": pa.array(out["jaccard"], pa.float64()),
        }
    )


MIX_BUDGET = 30_000  # target mixture size (tokens)
MIX_WEIGHTS = {"en": 300, "fr": 500, "zh": 100, "de": 50, "es": 50}  # per-mille


def q_mixture_sample(sf_dir: str):
    """Data-mixture sampling: per-source integer keep thresholds from
    exact per-source token totals (fr's target exceeds its supply →
    keep-all cap; the others downsample), then a stateless md5 filter —
    the mixture-weighting step of an LLM training pipeline."""
    import ray.data as rd

    from .extras.split import mixture_sample

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "text"],
    )
    out = (
        mixture_sample(
            ds, token_budget=MIX_BUDGET, weights_permille=MIX_WEIGHTS
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "lang": pa.array(out["lang"], pa.string()),
            "n_tokens": pa.array(out["n_tokens"], pa.int64()),
        }
    )


def q_term_pmi(sf_dir: str):
    """Document-level term co-occurrence with PMI (collocation signal):
    per-block distinct-pair partials (one row per pair per block reaches
    the exchange), O(vocab) term doc-frequencies broadcast for the PMI
    attach."""
    from .extras.textstats import term_cooccurrence_pmi

    out = (
        term_cooccurrence_pmi(_docs_text(sf_dir), min_docs=2)
        .to_pandas()
        .sort_values(["term_a", "term_b"])
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "term_a": pa.array(out["term_a"], pa.string()),
            "term_b": pa.array(out["term_b"], pa.string()),
            "n_docs": pa.array(out["n_docs"], pa.int64()),
            "pmi": pa.array(out["pmi"], pa.float64()),
        }
    )


PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_event_type_pivot(sf_dir: str):
    """Wide (pivoted) per-user event-type counts — SQL conditional
    aggregation as a distributed operator: per-block partial counts
    shrink the exchange to O(users × types), a bucketed map_groups
    widens each user vectorized.  Integer counts ⇒ parallelism-
    invariant."""
    import ray.data as rd

    from .extras.stats import pivot_counts

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "event_type"],
    )
    out = (
        pivot_counts(
            ds,
            key_col="user_id",
            pivot_col="event_type",
            categories=PIVOT_TYPES,
        )
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    return pa.table(
        {c: pa.array(out[c], pa.int64()) for c in ["user_id", *PIVOT_TYPES]}
    )


def q_running_value(sf_dir: str):
    """Per-user running value sum in (ts, event_id) order — the SQL
    window ``sum() OVER (PARTITION BY ... ORDER BY ...)`` as a bucketed
    co-partition + single lexsort/grouped-cumsum kernel.  The summation
    order is defined by the key/ordering, not block layout, so the
    float result is parallelism-invariant and SQL-replicable."""
    import ray.data as rd

    from .extras.windows import running_sum_per_group

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "value"],
    )
    out = (
        running_sum_per_group(ds)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "event_id": pa.array(out["event_id"], pa.int64()),
            "user_id": pa.array(out["user_id"], pa.int64()),
            "running_value": pa.array(out["running_value"], pa.float64()),
        }
    )


DECONTAM_K = 5  # decontamination shingle width (tokens)
DECONTAM_BENCH_MOD = 10  # doc_id % 10 == 0 rows act as the "benchmark" set
PACK_CAPACITY = 2048  # tokens per training pack
PACK_RANGE = 64  # doc_id range width for the distributed prefix scan


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination audit: docs sharing >= 1 five-token
    shingle with the (doc_id % 10 == 0) benchmark subset, with the count
    of distinct overlapping shingles.  Benchmark shingles broadcast once
    (ray.put); the corpus side is one shuffle-free map_batches pass."""
    from .extras.decontam import benchmark_shingles, decontaminate

    def _part(is_bench: bool):
        def fn(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            mask = (ids % DECONTAM_BENCH_MOD == 0) == is_bench
            return batch.filter(pa.array(mask))

        return fn

    docs = _docs_text(sf_dir)
    bench = docs.map_batches(_part(True), batch_format="pyarrow")
    corpus = docs.map_batches(_part(False), batch_format="pyarrow")
    bset = benchmark_shingles(bench, k=DECONTAM_K)
    out = decontaminate(corpus, bset, k=DECONTAM_K).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "n_overlap": pa.array(out["n_overlap"], pa.int64()),
        }
    )


NEG_K = 4  # negatives per anchor for the negative_samples entry


def q_negative_samples(sf_dir: str):
    """Deterministic contrastive negative sampling: 4 md5-derived
    uniform negatives per embedding row (never the anchor itself);
    map-only, stateless, shuffle-free."""
    import pyarrow.parquet as pq2
    import ray.data as rd

    from .extras.split import negative_samples

    path = os.path.join(sf_dir, "embeddings.parquet")
    n_rows = pq2.ParquetFile(path).metadata.num_rows
    emb = rd.read_parquet(path, columns=["vec_id"])
    out = (
        negative_samples(emb, id_col="vec_id", n_rows=n_rows, k=NEG_K)
        .to_pandas()
        .sort_values(["vec_id", "j"])
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "vec_id": pa.array(out["vec_id"], pa.int64()),
            "j": pa.array(out["j"], pa.int64()),
            "neg_id": pa.array(out["neg_id"], pa.int64()),
        }
    )


RP_OUT_DIM = 8  # output width for the random_projection entry


def q_random_projection(sf_dir: str):
    """Johnson-Lindenstrauss random projection 64 -> 8 dims: broadcast
    seeded Gaussian matrix, one shuffle-free pass; per-term quantized
    integer sums make the output parallelism- and SQL-bit-stable."""
    import ray.data as rd

    from .extras.similarity import projection_matrix, random_projection

    emb = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    proj = projection_matrix(EMB_DIM, RP_OUT_DIM)
    out = (
        random_projection(emb, proj)
        .to_pandas()
        .sort_values(["vec_id", "dim"])
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "vec_id": pa.array(out["vec_id"], pa.int64()),
            "dim": pa.array(out["dim"], pa.int64()),
            "y": pa.array(out["y"], pa.float64()),
        }
    )


def q_hll_users_by_type(sf_dir: str):
    """COUNT(DISTINCT user_id) GROUP BY event_type as a mergeable HLL
    sketch — per-key register STATE compared (no float estimate in the
    contract), the O(keys·m)-exchange scale form of a per-key distinct."""
    import ray.data as rd

    from .extras.sketch import hll_registers_by_key

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "user_id"],
    )
    out = (
        hll_registers_by_key(ev, key_col="event_type", col="user_id")
        .to_pandas()
        .sort_values(["event_type", "bucket"])
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "bucket": pa.array(out["bucket"], pa.int64()),
            "rho": pa.array(out["rho"], pa.int64()),
        }
    )


def q_pack_by_lang(sf_dir: str):
    """Per-language sequence packing: each lang gets its own
    doc_id-ordered token stream and pack numbering (three-phase exact
    scan co-partitioned on (lang, id-range))."""
    import ray.data as rd

    from .extras.packing import pack_offsets_by_key

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "text"],
    )
    out = (
        pack_offsets_by_key(
            docs,
            capacity=PACK_CAPACITY,
            key_col="lang",
            range_size=PACK_RANGE,
        )
        .to_pandas()
        .sort_values(["lang", "doc_id"])
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "lang": pa.array(out["lang"], pa.string()),
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "n_tokens": pa.array(out["n_tokens"], pa.int64()),
            "start_offset": pa.array(out["start_offset"], pa.int64()),
            "pack_id": pa.array(out["pack_id"], pa.int64()),
            "pack_offset": pa.array(out["pack_offset"], pa.int64()),
        }
    )


def q_bloom_decontaminate(sf_dir: str):
    """Bloom-filter decontamination audit: the fixed-memory form of
    q_decontaminate.  The benchmark side compresses to an 8 KiB bitmap
    (broadcast once) instead of a shingle set; a corpus doc's n_maybe
    counts its distinct shingles whose BLOOM_K salted-md5 positions are
    all set.  Deterministic including false positives, so the SQL oracle
    reproduces the filter bit-for-bit."""
    from .extras.decontam import benchmark_bloom, bloom_decontaminate

    def _part(is_bench: bool):
        def fn(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            mask = (ids % DECONTAM_BENCH_MOD == 0) == is_bench
            return batch.filter(pa.array(mask))

        return fn

    docs = _docs_text(sf_dir)
    bench = docs.map_batches(_part(True), batch_format="pyarrow")
    corpus = docs.map_batches(_part(False), batch_format="pyarrow")
    bits = benchmark_bloom(bench, k=DECONTAM_K)
    out = bloom_decontaminate(corpus, bits, k=DECONTAM_K).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "n_maybe": pa.array(out["n_maybe"], pa.int64()),
        }
    )


SEMDEDUP_K = 8  # clusters for the semdedup entry
# intra-cluster cosine threshold: the fixture's built-in near-dup band
# sits at cos >= ~0.38 against a ~0.09 background (see NEARDUP_THRESHOLD)
SEMDEDUP_TAU = 0.38
EMB_DIM = 64  # fixture embedding width (all sf scales)


def q_semdedup_pairs(sf_dir: str):
    """SemDeDup (Abbas et al. 2023): cluster embeddings (fixed seeded
    centroids — deterministic, so the assignment is SQL-replicable),
    then report cosine >= tau near-dup pairs WITHIN clusters only.  The
    O(n²) comparison collapses to Σ per-cluster (n_c)² independent
    map_groups tasks."""
    import ray.data as rd

    from .extras.similarity import semdedup_centroids, semdedup_pairs

    cents = semdedup_centroids(SEMDEDUP_K, EMB_DIM)
    emb = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    out = (
        semdedup_pairs(emb, cents, tau=SEMDEDUP_TAU)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "cid": pa.array(out["cid"], pa.int64()),
            "a": pa.array(out["a"], pa.int64()),
            "b": pa.array(out["b"], pa.int64()),
            "cos": pa.array(out["cos"], pa.float64()),
        }
    )


CAP_PER_LANG = 20  # per-language doc quota for the cap_per_lang entry
TOKEN_BUDGET = 2500  # per-language token budget (partial at sf0.001-0.1)


def q_token_budget_sample(sf_dir: str):
    """Exact token-budget mixing: per language, keep docs in the
    stateless md5 order while the inclusive running token total stays
    <= TOKEN_BUDGET — the tokens-form mixture recipe (cap_per_lang is
    the docs-form, mixture_sample the rate-form).  Three-phase exact
    distributed scan, no global sort (extras/budget.py)."""
    import ray.data as rd

    from .extras.budget import token_budget_sample

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "text"],
    )
    out = (
        token_budget_sample(docs, budget=TOKEN_BUDGET, group_col="lang")
        .to_pandas()
        .sort_values(["lang", "doc_id"])
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "lang": pa.array(out["lang"], pa.string()),
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "n_tokens": pa.array(out["n_tokens"], pa.int64()),
        }
    )


def q_cap_per_lang(sf_dir: str):
    """Per-key quota curation: keep 20 docs per language, chosen by the
    deterministic md5 permutation (the C4/RefinedWeb per-domain cap).
    Two-phase exact per-key top-k — the exchange moves O(keys*cap)."""
    import ray.data as rd

    from .extras.split import cap_per_key

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang"]
    )
    out = (
        cap_per_key(
            docs,
            key_col="lang",
            id_col="doc_id",
            cap=CAP_PER_LANG,
        )
        .to_pandas()
        .sort_values(["lang", "doc_id"])
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "lang": pa.array(out["lang"], pa.string()),
            "doc_id": pa.array(out["doc_id"], pa.int64()),
        }
    )


BPE_MERGES = 200  # merge rules learned by the bpe_merges entry


def q_bpe_pair_counts(sf_dir: str):
    """BPE training, iteration-1 candidate table: adjacent char-pair
    counts weighted by corpus word frequency.  One corpus pass (bucketed
    word count) + an alphabet-bounded pair exchange."""
    from .extras.bpe import bpe_pair_counts

    return bpe_pair_counts(_docs_text(sf_dir))


def q_bpe_merges(sf_dir: str):
    """Trained BPE merge table (rank, left, right, freq) — iterative, so
    rows-only at the driver; the merge loop semantics are pytest-pinned
    against a naive reference implementation (tests/test_bpe.py)."""
    from .extras.bpe import bpe_train

    return bpe_train(_docs_text(sf_dir), BPE_MERGES)


def q_bpe_token_counts(sf_dir: str):
    """Per-doc token count under the trained merges (broadcast ranks,
    per-block distinct-word memoized encode)."""
    from .extras.bpe import bpe_token_counts, bpe_train

    docs = _docs_text(sf_dir)
    merges = bpe_train(docs, BPE_MERGES)
    out = bpe_token_counts(docs, merges).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "n_bpe_tokens": pa.array(out["n_bpe_tokens"], pa.int64()),
        }
    )


def q_pack_offsets(sf_dir: str):
    """Sequence-packing offsets: every doc's global token start offset in
    doc_id order (distributed exact prefix sum: per-range partial sums ->
    driver prefix over ranges -> per-range local cumsum), plus its
    pack_id / pack_offset at a fixed capacity."""
    from .extras.packing import pack_offsets

    out = pack_offsets(
        _docs_text(sf_dir),
        capacity=PACK_CAPACITY,
        range_size=PACK_RANGE,
    ).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "n_tokens": pa.array(out["n_tokens"], pa.int64()),
            "start_offset": pa.array(out["start_offset"], pa.int64()),
            "pack_id": pa.array(out["pack_id"], pa.int64()),
            "pack_offset": pa.array(out["pack_offset"], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# rows-only operators (non-SQL-expressible)
# ---------------------------------------------------------------------------


def _corpus_rows_for(sf_dir: str) -> int:
    name = os.path.basename(os.path.normpath(sf_dir))
    return {"sf0.001": 200, "sf0.01": 1000, "sf0.1": 5000}.get(name, 500)


def _corpus_index(sf_dir: str) -> str:
    """Build (once per sf scale) the full reference-semantics index over
    the synthesized (repo,path,commit,lang,content) corpus."""
    import ray.data as rd
    from .build import build_index
    from .config import IndexConfig
    from .fixtures import cached_corpus_path, cached_links_path

    n = _corpus_rows_for(sf_dir)
    # v2 suffix: the on-disk layout changed (drops/ + hive postings) —
    # never resume onto a stale round-1 index left in /tmp
    # v3: adds the doclen/ BM25 sidecar — rebuild any older cached layout
    index_dir = f"/tmp/seekr_entry_index_n{n}_v3"
    if not os.path.exists(os.path.join(index_dir, "meta.json")):
        corpus_path = cached_corpus_path(n)
        docs = rd.read_parquet(corpus_path)
        links = rd.read_parquet(cached_links_path(n))
        cfg = IndexConfig(
            num_term_partitions=8, num_id_partitions=8, hot_df_threshold=2000
        )
        build_index(
            docs,
            index_dir,
            cfg,
            key_cols=["repo", "path", "commit"],
            links_ds=links,
            input_path=corpus_path,
        )
    return index_dir


def q_corpus_merge_parity(sf_dir: str):
    """Self-checking shard-merge parity (stages/merge.py): build two
    indexes over the fixture corpus halves, merge them, and require the
    result IDENTICAL to the unified corpus index — doc ids, (term, df,
    idf) stats, and (doc_id, score) search results across the whole
    QUERY_SET.  Any divergence raises, failing the driver entry; the
    recorded rows are the merged manifest (partition, n_terms,
    n_postings) with the parity flag."""
    import pyarrow.parquet as _pq
    import ray.data as rd

    from .build import build_index, read_docs_table
    from .config import IndexConfig
    from .fixtures import QUERY_SET, cached_corpus_path, cached_links_path
    from .query.engine import QueryEngine
    from .stages.merge import merge_indexes
    from .stages.segments import read_manifest

    n = _corpus_rows_for(sf_dir)
    unified_dir = _corpus_index(sf_dir)
    merged_dir = f"/tmp/seekr_entry_index_n{n}_v3_merged"
    if not os.path.exists(os.path.join(merged_dir, "meta.json")):
        corpus = _pq.read_table(cached_corpus_path(n))
        half = n // 2
        cfg = IndexConfig(
            num_term_partitions=8, num_id_partitions=8, hot_df_threshold=2000
        )
        shards = {}
        for name, tbl in (
            ("a", corpus.slice(0, half)),
            ("b", corpus.slice(half)),
        ):
            path = f"/tmp/seekr_entry_shard_n{n}_{name}.parquet"
            _pq.write_table(tbl, path)
            idx = f"/tmp/seekr_entry_index_n{n}_v3_shard_{name}"
            if not os.path.exists(os.path.join(idx, "meta.json")):
                build_index(
                    rd.read_parquet(path), idx, cfg,
                    key_cols=["repo", "path", "commit"], input_path=path,
                )
            shards[name] = idx
        merge_indexes(
            shards["a"], shards["b"], merged_dir,
            key_cols=["repo", "path", "commit"],
            links_path=cached_links_path(n),
        )

    # parity gate — identical docs, stats, and scores, or raise
    def docs_of(d):
        t = read_docs_table(d, columns=["doc_id", "content_sha256"])
        return sorted(
            zip(t["doc_id"].to_pylist(), t["content_sha256"].to_pylist())
        )

    assert docs_of(merged_dir) == docs_of(unified_dir), "docs diverge"
    em, eu = QueryEngine(merged_dir), QueryEngine(unified_dir)
    for qid, query, k in QUERY_SET:
        rm = [(d, round(s, 9)) for d, s in em.search_topk(query, k)]
        ru = [(d, round(s, 9)) for d, s in eu.search_topk(query, k)]
        assert rm == ru, f"search diverges on {qid}"

    # Round 5, SQL-oracled: the oracle aggregates the UNIFIED index's
    # exported chunk metadata under the sha-routing law and compares it
    # to the MERGED index's manifest returned here — per-partition term
    # and posting counts of a shard merge must equal the unified build's
    # segment reality (the df/stats-identity half of the parity gate,
    # independently recomputed; the score-identity half stays the
    # in-entry assertion above).
    _export_segmeta(unified_dir, "corpus_segmeta.parquet")
    rows = read_manifest(merged_dir)
    parts = sorted(rows)
    return pa.table(
        {
            "partition": pa.array(parts, pa.int64()),
            "n_terms": pa.array(
                [int(rows[p].get("n_terms", 0)) for p in parts], pa.int64()
            ),
            "n_postings": pa.array(
                [int(rows[p].get("n_postings", 0)) for p in parts], pa.int64()
            ),
            "parity": pa.array([True] * len(parts), pa.bool_()),
        }
    )


def _export_segmeta(index_dir: str, name: str) -> None:
    """Export one index's per-chunk metadata (term, salt, n_docs) read
    STRAIGHT from the segment parquet files (the raw layer, not the
    store) for the manifest oracles."""
    import glob as _glob

    import pyarrow.parquet as _pq

    seg = os.path.join(index_dir, "segments")
    files = sorted(_glob.glob(os.path.join(seg, "part-*.parquet")))
    tbls = [
        _pq.read_table(f, columns=["term", "salt", "n_docs"]) for f in files
    ]
    _export_oracle_input(
        name,
        pa.concat_tables(tbls)
        if tbls
        else pa.table(
            {
                "term": pa.array([], pa.string()),
                "salt": pa.array([], pa.int32()),
                "n_docs": pa.array([], pa.int32()),
            }
        ),
    )


def q_corpus_index_manifest(sf_dir: str):
    """Per-partition lineage/metrics of the corpus index build.  Round
    5: SQL-oracled — the entry exports the segment files' chunk
    metadata (term, salt, n_docs), and the oracle re-derives each
    chunk's partition from scratch via the routing law
    (sha256(term | term\\x00salt) first-8-bytes little-endian mod P —
    ``stages/doc_table.py::stable_hash_str`` +
    ``stages/postings.py::term_partition`` rebuilt in SQL hex
    arithmetic) and re-aggregates n_terms / n_chunks / n_postings per
    partition; the manifest must match the segment reality exactly."""
    from .stages.segments import read_manifest

    index_dir = _corpus_index(sf_dir)
    _export_segmeta(index_dir, "corpus_segmeta.parquet")
    rows = read_manifest(index_dir)
    parts = sorted(rows)
    return pa.table(
        {
            "partition": pa.array(parts, pa.int64()),
            "n_terms": pa.array([rows[p]["n_terms"] for p in parts], pa.int64()),
            "n_chunks": pa.array([rows[p]["n_chunks"] for p in parts], pa.int64()),
            "n_postings": pa.array(
                [rows[p]["n_postings"] for p in parts], pa.int64()
            ),
        }
    )


def q_corpus_search(sf_dir: str):
    """Reference-semantics search results for the FULL fixture query set
    over the corpus index (query_id, rank, doc_id, score).

    Round 5: SQL-oracled — the oracle bakes the engine's own parser
    routing per query at SQL-build time (operator precedence, malformed
    fallthrough, Porter stems: the pytest-pinned cut line) and replays
    from exported postings/positions: plain scoring, boolean set
    algebra with the B1 left-wordInfo bias and B2 right-overwrite
    (identity on this set's disjoint operands), and the quoted-phrase
    position walk (MAX_GAP=3 enter-non-strict / slide-strict cursor
    law) — ranked under (score DESC, doc_id ASC)."""
    from .fixtures import QUERY_SET

    engine = _export_search_inputs(sf_dir)
    out_q, out_r, out_d, out_s = [], [], [], []
    for qid, query, k in QUERY_SET:
        for rank, (doc_id, score) in enumerate(engine.search_topk(query, k)):
            out_q.append(qid)
            out_r.append(rank)
            out_d.append(doc_id)
            out_s.append(score)
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.string()),
            "rank": pa.array(out_r, pa.int32()),
            "doc_id": pa.array(out_d, pa.int64()),
            "score": pa.array(_round6_half_away(out_s), pa.float64()),
        }
    )


RBO_P = 0.9
RBO_DEPTH = 10


def q_corpus_rank_agreement(sf_dir: str):
    """Rank-biased overlap (Webber et al., TOIS'10) between the tf·idf
    and BM25 rankings for every plain free-text fixture query — the
    scorer-agreement report a ranking migration ships with.  Both sides
    run through the chunk-lazy cold BMW path (mode="bmw_cold"), so this
    entry also exercises the persisted-chunk-metadata serving path in
    the driver contract.  RBO@10, p=0.9:
    ``(1-p) * sum_{i=1..d} p^(i-1) * |A_i ∩ B_i| / i``.

    Output: ``(query_id, overlap10, rbo)``.  Round 5: SQL-oracled — the
    oracle recomputes BOTH rankings from the exported postings/doclen/
    query-stem tables (shared scoring CTEs) and replays the RBO sum."""
    engine = _export_search_inputs(sf_dir)
    out_q, out_o, out_r = [], [], []
    for qid, query, _k in _plain_queries():
        a = [d for d, _ in engine.search_topk(query, RBO_DEPTH, mode="bmw_cold")]
        b = [d for d, _ in engine.bm25_topk(query, RBO_DEPTH, mode="bmw_cold")]
        rbo = 0.0
        for i in range(1, RBO_DEPTH + 1):
            ov = len(set(a[:i]) & set(b[:i]))
            rbo += (RBO_P ** (i - 1)) * ov / i
        rbo *= 1.0 - RBO_P
        out_q.append(qid)
        out_o.append(len(set(a) & set(b)))
        out_r.append(rbo)
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.string()),
            "overlap10": pa.array(out_o, pa.int64()),
            "rbo": pa.array(_round6_half_away(out_r), pa.float64()),
        }
    )


def _plain_queries() -> list[tuple[str, str, int]]:
    from .fixtures import QUERY_SET
    from .query.parser import detect_operator, is_quoted

    return [
        (qid, query, k)
        for qid, query, k in QUERY_SET
        if query.strip()
        and not detect_operator(query)
        and not is_quoted(query.strip())
    ]


def _component_plan(comp: str):
    """One boolean operand, mirroring ``QueryEngine._component_arrays``
    routing: quoted -> phrase stems, else plain stems."""
    from .query.parser import is_quoted, strip_quotes, tokenize_and_stem

    if is_quoted(comp):
        return ("phrase", tokenize_and_stem(strip_quotes(comp))[0])
    return ("plain", tokenize_and_stem(comp)[0])


def _query_plan(query: str):
    """Routing plan of one query-set entry, mirroring
    ``QueryEngine.search_topk`` exactly (same parser calls, same branch
    order): ('empty', None) | ('plain', stems) | ('phrase', stems) |
    ('bool', (op, left_plan, right_plan))."""
    from .query.parser import (
        detect_operator,
        is_quoted,
        split_query,
        strip_quotes,
        tokenize_and_stem,
    )

    q = (query or "").strip()
    if not q:
        return ("empty", None)
    op = detect_operator(query)
    if op:
        parts = split_query(query)
        if len(parts) == 2:
            return (
                "bool",
                (
                    op,
                    _component_plan(parts[0].strip()),
                    _component_plan(parts[1].strip()),
                ),
            )
        # malformed boolean falls through to the plain path
    if is_quoted(q):
        return ("phrase", tokenize_and_stem(strip_quotes(q))[0])
    return ("plain", tokenize_and_stem(query)[0])


def _query_set_plans() -> list[tuple[str, tuple, int]]:
    from .fixtures import QUERY_SET

    return [(qid, _query_plan(query), k) for qid, query, k in QUERY_SET]


def _plan_stems(plan) -> tuple[list[str], list[str]]:
    """(all stems, phrase-walk stems needing positions) of one plan."""
    kind, payload = plan
    if kind == "empty":
        return [], []
    if kind == "plain":
        return list(payload), []
    if kind == "phrase":
        return list(payload), list(payload) if len(payload) >= 2 else []
    op, lp, rp = payload
    la, lph = _plan_stems(lp)
    ra, rph = _plan_stems(rp)
    return la + ra, lph + rph


def _export_search_inputs(sf_dir: str):
    """Export the search-scoring oracle inputs (beyond the pagerank
    pair): the query->stem map for the plain free-text query subset
    (tokenize+Porter — pytest-pinned, the oracle's cut line), the
    merged per-stem postings ``(stem, doc_id, tf)`` decoded from the
    index segments for EVERY stem the full query set touches (plain,
    boolean components, phrases), the phrase stems' position lists, and
    the doclen sidecar.  Returns the engine."""
    from .query.engine import QueryEngine
    from .query.parser import tokenize_and_stem
    from .query.store import load_doclens

    index_dir = _export_pagerank_inputs(sf_dir)
    engine = QueryEngine(index_dir)
    q_ids: list[str] = []
    q_stems: list[str | None] = []
    for qid, query, _k in _plain_queries():
        stems = tokenize_and_stem(query)[0]
        if not stems:
            # stem-less query (stopwords only): a NULL-stem row keeps
            # the query_id visible to the oracle (joins on stem never
            # match NULL, so it scores no docs — exactly the engine)
            q_ids.append(qid)
            q_stems.append(None)
        for s in stems:
            q_ids.append(qid)
            q_stems.append(s)
    _export_oracle_input(
        "corpus_queries.parquet",
        pa.table(
            {
                "query_id": pa.array(q_ids, pa.string()),
                "stem": pa.array(q_stems, pa.string()),
            }
        ),
    )
    all_stems: set[str] = set(s for s in q_stems if s is not None)
    walk_stems: set[str] = set()
    for _qid, plan, _k in _query_set_plans():
        a, ph = _plan_stems(plan)
        all_stems.update(a)
        walk_stems.update(ph)
    p_stems: list[str] = []
    p_ids: list[np.ndarray] = []
    p_tfs: list[np.ndarray] = []
    pos_stems: list[str] = []
    pos_ids: list[np.ndarray] = []
    pos_vals: list[np.ndarray] = []
    for s in sorted(all_stems):
        tp = engine.store.postings(s)
        if tp is None:
            continue
        p_stems.extend([s] * len(tp.doc_ids))
        p_ids.append(tp.doc_ids)
        p_tfs.append(tp.tfs)
        if s in walk_stems:
            for d, pos in zip(tp.doc_ids, tp.positions):
                arr = np.asarray(pos, dtype=np.int64)
                pos_stems.extend([s] * len(arr))
                pos_ids.append(np.full(len(arr), int(d), np.int64))
                pos_vals.append(arr)
    _export_oracle_input(
        "corpus_postings.parquet",
        pa.table(
            {
                "stem": pa.array(p_stems, pa.string()),
                "doc_id": pa.array(
                    np.concatenate(p_ids) if p_ids else np.empty(0, np.int64),
                    pa.int64(),
                ),
                "tf": pa.array(
                    np.concatenate(p_tfs) if p_tfs else np.empty(0),
                    pa.float64(),
                ),
            }
        ),
    )
    _export_oracle_input(
        "corpus_positions.parquet",
        pa.table(
            {
                "stem": pa.array(pos_stems, pa.string()),
                "doc_id": pa.array(
                    np.concatenate(pos_ids)
                    if pos_ids
                    else np.empty(0, np.int64),
                    pa.int64(),
                ),
                "pos": pa.array(
                    np.concatenate(pos_vals)
                    if pos_vals
                    else np.empty(0, np.int64),
                    pa.int64(),
                ),
            }
        ),
    )
    dl_ids, dls, _avg = load_doclens(index_dir)
    _export_oracle_input(
        "corpus_doclen.parquet",
        pa.table(
            {
                "doc_id": pa.array(dl_ids, pa.int64()),
                "doclen": pa.array(dls, pa.int64()),
            }
        ),
    )
    return engine


def _round6_half_away(vals: list[float]) -> np.ndarray:
    v = np.asarray(vals, dtype=np.float64)
    return np.copysign(np.floor(np.abs(v) * 1e6 + 0.5), v) / 1e6


def q_corpus_search_bm25(sf_dir: str):
    """BM25 (k1=1.2, b=0.75, pagerank-blended) top-k over the corpus
    index for the plain free-text subset of the query set — the
    north-rule ranking mode; rank-identity vs the brute-force oracle is
    pytest-asserted (tests/test_rank_identity.py::test_bm25_*).  Round
    5: SQL-oracled — the entry exports the query->stem map, per-stem
    postings and doclen sidecar, and the oracle independently recomputes
    df, idf = log10(N/df), the BM25 contribution (raw count recovered as
    round(tf·dl)), the pagerank blend (from the unrolled replay chain)
    and the (score DESC, doc_id ASC) top-k."""
    engine = _export_search_inputs(sf_dir)
    out_q, out_r, out_d, out_s = [], [], [], []
    for qid, query, k in _plain_queries():
        for rank, (doc_id, score) in enumerate(engine.bm25_topk(query, k=k)):
            out_q.append(qid)
            out_r.append(rank)
            out_d.append(doc_id)
            out_s.append(score)
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.string()),
            "rank": pa.array(out_r, pa.int32()),
            "doc_id": pa.array(out_d, pa.int64()),
            "score": pa.array(_round6_half_away(out_s), pa.float64()),
        }
    )


ORACLE_EXPORT_DIR = "/tmp/seekr_oracle_export"


def _export_oracle_input(name: str, tbl: pa.Table) -> str:
    """Atomically (re)write one oracle-input parquet under the FIXED
    export dir.  The corpus_* oracles hinge on this handoff: their SQL
    strings are static (the driver/audit runs the same text at every
    sf), so the entry exports the current scale's raw inputs / id
    assignment to stable paths right before the oracle reads them.  The
    oracle then RECOMPUTES the pipeline under test from those inputs —
    the export carries only data the SQL side could not otherwise name
    (fixture paths are sf-dependent), never precomputed answers."""
    import pyarrow.parquet as _pq

    os.makedirs(ORACLE_EXPORT_DIR, exist_ok=True)
    path = os.path.join(ORACLE_EXPORT_DIR, name)
    tmp = path + f".tmp-{os.getpid()}"
    _pq.write_table(tbl, tmp)
    os.replace(tmp, path)
    return path


def _export_pagerank_inputs(sf_dir: str) -> str:
    import pyarrow.parquet as _pq

    from .build import read_docs_table
    from .fixtures import cached_links_path

    index_dir = _corpus_index(sf_dir)
    _export_oracle_input(
        "corpus_docs.parquet",
        read_docs_table(index_dir, columns=["doc_id", "url"]),
    )
    _export_oracle_input(
        "corpus_links.parquet",
        _pq.read_table(cached_links_path(_corpus_rows_for(sf_dir))),
    )
    return index_dir


def q_corpus_pagerank(sf_dir: str):
    """PageRank sidecar of the corpus index (build stage 5: J1 url
    resolution, B7 edge dedup, A5 power iteration with dangling mass,
    A8 ε=1e-5 max-norm convergence; ``PageRank.java:12-105``).  Round 5:
    SQL-oracled — the entry exports the raw links fixture and the
    index's (doc_id, url) assignment to stable paths, and the oracle
    INDEPENDENTLY resolves, dedups and iterates (unrolled synchronous
    steps with a per-step max-|Δ| convergence pick) to the same 9dp
    values."""
    from .query.store import load_pagerank

    index_dir = _export_pagerank_inputs(sf_dir)
    ids, ranks = load_pagerank(index_dir)  # already id-sorted
    # 6dp (not 9) half-away-from-zero: the two sides sum floats in
    # different orders (~1e-14 drift after ~21 iterations), and at ~4e3
    # nodes the odds of a value within drift of a 9dp rounding boundary
    # are no longer negligible — the same margin law as
    # pagerank_lineitem.
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "page_rank": pa.array(
                _round6_half_away(list(ranks)), pa.float64()
            ),
        }
    )


def q_minhash_clusters(sf_dir: str):
    from .extras.dedup import minhash_dedup_clusters

    return minhash_dedup_clusters(
        _docs_text(sf_dir),
        threshold=MINHASH_THRESHOLD,
        num_bands=MINHASH_BANDS,
        rows_per_band=MINHASH_ROWS_PER_BAND,
        shingle_k=NGRAM_K,
    )


def q_simhash(sf_dir: str):
    from .extras.dedup import simhash_fingerprints

    return simhash_fingerprints(_docs_text(sf_dir))


def q_fingerprints(sf_dir: str):
    return doc_fingerprints(_docs_text(sf_dir))


def q_ann_lsh(sf_dir: str):
    """LSH-bucketed approximate ANN (scale path of q_ann_topk).
    Rows-only, justified: the hyperplanes are seeded
    ``np.random.default_rng`` gaussians — not reproducible in SQL; the
    exact-scoring baseline it approximates is the SQL-oracled
    ``ann_topk``, and bucket/recall behavior is pytest-pinned."""
    import ray.data as rd
    from .extras.similarity import ann_topk_lsh

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return ann_topk_lsh(ds, _query_vec(ds), k=ANN_K)


def q_ann_pq(sf_dir: str):
    """Product-quantization ANN (Jégou et al. 2011): per-subspace
    codebooks from a deterministic sample, corpus encoded to m bytes per
    vector, asymmetric-distance top-k via broadcast lookup tables.
    Rows-only, justified: the codebooks come from iterative k-means (a
    float fixpoint with argmin ties) — not SQL-replayable; encode/ADC
    laws are pytest-pinned and the exact baseline is SQL-oracled
    (``ann_topk``)."""
    import ray.data as rd

    from .extras.similarity import ann_topk_pq, pq_encode, pq_train

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    books = pq_train(ds, m_subspaces=8, n_codes=16)
    codes = pq_encode(ds, books)
    return ann_topk_pq(codes, books, _query_vec(ds), k=ANN_K)


def q_ann_ivf(sf_dir: str):
    """IVF-probed approximate ANN (the other scale path of q_ann_topk):
    sampled spherical-kmeans centroids, distributed list assignment,
    nprobe-pruned exact re-scoring with distributed partial top-k.
    Rows-only, justified: nprobe < n_lists makes the result depend on
    the iterative k-means centroids (not SQL-replayable); the
    FULL-probe variants ``ann_ivf_full`` / ``ann_ivf_persisted`` ARE
    SQL-oracled (full probe == exact brute force by theorem)."""
    import ray.data as rd
    from .extras.similarity import ann_topk_ivf

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return ann_topk_ivf(ds, _query_vec(ds), k=ANN_K, n_lists=8, nprobe=3)


def q_ann_ivf_full(sf_dir: str):
    """IVF at nprobe == n_lists: exercises the full IVF machinery
    (kmeans train, list assignment, per-list pruned scoring) while being
    exact by construction — shares the brute-force SQL oracle."""
    import ray.data as rd
    from .extras.similarity import ann_topk_ivf

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    out = ann_topk_ivf(ds, _query_vec(ds), k=ANN_K, n_lists=8, nprobe=8)
    return out.select(["rank", "vec_id", "cos"])


def q_ann_ivf_persisted(sf_dir: str):
    """IVF over a PERSISTED index (ivf_build → ivf_query): the serving
    pattern — centroids trained and lists written once, probes read only
    their lists' files.  nprobe == n_lists makes it exact, so it shares
    the brute-force SQL oracle.  The index is cached per corpus and
    reused across calls (the whole point of persistence)."""
    import hashlib
    import json

    import ray.data as rd
    from .extras.similarity import ivf_build, ivf_query

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    ds = rd.read_parquet(emb_path)
    key = hashlib.sha256(os.path.abspath(emb_path).encode()).hexdigest()[:16]
    idx = os.path.join("/tmp", "seekr_ivf_cache", key)
    meta_path = os.path.join(idx, "meta.json")
    n_rows = ds.count()
    reuse = False
    if os.path.isfile(os.path.join(idx, "_SUCCESS")):
        with open(meta_path) as f:
            reuse = json.load(f).get("n_vectors") == n_rows
    if not reuse:
        import shutil

        shutil.rmtree(idx, ignore_errors=True)
        os.makedirs(idx, exist_ok=True)
        ivf_build(ds, idx, n_lists=8)
    out = ivf_query(idx, _query_vec(ds), k=ANN_K, nprobe=8)
    return out.select(["rank", "vec_id", "cos"])


def q_embedding_neardup_lsh(sf_dir: str):
    """Sub-quadratic scale path of q_embedding_neardup: hyperplane-LSH
    buckets + intra-bucket exact cosine.  Rows-only, justified: seeded
    rng hyperplanes are not SQL-reproducible; the exact operator it
    approximates (``embedding_neardup``) is SQL-oracled and driver
    green, and recall vs it is pytest-asserted."""
    import ray.data as rd
    from .extras.dedup import embedding_neardup_lsh

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return embedding_neardup_lsh(
        ds, NEARDUP_THRESHOLD, id_limit=NEARDUP_LIMIT, nbits=2
    )


def q_multimodal_features(sf_dir: str):
    """Actor-pool decode + feature extraction over the synthesized
    binary media table (P6 PPM images, PCM16 WAV audio, PV01 video).
    Rows-only, justified: byte-level binary decode has no SQL form;
    decode laws are pytest-pinned by round-trip tests
    (tests/test_multimodal*.py) and the synthesized inputs are
    deterministic."""
    import ray.data as rd
    from .extras.multimodal import extract_media_features, synthesize_media_table

    n = _corpus_rows_for(sf_dir) // 2
    media = rd.from_arrow(synthesize_media_table(n))
    out = extract_media_features(media)
    return out.map_batches(
        lambda b: b.drop_columns(["features"]).append_column(
            "feat_sum",
            pa.array(
                [round(float(sum(f)), 6) for f in b["features"].to_pylist()],
                pa.float64(),
            ),
        ),
        batch_format="pyarrow",
    )


ROLLING_FRAME = 3  # rolling-mean window width (rows)


def q_corr_qty_discount(sf_dir: str):
    """Per-returnflag Pearson correlation + sample covariance between
    quantity and discount — exact integer sufficient statistics (qty is
    integral, discount integral in cents), O(groups) exchange."""
    import ray.data as rd

    from .extras.stats import grouped_corr

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_quantity", "l_discount"],
    )
    return grouped_corr(
        ds,
        key_col="l_returnflag",
        x_col="l_quantity",
        y_col="l_discount",
        x_scale=1,
        y_scale=100,
    )


def q_spearman_qty_discount(sf_dir: str):
    """Per-returnflag Spearman rank correlation (average tie ranks)
    between quantity and discount — monotonic association, robust to the
    value scale Pearson (q_corr_qty_discount) is tied to.  Exact: the
    per-group joint histogram is the only exchange, doubled tie ranks
    are integers, and the float finish is mirrored term-for-term by the
    oracle."""
    import ray.data as rd

    from .extras.stats import grouped_spearman

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_quantity", "l_discount"],
    )
    return grouped_spearman(
        ds,
        key_col="l_returnflag",
        x_col="l_quantity",
        y_col="l_discount",
        x_scale=1,
        y_scale=100,
    )


def q_user_type_profile(sf_dir: str):
    """Per-user sorted distinct event-type profile string — the
    string_agg(DISTINCT ... ORDER BY ...) set-valued feature; exchange
    bounded by the type domain per user, never by event count."""
    import ray.data as rd

    from .extras.features import user_type_profile

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "event_type"],
    )
    return user_type_profile(ds)


def q_interleave_order(sf_dir: str):
    """Balanced deterministic source interleaving for training epochs:
    per-source md5 rank via the prefix-sum discipline, global position
    from the closed form over the O(sources) size table (no global
    sort)."""
    import ray.data as rd

    from .extras.split import interleave_order

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source"],
    )
    return interleave_order(ds, key_col="source", id_col="doc_id")


KANON_K = 5
KANON_CHARS_BUCKET = 256


def q_kanon_risk(sf_dir: str):
    """k-anonymity risk screen: quasi-identifier combinations
    (lang, source, n_chars bucket) occurring fewer than k times — the
    re-identification audit a release pipeline runs before publishing.
    Integer bucket arithmetic, one O(groups) exchange."""
    import ray.data as rd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["lang", "source", "n_chars"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        nb = (
            batch["n_chars"].to_numpy(zero_copy_only=False)
            // KANON_CHARS_BUCKET
        ).astype(np.int64)
        tbl = pa.table(
            {
                "lang": batch["lang"],
                "source": batch["source"],
                "size_bucket": pa.array(nb, pa.int64()),
            }
        )
        agg = tbl.group_by(["lang", "source", "size_bucket"]).aggregate(
            [([], "count_all")]
        )
        return agg.rename_columns(["lang", "source", "size_bucket", "_c"])

    def finalize(batch: pa.Table) -> pa.Table:
        n = pc.cast(batch["sum(_c)"], pa.int64())
        keep = pc.less(n, KANON_K)
        return pa.table(
            {
                "lang": batch["lang"],
                "source": batch["source"],
                "size_bucket": batch["size_bucket"],
                "n": n,
            }
        ).filter(keep)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source", "size_bucket"])
        .sum("_c")
        .map_batches(finalize, batch_format="pyarrow")
    )


_CORR_COLS = [
    ("l_quantity", 1),
    ("l_extendedprice", 100),
    ("l_discount", 100),
    ("l_tax", 100),
]


def q_corr_matrix(sf_dir: str):
    """Pairwise Pearson correlation matrix over four lineitem measures
    in ONE pass: every Σx, Σx², Σxy partial is an exact integer
    aggregated per block, so the 6 correlations cost one narrow scan —
    the profiling step that would otherwise re-read the fact table per
    pair.  Float finish per pair mirrored by the oracle."""
    import ray.data as rd

    cols = [c for c, _ in _CORR_COLS]
    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"), columns=cols
    )
    names = [c.replace("l_", "") for c in cols]
    pairs = [
        (i, j) for i in range(len(cols)) for j in range(len(cols)) if i < j
    ]

    def partial(batch: pa.Table) -> pa.Table:
        xs = [
            np.rint(
                batch[c].to_numpy(zero_copy_only=False) * s
            ).astype(np.int64)
            for c, s in _CORR_COLS
        ]
        out = {"_n": pa.array([len(xs[0])], pa.int64())}
        for i, x in enumerate(xs):
            out[f"_s{i}"] = pa.array([int(x.sum())], pa.int64())
            out[f"_q{i}"] = pa.array([int((x * x).sum())], pa.int64())
        for i, j in pairs:
            out[f"_p{i}{j}"] = pa.array(
                [int((xs[i] * xs[j]).sum())], pa.int64()
            )
        return pa.table(out)

    agg_cols = (
        ["_n"]
        + [f"_s{i}" for i in range(len(cols))]
        + [f"_q{i}" for i in range(len(cols))]
        + [f"_p{i}{j}" for i, j in pairs]
    )
    summed = (
        ds.map_batches(partial, batch_format="pyarrow")
        .sum(agg_cols)
    )
    g = {k.replace("sum(", "").rstrip(")"): v for k, v in summed.items()}
    n = float(g["_n"])
    out_a, out_b, out_c = [], [], []
    for i, j in pairs:
        sx, sy = float(g[f"_s{i}"]), float(g[f"_s{j}"])
        sxx, syy = float(g[f"_q{i}"]), float(g[f"_q{j}"])
        sxy = float(g[f"_p{i}{j}"])
        var_prod = (sxx - sx * sx / n) * (syy - sy * sy / n)
        r = (sxy - sx * sy / n) / math.sqrt(var_prod) if var_prod > 0 else 0.0
        out_a.append(names[i])
        out_b.append(names[j])
        out_c.append(round6(r))
    return pa.table(
        {
            "col_a": pa.array(out_a, pa.string()),
            "col_b": pa.array(out_b, pa.string()),
            "corr": pa.array(out_c, pa.float64()),
        }
    )


def q_benford_price(sf_dir: str):
    """Benford first-digit screen over order totals: observed counts of
    the leading cent digit vs log10(1 + 1/d) expectations, with the
    floor-quantized chi2 contribution per digit (order-free sum) — the
    fraud/synthetic-data smell test.  Digit extraction is pure integer
    division, bit-equal to the VARCHAR-substring SQL."""
    import ray.data as rd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_totalprice"]
    )

    def digits(batch: pa.Table) -> pa.Table:
        c = np.rint(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        d = np.abs(c)
        for _ in range(18):
            big = d >= 10
            if not big.any():
                break
            d[big] //= 10
        tbl = pa.table({"digit": pa.array(d, pa.int64())})
        agg = tbl.group_by(["digit"]).aggregate([([], "count_all")])
        return agg.rename_columns(["digit", "_c"])

    counts = (
        ds.map_batches(digits, batch_format="pyarrow")
        .groupby("digit")
        .sum("_c")
    ).to_pandas()
    counts = counts.rename(columns={"sum(_c)": "n"}).sort_values("digit")
    total = int(counts["n"].sum())
    digs, ns, exps, chis = [], [], [], []
    for d, n_d in zip(counts["digit"], counts["n"]):
        e = float(total) * math.log10(1.0 + 1.0 / float(d))
        contrib = (float(n_d) - e) * (float(n_d) - e) / e
        digs.append(int(d))
        ns.append(int(n_d))
        exps.append(round6(e))
        chis.append(math.floor(contrib * 1000000.0) / 1000000.0)
    return pa.table(
        {
            "digit": pa.array(digs, pa.int64()),
            "n": pa.array(ns, pa.int64()),
            "expected": pa.array(exps, pa.float64()),
            "chi2_part": pa.array(chis, pa.float64()),
        }
    )


def q_seasonality_strength(sf_dir: str):
    """Hour-of-day seasonality strength per event type: one-way ANOVA
    eta² of the per-(date, hour) counts grouped by hour-of-day — how
    much of the hourly-count variance the clock explains.  Integer
    sufficient statistics per (type, hod) are the only exchange; the
    SS_between / SS_total float finish is mirrored by the oracle."""
    import ray.data as rd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "ts"]
    )

    def cell_counts(batch: pa.Table) -> pa.Table:
        h = pc.cast(
            pc.floor_temporal(batch["ts"], unit="hour"), pa.timestamp("us")
        )
        tbl = pa.table({"event_type": batch["event_type"], "h": h})
        agg = tbl.group_by(["event_type", "h"]).aggregate([([], "count_all")])
        return agg.rename_columns(["event_type", "h", "_c"])

    cells = (
        ds.map_batches(cell_counts, batch_format="pyarrow")
        .groupby(["event_type", "h"])
        .sum("_c")
    ).to_pandas()
    cells = cells.rename(columns={"sum(_c)": "c"})
    cells["hod"] = cells["h"].astype("datetime64[us]").dt.hour.astype("int64")
    types, etas, nh = [], [], []
    for t, sub in cells.groupby("event_type", sort=True):
        n = len(sub)
        sc = int(sub["c"].sum())
        sc2 = int((sub["c"].astype("int64") ** 2).sum())
        ss_total = float(sc2) - float(sc) * float(sc) / float(n)
        # per-hod contributions floor-quantized at 1e-6 and integer-
        # summed (the chi2/lang_kl convention) — float-order-free on
        # both sides
        sb_q = 0
        for _, hs in sub.groupby("hod", sort=True):
            shc = int(hs["c"].sum())
            sb_q += math.floor(
                float(shc) * float(shc) / float(len(hs)) * 1000000.0
            )
        ss_between = float(sb_q) / 1000000.0 - float(sc) * float(sc) / float(n)
        eta2 = ss_between / ss_total if ss_total > 0 else 0.0
        types.append(t)
        nh.append(n)
        etas.append(round6(eta2))
    return pa.table(
        {
            "event_type": pa.array(types, pa.string()),
            "n_hours": pa.array(nh, pa.int64()),
            "eta2": pa.array(etas, pa.float64()),
        }
    )


def q_local_clustering(sf_dir: str):
    """Per-node local clustering coefficient over the support-≥2
    co-purchase graph (same edges as q_kcore): per-source wedge-probe
    attribution, count()-gated driver/distributed paths."""
    from .extras.lcc import local_clustering

    edges = _copurchase_support_edges(sf_dir, KCORE_MIN_SUPPORT)
    return local_clustering(edges)


def q_gini_revenue(sf_dir: str):
    """Exact Gini coefficient of per-customer order revenue — the
    concentration/inequality summary; rank-weighted sum via bucketed
    prefix-sum ranks, arbitrary-precision partials."""
    import ray.data as rd

    from .extras.stats import gini_coefficient

    ds = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_totalprice"],
    )

    def to_cents(batch: pa.Table) -> pa.Table:
        c = np.rint(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        tbl = pa.table(
            {"o_custkey": batch["o_custkey"], "cents": pa.array(c, pa.int64())}
        )
        agg = tbl.group_by(["o_custkey"]).aggregate([("cents", "sum")])
        return agg.rename_columns(["o_custkey", "cents"])

    rev = (
        ds.map_batches(to_cents, batch_format="pyarrow")
        .groupby("o_custkey")
        .sum("cents")
        .map_batches(
            lambda b: pa.table(
                {
                    "o_custkey": b["o_custkey"],
                    "cents": pc.cast(b["sum(cents)"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )
    return gini_coefficient(rev, val_col="cents", id_col="o_custkey")


def q_fano_burstiness(sf_dir: str):
    """Per-event-type Fano factor (var/mean of hourly counts over
    observed hours) — the burstiness screen; integer sufficient
    statistics only."""
    import ray.data as rd

    from .extras.stats import grouped_fano

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "ts"]
    )

    def hour_bucket(batch: pa.Table) -> pa.Table:
        h = pc.cast(
            pc.floor_temporal(batch["ts"], unit="hour"), pa.timestamp("us")
        )
        return pa.table({"event_type": batch["event_type"], "hour": h})

    return grouped_fano(
        ds.map_batches(hour_bucket, batch_format="pyarrow"),
        key_col="event_type",
        bucket_col="hour",
    )


AB_SALT = "ab1"


def q_ab_test_z(sf_dir: str):
    """Two-proportion z-test between md5-hash split arms: arm =
    md5(salt || user) % 2, conversion = user has >= 1 purchase event.
    Integer counts are the only exchange; the pooled-variance z
    expression is mirrored term-for-term."""
    import ray.data as rd

    from .extras.stats import _md5_le64

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "event_type"],
    )

    def per_user(batch: pa.Table) -> pa.Table:
        tbl = pa.table(
            {
                "user_id": batch["user_id"],
                "conv": pc.cast(
                    pc.equal(batch["event_type"], "purchase"), pa.int64()
                ),
            }
        )
        agg = tbl.group_by(["user_id"]).aggregate([("conv", "max")])
        return agg.rename_columns(["user_id", "conv"])

    users = (
        ds.map_batches(per_user, batch_format="pyarrow")
        .groupby("user_id")
        .max("conv")
    ).to_pandas()
    # arms are O(2): the user reduce above is the only exchange, the
    # arm assignment + z finish run on the tiny per-user frame...
    # at web scale fold the arm tag into per_user and groupby the arm
    arm = _md5_le64(users["user_id"].tolist(), AB_SALT) % 2
    conv = users["max(conv)"].to_numpy().astype(np.int64)
    n_a = int((arm == 0).sum())
    n_b = int((arm == 1).sum())
    c_a = int(conv[arm == 0].sum())
    c_b = int(conv[arm == 1].sum())
    p_a = float(c_a) / float(n_a)
    p_b = float(c_b) / float(n_b)
    p = float(c_a + c_b) / float(n_a + n_b)
    se = math.sqrt(p * (1.0 - p) * (1.0 / n_a + 1.0 / n_b))
    z = (p_a - p_b) / se if se > 0 else 0.0
    return pa.table(
        {
            "n_a": pa.array([n_a], pa.int64()),
            "n_b": pa.array([n_b], pa.int64()),
            "conv_a": pa.array([c_a], pa.int64()),
            "conv_b": pa.array([c_b], pa.int64()),
            "z": pa.array([round6(z)], pa.float64()),
        }
    )


def q_sliding_distinct_users(sf_dir: str):
    """Trailing-24h unique users per hour (dense grid) — exact sliding
    COUNT(DISTINCT) via per-user interval union + diff markers; marker
    volume is O(activity spells), never O(grid × events)."""
    import ray.data as rd

    from .extras.windows import sliding_distinct_users

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )
    return sliding_distinct_users(ds, window_hours=24)


def q_pricing_summary(sf_dir: str):
    """TPC-H Q1 pricing summary: per (returnflag, linestatus) the four
    classic sums (qty, base price, discounted price, charge), three
    means, and the row count, over a shipdate cutoff.  Exact integer
    sufficient statistics — cents × integer-percent products
    (pc·(100−disc)·(100+tax)) sum as int64, every float division is
    mirrored operation-for-operation by the oracle.  Ceiling: per-group
    Σ pc·1e4 must stay < 2^63 (fine to ~sf10; carry decimal128 partials
    beyond)."""
    import ray.data as rd

    cutoff = np.datetime64("2001-06-30T00:00:00", "us")

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_shipdate",
        ],
    )

    def partial(batch: pa.Table) -> pa.Table:
        ship = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        keep = ship <= cutoff
        q = np.rint(
            batch["l_quantity"].to_numpy(zero_copy_only=False)[keep]
        ).astype(np.int64)
        pc = np.rint(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
            * 100.0
        ).astype(np.int64)
        dp = np.rint(
            batch["l_discount"].to_numpy(zero_copy_only=False)[keep] * 100.0
        ).astype(np.int64)
        tp = np.rint(
            batch["l_tax"].to_numpy(zero_copy_only=False)[keep] * 100.0
        ).astype(np.int64)
        pdp = pc * (100 - dp)
        tbl = pa.table(
            {
                "l_returnflag": pa.array(
                    batch["l_returnflag"].to_numpy(zero_copy_only=False)[
                        keep
                    ],
                    pa.string(),
                ),
                "l_linestatus": pa.array(
                    batch["l_linestatus"].to_numpy(zero_copy_only=False)[
                        keep
                    ],
                    pa.string(),
                ),
                "_n": pa.array(np.ones(len(q), np.int64), pa.int64()),
                "_sq": pa.array(q, pa.int64()),
                "_spc": pa.array(pc, pa.int64()),
                "_sdp": pa.array(pdp, pa.int64()),
                "_sch": pa.array(pdp * (100 + tp), pa.int64()),
                "_sdisc": pa.array(dp, pa.int64()),
            }
        )
        agg = tbl.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [(c, "sum") for c in ["_n", "_sq", "_spc", "_sdp", "_sch", "_sdisc"]]
        )
        # strip Arrow's _sum suffixes so the Dataset groupby re-sums them
        return pa.table(
            {
                "l_returnflag": agg["l_returnflag"],
                "l_linestatus": agg["l_linestatus"],
                **{
                    c: agg[f"{c}_sum"]
                    for c in ["_n", "_sq", "_spc", "_sdp", "_sch", "_sdisc"]
                },
            }
        )

    def finalize(batch: pa.Table) -> pa.Table:
        n = batch["sum(_n)"].to_numpy(zero_copy_only=False).astype(np.float64)
        sq = batch["sum(_sq)"].to_numpy(zero_copy_only=False)
        spc = batch["sum(_spc)"].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        sdp = batch["sum(_sdp)"].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        sch = batch["sum(_sch)"].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        sdisc = batch["sum(_sdisc)"].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "sum_qty": pa.array(sq, pa.int64()),
                "sum_base_price": pa.array(
                    round6_arr(spc / 100.0), pa.float64()
                ),
                "sum_disc_price": pa.array(
                    round6_arr(sdp / 10000.0), pa.float64()
                ),
                "sum_charge": pa.array(
                    round6_arr(sch / 1000000.0), pa.float64()
                ),
                "avg_qty": pa.array(
                    round6_arr(sq.astype(np.float64) / n), pa.float64()
                ),
                "avg_price": pa.array(
                    round6_arr(spc / 100.0 / n), pa.float64()
                ),
                "avg_disc": pa.array(
                    round6_arr(sdisc / 100.0 / n), pa.float64()
                ),
                "count_order": pa.array(
                    n.astype(np.int64), pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .sum(["_n", "_sq", "_spc", "_sdp", "_sch", "_sdisc"])
        .map_batches(finalize, batch_format="pyarrow")
    )


def q_chi2_lang_source(sf_dir: str):
    """Chi-square independence test of documents lang × source — the
    categorical-association screen of a data profiler.  Exact integer
    contingency counts cross the exchange; each cell's (o−e)²/e
    contribution is floor-quantized at 1e-6 and summed as an integer
    (order-free, the lang_kl convention), so the statistic is bit-stable
    at any parallelism and SQL-replicable."""
    import ray.data as rd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["lang", "source"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        agg = batch.group_by(["lang", "source"]).aggregate(
            [([], "count_all")]
        )
        return agg.rename_columns(["lang", "source", "_c"])

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .sum("_c")
    ).to_pandas()
    cells = cells.rename(columns={"sum(_c)": "o"})
    n = int(cells["o"].sum())
    r = cells.groupby("lang")["o"].sum()
    c = cells.groupby("source")["o"].sum()
    quant = 0
    for _, row in cells.iterrows():
        e = float(r[row["lang"]]) * float(c[row["source"]]) / float(n)
        o = float(row["o"])
        quant += int(np.floor((o - e) * (o - e) / e * 1000000.0))
    dof = (len(r) - 1) * (len(c) - 1)
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "dof": pa.array([dof], pa.int64()),
            "chi2": pa.array([quant / 1000000.0], pa.float64()),
        }
    )


KM_HORIZONS_US = (
    3_600_000_000,  # 1 h
    21_600_000_000,  # 6 h
    86_400_000_000,  # 24 h
    259_200_000_000,  # 72 h
)
_KM_NEG_INF_Q = -2_000_000_000_000  # ln(0) sentinel: exp -> 0.0 both sides


def q_km_view_to_purchase(sf_dir: str):
    """Kaplan-Meier survival of the view→purchase conversion: for every
    user with a view, time from FIRST view to FIRST subsequent purchase
    (right-censored at the stream end), S(t) evaluated at 1/6/24/72 h —
    the time-to-event curve behind conversion SLAs, with censoring
    handled properly instead of the biased 'mean time of converters'.

    Per-user (duration, event) reduces in one groupby exchange; the
    O(users) finalize computes the product limit as
    exp(Σ ln(1 - d_j/n_j)) with per-term 1e-9 floor-quantized integer
    sums (order-free; a saturated risk set uses a -inf sentinel that
    rounds to exactly 0.0 on both sides).

    Output: ``(horizon_us, s)`` (6dp)."""
    import ray.data as rd

    from .extras.textstats import round6

    path = os.path.join(sf_dir, "events.parquet")
    _, tmax = _events_ts_bounds_us(path)
    ds = rd.read_parquet(
        path, columns=["ts", "user_id", "event_type"]
    )

    def tag(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        m = (et == "view") | (et == "purchase")
        k = batch["user_id"].to_numpy(zero_copy_only=False)[m]
        t = pc.cast(batch["ts"], pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        ).view("int64")[m]
        return pa.table(
            {
                "k": pa.array(k, pa.int64()),
                "t": pa.array(t, pa.int64()),
                "isp": pa.array((et[m] == "purchase").astype(np.int8)),
            }
        )

    def per_user(group: pa.Table) -> pa.Table:
        u = group["k"][0].as_py()
        t = group["t"].to_numpy(zero_copy_only=False)
        isp = group["isp"].to_numpy(zero_copy_only=False).astype(bool)
        vt = t[~isp]
        if len(vt) == 0:
            return pa.table(
                {
                    "k": pa.array([], pa.int64()),
                    "v0": pa.array([], pa.int64()),
                    "pafter": pa.array([], pa.int64()),
                }
            )
        v0 = int(vt.min())
        # first purchase AT OR AFTER the first view (the SQL mirror
        # filters purchases >= t0; an earlier purchase doesn't convert
        # THIS view funnel)
        pt = t[isp & (t >= v0)]
        pafter = int(pt.min()) if len(pt) else (1 << 62)
        return pa.table(
            {
                "k": pa.array([u], pa.int64()),
                "v0": pa.array([v0], pa.int64()),
                "pafter": pa.array([pafter], pa.int64()),
            }
        )

    agg = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("k")
        .map_groups(per_user, batch_format="pyarrow")
    )
    t = pa.concat_tables(list(agg.iter_batches(batch_format="pyarrow")))
    v0 = t["v0"].to_numpy(zero_copy_only=False)
    p0 = t["pafter"].to_numpy(zero_copy_only=False)
    ev = p0 < (1 << 62)
    dur = np.where(ev, p0 - v0, tmax - v0)
    # KM over distinct event times
    taus = np.unique(dur[ev])
    qsum = 0
    out_h, out_s = [], []
    sorted_dur = np.sort(dur)
    n_total = len(dur)
    ti = 0
    for h in KM_HORIZONS_US:
        while ti < len(taus) and taus[ti] <= h:
            tau = taus[ti]
            dj = int((dur[ev] == tau).sum())
            nj = n_total - int(np.searchsorted(sorted_dur, tau, side="left"))
            if dj >= nj:
                qsum += _KM_NEG_INF_Q
            else:
                qsum += int(
                    np.floor(np.log(1.0 - dj / float(nj)) * 1e9)
                )
            ti += 1
        out_h.append(int(h))
        out_s.append(round6(float(np.exp(qsum / 1e9))))
    return pa.table(
        {
            "horizon_us": pa.array(out_h, pa.int64()),
            "s": pa.array(out_s, pa.float64()),
        }
    )


def q_logrank_conversion(sf_dir: str):
    """Log-rank test between two md5-assigned arms on the view→purchase
    survival curves — the censoring-correct A/B comparison (a mean-lag
    t-test throws censored users away; KM + log-rank keeps them).
    Same subjects as km_view_to_purchase, arm = md5(user ':lr') % 2;
    O - E and the hypergeometric variance accumulate as 1e-9
    floor-quantized integers over event times (order-free), one
    mirrored z expression.

    Output: one row ``(n_arm0, n_arm1, z)`` (6dp)."""
    import hashlib

    import ray.data as rd

    from .extras.textstats import round6

    path = os.path.join(sf_dir, "events.parquet")
    _, tmax = _events_ts_bounds_us(path)
    ds = rd.read_parquet(path, columns=["ts", "user_id", "event_type"])

    def tag(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        m = (et == "view") | (et == "purchase")
        k = batch["user_id"].to_numpy(zero_copy_only=False)[m]
        t = pc.cast(batch["ts"], pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        ).view("int64")[m]
        return pa.table(
            {
                "k": pa.array(k, pa.int64()),
                "t": pa.array(t, pa.int64()),
                "isp": pa.array((et[m] == "purchase").astype(np.int8)),
            }
        )

    def per_user(group: pa.Table) -> pa.Table:
        u = group["k"][0].as_py()
        t = group["t"].to_numpy(zero_copy_only=False)
        isp = group["isp"].to_numpy(zero_copy_only=False).astype(bool)
        vt = t[~isp]
        if len(vt) == 0:
            return pa.table(
                {
                    "k": pa.array([], pa.int64()),
                    "v0": pa.array([], pa.int64()),
                    "pafter": pa.array([], pa.int64()),
                }
            )
        v0 = int(vt.min())
        pt = t[isp & (t >= v0)]
        pafter = int(pt.min()) if len(pt) else (1 << 62)
        return pa.table(
            {
                "k": pa.array([u], pa.int64()),
                "v0": pa.array([v0], pa.int64()),
                "pafter": pa.array([pafter], pa.int64()),
            }
        )

    agg = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("k")
        .map_groups(per_user, batch_format="pyarrow")
    )
    t = pa.concat_tables(list(agg.iter_batches(batch_format="pyarrow")))
    users = t["k"].to_numpy(zero_copy_only=False)
    v0 = t["v0"].to_numpy(zero_copy_only=False)
    p0 = t["pafter"].to_numpy(zero_copy_only=False)
    ev = p0 < (1 << 62)
    dur = np.where(ev, p0 - v0, tmax - v0)
    arm = np.array(
        [
            int.from_bytes(
                hashlib.md5(f"{u}:lr".encode()).digest()[:8], "little"
            )
            % 2
            for u in users.tolist()
        ],
        dtype=np.int64,
    )
    n0_total = int((arm == 0).sum())
    n1_total = int((arm == 1).sum())
    sorted_all = np.sort(dur)
    sorted_a0 = np.sort(dur[arm == 0])
    ev_dur = dur[ev]
    ev_arm = arm[ev]
    o1 = 0
    e_q = 0
    v_q = 0
    for tau in np.unique(ev_dur).tolist():
        d = int((ev_dur == tau).sum())
        d0 = int(((ev_dur == tau) & (ev_arm == 0)).sum())
        n = len(dur) - int(np.searchsorted(sorted_all, tau, side="left"))
        n0 = len(sorted_a0) - int(
            np.searchsorted(sorted_a0, tau, side="left")
        )
        o1 += d0
        frac = n0 / float(n)
        e_q += int(np.floor(d * frac * 1e9))
        if n > 1:
            v_q += int(
                np.floor(
                    d * frac * (1.0 - frac) * ((n - d) / (n - 1.0)) * 1e9
                )
            )
    vv = v_q / 1e9
    z = (o1 - e_q / 1e9) / (vv**0.5) if vv > 0 else 0.0
    return pa.table(
        {
            "n_arm0": pa.array([n0_total], pa.int64()),
            "n_arm1": pa.array([n1_total], pa.int64()),
            "z": pa.array([round6(z)], pa.float64()),
        }
    )


HILL_K = 100


def q_degree_hill_tail(sf_dir: str):
    """Hill estimator of the co-purchase degree distribution's tail
    exponent over the top-k degrees: alpha = k / Σ ln(d_i / d_(k+1)) —
    'how heavy is the hub tail?' decides the salting / partition-skew
    strategy for any graph stage.  Degrees reduce distributedly (the
    shared edge builder); the O(k) finalize uses rank order
    (degree desc, node asc) with 1e-9-quantized integer ln sums
    (order-free).

    Output: one row ``(n_nodes, k, alpha)`` (6dp)."""
    from .extras.textstats import round6

    edges = _copurchase_support_edges(sf_dir, KCORE_MIN_SUPPORT)

    def degs(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        u, cnt = np.unique(np.concatenate([a, b]), return_counts=True)
        return pa.table(
            {"node": pa.array(u), "_d": pa.array(cnt.astype(np.int64))}
        )

    agg = (
        edges.map_batches(degs, batch_format="pyarrow")
        .groupby("node")
        .sum("_d")
    )
    t = pa.concat_tables(list(agg.iter_batches(batch_format="pyarrow")))
    node = t["node"].to_numpy(zero_copy_only=False)
    d = t["sum(_d)"].to_numpy(zero_copy_only=False)
    order = np.lexsort((node, -d))
    d = d[order]
    n = len(d)
    k = min(HILL_K, n - 1)
    if k <= 0:
        alpha = 0.0
    else:
        ref = float(d[k])  # the (k+1)-th largest degree
        terms = np.log(d[:k].astype(np.float64) / ref)
        quant = int(np.floor(terms * 1e9).sum())
        denom = quant / 1e9
        alpha = k / denom if denom > 0 else 0.0
    return pa.table(
        {
            "n_nodes": pa.array([n], pa.int64()),
            "k": pa.array([k], pa.int64()),
            "alpha": pa.array([round6(alpha)], pa.float64()),
        }
    )


def q_source_pair_jsd(sf_dir: str):
    """Jensen-Shannon divergence (bits) between every pair of source
    unigram profiles — the symmetric, bounded domain-distance matrix of
    a corpus-mixing recipe (lang_kl measures slice-vs-blend; this
    measures slice-vs-slice).  Per-block (source, token, c) partials,
    one O(sources x vocab) exchange; per-term contributions are
    floor-quantized at 1e-6 and summed as integers (the lang_kl
    convention), so the matrix is order-free.  The O(sources x vocab)
    finalize is vocabulary-bounded; at open vocabularies the per-token
    pair partials co-locate in the crc-bucketed reduce
    (extras/divergence.py discipline).

    Output: ``(source_a, source_b, jsd_bits)`` (6dp, a < b)."""
    import ray.data as rd

    from .extras.textstats import round6, simple_tokens

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["source", "text"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        acc: dict[tuple[str, str], int] = {}
        for src, t in zip(
            batch["source"].to_pylist(), batch["text"].to_pylist()
        ):
            for tok in simple_tokens(t or ""):
                acc[(src, tok)] = acc.get((src, tok), 0) + 1
        ks = list(acc.keys())
        return pa.table(
            {
                "source": pa.array([k[0] for k in ks], pa.string()),
                "t": pa.array([k[1] for k in ks], pa.string()),
                "_c": pa.array(list(acc.values()), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "t"])
        .sum("_c")
    )
    tbl = pa.concat_tables(list(agg.iter_batches(batch_format="pyarrow")))
    src = np.asarray(tbl["source"].to_pylist(), dtype=object)
    tok = np.asarray(tbl["t"].to_pylist(), dtype=object)
    c = tbl["sum(_c)"].to_numpy(zero_copy_only=False)
    sources = np.unique(src)
    toks_u, tok_id = np.unique(tok, return_inverse=True)
    counts = {}
    totals = {}
    for s in sources:
        m = src == s
        vec = np.zeros(len(toks_u), np.int64)
        vec[tok_id[m]] = c[m]
        counts[s] = vec
        totals[s] = int(vec.sum())
    a_out, b_out, j_out = [], [], []
    for i, sa in enumerate(sources):
        for sb in sources[i + 1 :]:
            ca, cb = counts[sa], counts[sb]
            na, nb = float(totals[sa]), float(totals[sb])
            pa_ = ca / na
            pb_ = cb / nb
            m = (pa_ + pb_) / 2.0
            with np.errstate(divide="ignore", invalid="ignore"):
                ta = np.where(ca > 0, pa_ * np.log2(pa_ / m), 0.0)
                tb = np.where(cb > 0, pb_ * np.log2(pb_ / m), 0.0)
            quant = int(np.floor((ta + tb) * 1e6).sum())
            a_out.append(str(sa))
            b_out.append(str(sb))
            j_out.append(round6((quant / 1e6) / 2.0))
    return pa.table(
        {
            "source_a": pa.array(a_out, pa.string()),
            "source_b": pa.array(b_out, pa.string()),
            "jsd_bits": pa.array(j_out, pa.float64()),
        }
    )


RFM_RECENT_DAYS = 60
RFM_FREQ_MIN = 8
RFM_MONEY_CENTS = 15_000_000  # 150k: the "big spender" line


def q_rfm_segments(sf_dir: str):
    """RFM segmentation histogram: every customer scored
    Recency (ordered within RFM_RECENT_DAYS of the last order date) x
    Frequency (>= RFM_FREQ_MIN orders) x Monetary (lifetime total >=
    150k) — the classic CRM segmentation as one integer-exact pipeline:
    per-customer (last_order_day, n_orders, cents) reduce in one
    exchange, fixed thresholds stamp 8 segments, O(segments) output.

    Output: ``(recent, frequent, big_spender, n_customers)``."""
    import ray.data as rd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        k = batch["o_custkey"].to_numpy(zero_copy_only=False)
        d = pc.cast(batch["o_orderdate"], pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        ).view("int64") // 86_400_000_000
        cents = np.rint(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        u, inv = np.unique(k, return_inverse=True)
        last = np.full(len(u), -(1 << 62), np.int64)
        np.maximum.at(last, inv, d)
        nord = np.bincount(inv, minlength=len(u)).astype(np.int64)
        s = np.bincount(inv, weights=cents, minlength=len(u)).astype(
            np.int64
        )
        return pa.table(
            {
                "k": pa.array(u),
                "_last": pa.array(last),
                "_n": pa.array(nord),
                "_s": pa.array(s),
            }
        )

    # one groupby computing all three reductions via map_groups keeps a
    # single exchange
    def per_cust(group: pa.Table) -> pa.Table:
        u = group["k"][0].as_py()
        return pa.table(
            {
                "k": pa.array([u], pa.int64()),
                "last": pa.array(
                    [int(pc.max(group["_last"]).as_py())], pa.int64()
                ),
                "n": pa.array([int(pc.sum(group["_n"]).as_py())], pa.int64()),
                "s": pa.array([int(pc.sum(group["_s"]).as_py())], pa.int64()),
            }
        )

    per = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("k")
        .map_groups(per_cust, batch_format="pyarrow")
    )
    t = pa.concat_tables(list(per.iter_batches(batch_format="pyarrow")))
    last = t["last"].to_numpy(zero_copy_only=False)
    n = t["n"].to_numpy(zero_copy_only=False)
    s = t["s"].to_numpy(zero_copy_only=False)
    horizon = int(last.max()) - RFM_RECENT_DAYS
    rec = (last >= horizon).astype(np.int64)
    freq = (n >= RFM_FREQ_MIN).astype(np.int64)
    big = (s >= RFM_MONEY_CENTS).astype(np.int64)
    seg = rec * 4 + freq * 2 + big
    cnt = np.bincount(seg, minlength=8)
    return pa.table(
        {
            "recent": pa.array((np.arange(8) >> 2) & 1, pa.int64()),
            "frequent": pa.array((np.arange(8) >> 1) & 1, pa.int64()),
            "big_spender": pa.array(np.arange(8) & 1, pa.int64()),
            "n_customers": pa.array(cnt.astype(np.int64), pa.int64()),
        }
    )


def q_pareto_share(sf_dir: str):
    """Pareto concentration: the revenue share of the top 20% of
    customers (by lifetime total, ties broken by custkey asc) — the
    80/20 KPI.  Per-customer exact cent totals reduce distributedly;
    the O(customers) rank finalize takes the top floor(n/5) and the
    single share division is mirrored.

    Output: one row ``(n_customers, top_n, share)`` (6dp)."""
    import ray.data as rd

    from .extras.textstats import round6

    ds = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_totalprice"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        k = batch["o_custkey"].to_numpy(zero_copy_only=False)
        cents = np.rint(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        u, inv = np.unique(k, return_inverse=True)
        s = np.bincount(inv, weights=cents, minlength=len(u)).astype(
            np.int64
        )
        return pa.table({"k": pa.array(u), "_s": pa.array(s)})

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("k")
        .sum("_s")
    )
    t = pa.concat_tables(list(agg.iter_batches(batch_format="pyarrow")))
    k = t["k"].to_numpy(zero_copy_only=False)
    s = t["sum(_s)"].to_numpy(zero_copy_only=False)
    order = np.lexsort((k, -s))
    s = s[order]
    n = len(s)
    top_n = n // 5
    total = int(s.sum())
    top = int(s[:top_n].sum())
    share = top / float(total) if total else 0.0
    return pa.table(
        {
            "n_customers": pa.array([n], pa.int64()),
            "top_n": pa.array([top_n], pa.int64()),
            "share": pa.array([round6(share)], pa.float64()),
        }
    )


def q_theil_revenue(sf_dir: str):
    """Theil index of per-customer revenue — the decomposable inequality
    measure next to the Gini entry: T = (1/n) Σ (x/μ) ln(x/μ).  Exact
    integer revenue cents reduce per customer; each customer's term is
    floor-quantized at 1e-9 and summed as an integer (the chi2
    convention), so the statistic is order-free and bit-stable.

    Output: one row ``(n_customers, theil)`` (6dp)."""
    import ray.data as rd

    from .extras.textstats import round6

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_totalprice"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        k = batch["o_custkey"].to_numpy(zero_copy_only=False)
        cents = np.rint(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        u, inv = np.unique(k, return_inverse=True)
        s = np.bincount(inv, weights=cents, minlength=len(u)).astype(np.int64)
        return pa.table({"k": pa.array(u), "_s": pa.array(s)})

    agg = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("k")
        .sum("_s")
    )
    t = pa.concat_tables(list(agg.iter_batches(batch_format="pyarrow")))
    s = t["sum(_s)"].to_numpy(zero_copy_only=False)
    n = len(s)
    total = int(s.sum())
    mu = total / float(n)
    ratio = s / mu
    with np.errstate(divide="ignore", invalid="ignore"):
        terms = np.where(ratio > 0, ratio * np.log(ratio), 0.0)
    quant = int(np.floor(terms * 1e9).sum())
    theil = (quant / 1e9) / n
    return pa.table(
        {
            "n_customers": pa.array([n], pa.int64()),
            "theil": pa.array([round6(theil)], pa.float64()),
        }
    )


def q_effective_sources(sf_dir: str):
    """Effective number of document sources (inverse Simpson / Hill
    number of order 2): D = N² / Σ n_i² — 'how many equally-sized
    sources is this corpus mix worth?'  Exact integers until the single
    mirrored division; the diversity KPI of a corpus-mixing recipe.

    Output: one row ``(n_docs, n_sources, effective)`` (6dp)."""
    import ray.data as rd

    from .extras.textstats import round6

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["source"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        agg = batch.group_by(["source"]).aggregate([([], "count_all")])
        return agg.rename_columns(["source", "_c"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .sum("_c")
    )
    t = pa.concat_tables(list(agg.iter_batches(batch_format="pyarrow")))
    c = t["sum(_c)"].to_numpy(zero_copy_only=False)
    n = int(c.sum())
    ss = int((c * c).sum())
    eff = (n * n) / float(ss) if ss else 0.0
    return pa.table(
        {
            "n_docs": pa.array([n], pa.int64()),
            "n_sources": pa.array([len(c)], pa.int64()),
            "effective": pa.array([round6(eff)], pa.float64()),
        }
    )


COVERAGE_KS = (10, 100, 1000)


def q_vocab_coverage(sf_dir: str):
    """Vocabulary coverage curve: the fraction of all corpus tokens
    covered by the top-k terms (k = 10/100/1000, count desc then term
    asc) — the lexicon-planning statistic behind tokenizer and stopword
    budgets.  Per-block term-count partials, one O(vocab) exchange;
    the O(vocab) driver finalize is bounded by the vocabulary (at open
    vocabularies the top-k comes from per-block partial top-K' with a
    count threshold refine — the topk_terms discipline).

    Output: ``(k, coverage)`` (6dp)."""
    import ray.data as rd

    from .extras.textstats import round6, simple_tokens

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        acc: dict[str, int] = {}
        for t in batch["text"].to_pylist():
            for tok in simple_tokens(t or ""):
                acc[tok] = acc.get(tok, 0) + 1
        return pa.table(
            {
                "term": pa.array(list(acc.keys()), pa.string()),
                "_c": pa.array(list(acc.values()), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .sum("_c")
    )
    t = pa.concat_tables(list(agg.iter_batches(batch_format="pyarrow")))
    terms = np.asarray(t["term"].to_pylist(), dtype=object)
    c = t["sum(_c)"].to_numpy(zero_copy_only=False)
    order = np.lexsort((terms, -c))
    c = c[order]
    total = int(c.sum())
    cum = np.cumsum(c)
    ks_out, cov_out = [], []
    for k in COVERAGE_KS:
        covered = int(cum[min(k, len(cum)) - 1]) if len(cum) else 0
        ks_out.append(k)
        cov_out.append(round6(covered / float(total)) if total else 0.0)
    return pa.table(
        {
            "k": pa.array(ks_out, pa.int64()),
            "coverage": pa.array(cov_out, pa.float64()),
        }
    )


ANOM_WINDOW = 8
ANOM_Z = 2.0


def q_rolling_anomaly(sf_dir: str):
    """Trailing-window anomaly flags: for each event with a FULL
    8-event trailing window (same user, (ts, id) order, window includes
    the current row), the z-score of its value against the window's
    population mean/std — the per-key streaming anomaly detector.
    Window sums of cents and cents² are exact int64 (cumsum diffs), so
    the statistic is parallelism-invariant; mean/var/z are the mirrored
    float expressions; zero-variance windows flag 0 with z = 0.

    Output: ``(event_id, user_id, z, is_anomaly)`` for full windows."""
    import ray.data as rd

    from .extras.textstats import round6_arr

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "value"],
    )

    def tag(batch: pa.Table) -> pa.Table:
        k = batch["user_id"].to_numpy(zero_copy_only=False)
        t = pc.cast(batch["ts"], pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        )
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_b": pa.array((k % 64).astype(np.int32), pa.int32()),
                "k": pa.array(k, pa.int64()),
                "t": pa.array(t.view("int64"), pa.int64()),
                "i": batch["event_id"],
                "v": pa.array(np.rint(v * 100.0).astype(np.int64)),
            }
        )

    W = ANOM_WINDOW

    def per_bucket(group: pa.Table) -> pa.Table:
        k = group["k"].to_numpy(zero_copy_only=False)
        t = group["t"].to_numpy(zero_copy_only=False)
        i = group["i"].to_numpy(zero_copy_only=False)
        v = group["v"].to_numpy(zero_copy_only=False)
        order = np.lexsort((i, t, k))
        k, i, v = k[order], i[order], v[order]
        n = len(k)
        new = np.ones(n, bool)
        if n > 1:
            new[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(new)
        sizes = np.diff(np.r_[starts, n])
        pos_in_grp = np.arange(n) - np.repeat(starts, sizes)
        full = pos_in_grp >= W - 1
        idx = np.flatnonzero(full)
        # window sums via W shifted adds: every intermediate is bounded
        # by W·max(v²) regardless of bucket length — the round-3
        # cumsum(v*v) form's cumulative intermediate grew with the whole
        # bucket and could silently overflow int64 at 100-TB bucket
        # sizes (ADVICE r3).  Identical integers to the cumsum-diff form.
        # The guard bounds the DOWNSTREAM variance expression W·ss − s²
        # too (both terms ≤ W²·max(v²), so requiring W²·max(v²) < 2^62
        # keeps the subtraction exact) — not just ss itself.
        vmax = int(np.abs(v).max()) if n else 0
        if vmax and vmax * vmax > (1 << 62) // (W * W):
            raise OverflowError(
                f"rolling_anomaly: |cents| {vmax} too large for exact "
                f"int64 windowed variance (W={W})"
            )
        vsq = v * v
        s = np.zeros(len(idx), np.int64)
        ss = np.zeros(len(idx), np.int64)
        for j in range(W):
            s += v[idx - j]
            ss += vsq[idx - j]
        x = v[idx].astype(np.float64)
        mean = s / float(W)
        var = (W * ss - s * s) / float(W * W)
        with np.errstate(divide="ignore", invalid="ignore"):
            z = np.where(var > 0, (x - mean) / np.sqrt(var), 0.0)
        z6 = round6_arr(z)
        return pa.table(
            {
                "event_id": pa.array(i[idx], pa.int64()),
                "user_id": pa.array(k[idx], pa.int64()),
                "z": pa.array(z6, pa.float64()),
                "is_anomaly": pa.array(
                    (np.abs(z6) > ANOM_Z).astype(np.int64), pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def q_mcnemar_gates(sf_dir: str):
    """McNemar test on the paired quality-gate 2x2 (same docs, two
    rules): chi2 = (n10 - n01)^2 / (n10 + n01) over the DISCORDANT
    cells — 'do the two gates disagree symmetrically?' complements the
    kappa agreement view.  Same exact integer counts as
    quality_gate_kappa; one mirrored division.

    Output: one row ``(n10, n01, chi2)`` (6dp)."""
    import ray.data as rd

    from .extras.textstats import round6, simple_tokens

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["text", "n_chars"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        nc = batch["n_chars"].to_numpy(zero_copy_only=False)
        a = nc >= KAPPA_CHARS_MIN
        b = np.array(
            [
                len(simple_tokens(t or "")) >= KAPPA_TOKENS_MIN
                for t in batch["text"].to_pylist()
            ],
            dtype=bool,
        )
        return pa.table(
            {
                "_one": pa.array([0], pa.int32()),
                "_n10": pa.array([int((a & ~b).sum())], pa.int64()),
                "_n01": pa.array([int((~a & b).sum())], pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_one")
        .sum(["_n10", "_n01"])
    )
    t = pa.concat_tables(list(agg.iter_batches(batch_format="pyarrow")))
    n10 = int(t["sum(_n10)"][0].as_py())
    n01 = int(t["sum(_n01)"][0].as_py())
    disc = n10 + n01
    chi2 = ((n10 - n01) ** 2) / float(disc) if disc else 0.0
    return pa.table(
        {
            "n10": pa.array([n10], pa.int64()),
            "n01": pa.array([n01], pa.int64()),
            "chi2": pa.array([round6(chi2)], pa.float64()),
        }
    )


def q_cusum_daily_value(sf_dir: str):
    """CUSUM change-point statistic on the daily mean value: running
    sum of (daily mean - overall daily-mean average) in day order, max
    |cusum| and its day — the classic mean-shift detector.  Exact
    integer day sums reduce distributedly; the O(days) day-ordered scan
    runs the SAME float sequence on both sides (deterministic order =
    no quantization needed), ties broken by earliest day.

    Output: one row ``(n_days, peak_day, peak_abs_cusum)`` (6dp)."""
    import ray.data as rd

    from .extras.textstats import round6

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "value"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = pc.cast(batch["ts"], pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        ).view("int64")
        day = t // 86_400_000_000
        cents = np.rint(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        u, inv = np.unique(day, return_inverse=True)
        s = np.bincount(inv, weights=cents, minlength=len(u)).astype(
            np.int64
        )
        n = np.bincount(inv, minlength=len(u)).astype(np.int64)
        return pa.table(
            {"day": pa.array(u), "_s": pa.array(s), "_n": pa.array(n)}
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("day")
        .sum(["_s", "_n"])
    )
    t = pa.concat_tables(list(agg.iter_batches(batch_format="pyarrow")))
    day = t["day"].to_numpy(zero_copy_only=False)
    s = t["sum(_s)"].to_numpy(zero_copy_only=False)
    n = t["sum(_n)"].to_numpy(zero_copy_only=False)
    order = np.argsort(day)
    day, s, n = day[order], s[order], n[order]
    # integer formulation (multiply through by D): with qmean =
    # floor(1e-6-quantized daily mean), C_k = D*prefix_k(qmean) - k*T
    # is EXACT int64 — no float accumulation exists to disagree with
    # any window-combine structure; the one division happens at the end
    D = len(day)
    qmean = np.floor((s / n.astype(np.float64)) * 1e6).astype(np.int64)
    T = int(qmean.sum())
    prefix = np.cumsum(qmean)
    kk = np.arange(1, D + 1, dtype=np.int64)
    C = D * prefix - kk * T
    stat = np.round(np.abs(C) / (D * 1e6), 6)
    i = int(np.argmax(stat))  # first occurrence = earliest day
    return pa.table(
        {
            "n_days": pa.array([D], pa.int64()),
            "peak_day": pa.array([int(day[i])], pa.int64()),
            "peak_abs_cusum": pa.array([float(stat[i])], pa.float64()),
        }
    )


KAPPA_CHARS_MIN = 512
KAPPA_TOKENS_MIN = 64


def q_quality_gate_kappa(sf_dir: str):
    """Cohen's kappa between two quality gates — the cheap char-length
    rule (n_chars >= 512) vs the tokenizing rule (n_tokens >= 64):
    'can the cheap gate replace the expensive one?' is an agreement
    question, not an accuracy question.  Exact integer 2x2 agreement
    counts per block; kappa = (po - pe) / (1 - pe) is the one mirrored
    float expression.

    Output: one row ``(n, po, kappa)`` (6dp)."""
    import ray.data as rd

    from .extras.textstats import round6, simple_tokens

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["text", "n_chars"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        nc = batch["n_chars"].to_numpy(zero_copy_only=False)
        a = nc >= KAPPA_CHARS_MIN
        b = np.array(
            [
                len(simple_tokens(t or "")) >= KAPPA_TOKENS_MIN
                for t in batch["text"].to_pylist()
            ],
            dtype=bool,
        )
        return pa.table(
            {
                "_one": pa.array([0], pa.int32()),
                "_n11": pa.array([int((a & b).sum())], pa.int64()),
                "_n10": pa.array([int((a & ~b).sum())], pa.int64()),
                "_n01": pa.array([int((~a & b).sum())], pa.int64()),
                "_n00": pa.array([int((~a & ~b).sum())], pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_one")
        .sum(["_n11", "_n10", "_n01", "_n00"])
    )
    t = pa.concat_tables(list(agg.iter_batches(batch_format="pyarrow")))
    n11 = int(t["sum(_n11)"][0].as_py())
    n10 = int(t["sum(_n10)"][0].as_py())
    n01 = int(t["sum(_n01)"][0].as_py())
    n00 = int(t["sum(_n00)"][0].as_py())
    n = n11 + n10 + n01 + n00
    po = (n11 + n00) / float(n)
    pa_ = (n11 + n10) / float(n)
    pb_ = (n11 + n01) / float(n)
    pe = pa_ * pb_ + (1.0 - pa_) * (1.0 - pb_)
    kappa = (po - pe) / (1.0 - pe) if pe < 1.0 else 1.0
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "po": pa.array([round6(po)], pa.float64()),
            "kappa": pa.array([round6(kappa)], pa.float64()),
        }
    )


def q_cramers_v(sf_dir: str):
    """Cramér's V effect size for the lang × source association —
    the magnitude companion of the chi-square screen (chi2 says
    'dependent', V says 'how much', scale-free in [0, 1]).  Same exact
    integer contingency machinery and 1e-6 floor quantization as
    q_chi2_lang_source; one extra float expression mirrored in SQL.

    Output: one row ``(n, k, v)`` with k = min(rows-1, cols-1)."""
    import ray.data as rd

    from .extras.textstats import round6

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["lang", "source"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        agg = batch.group_by(["lang", "source"]).aggregate(
            [([], "count_all")]
        )
        return agg.rename_columns(["lang", "source", "_c"])

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .sum("_c")
    ).to_pandas()
    cells = cells.rename(columns={"sum(_c)": "o"})
    n = int(cells["o"].sum())
    r = cells.groupby("lang")["o"].sum()
    c = cells.groupby("source")["o"].sum()
    quant = 0
    for _, row in cells.iterrows():
        e = float(r[row["lang"]]) * float(c[row["source"]]) / float(n)
        o = float(row["o"])
        quant += int(np.floor((o - e) * (o - e) / e * 1000000.0))
    chi2 = quant / 1000000.0
    k = min(len(r) - 1, len(c) - 1)
    v = (chi2 / (n * k)) ** 0.5 if k > 0 else 0.0
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "k": pa.array([k], pa.int64()),
            "v": pa.array([round6(v)], pa.float64()),
        }
    )


def q_hourly_filled(sf_dir: str):
    """Dense hourly event counts per type — zero-filled gap hours on the
    [min, max] hour grid (time-series resample step).  Counts aggregate
    distributedly; the O(span × types) grid is clock-bounded driver
    work."""
    import ray.data as rd

    from .extras.windows import dense_hourly_counts

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "event_type"]
    )
    return dense_hourly_counts(ds)


def q_last_click_locf(sf_dir: str):
    """Per-user carry-forward of the most recent 'click' timestamp to
    every subsequent event (IGNORE-NULLS running max — the LOCF window
    LAG can't express); rows before a user's first click omitted."""
    import ray.data as rd

    from .extras.windows import locf_per_group

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "event_type"],
    )
    return locf_per_group(ds, mark_type="click")


def q_mode_event_type(sf_dir: str):
    """Per-user modal event type (ties → lexicographically smallest) —
    integer counts, fully deterministic."""
    import ray.data as rd

    from .extras.stats import grouped_mode

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "event_type"],
    )
    out = (
        grouped_mode(ds, key_col="user_id", val_col="event_type")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "user_id": pa.array(out["user_id"], pa.int64()),
            "mode_event_type": pa.array(out["mode_event_type"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
        }
    )


def q_zscore_price(sf_dir: str):
    """Per-brand z-score of retail price — broadcast group moments from
    exact integer cent sums; the table itself never shuffles."""
    import ray.data as rd

    from .extras.stats import grouped_zscore

    ds = rd.read_parquet(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand", "p_retailprice"],
    )
    return grouped_zscore(
        ds, key_col="p_brand", val_col="p_retailprice", id_col="p_partkey"
    )


def q_rolling_value_avg(sf_dir: str):
    """Per-user rolling mean of value over the last ROLLING_FRAME events
    in (ts, event_id) order — exact integer frame sums at 1e-6."""
    import ray.data as rd

    from .extras.windows import rolling_mean_per_group

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "value"],
    )
    return rolling_mean_per_group(ds, frame=ROLLING_FRAME)


def q_event_gaps(sf_dir: str):
    """Per-user microseconds since the previous event (LAG) in (ts,
    event_id) order; first event per user omitted."""
    import ray.data as rd

    from .extras.windows import lag_gaps_per_group

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts"],
    )
    return lag_gaps_per_group(ds)


def q_latest_event(sf_dir: str):
    """Upsert compaction: each user's latest event by (ts desc, event_id
    desc) with its value — distributive top-1 per key."""
    import ray.data as rd

    from .extras.topk import latest_per_key

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "event_id", "ts", "value"],
    )
    return latest_per_key(
        ds,
        key_col="user_id",
        ts_col="ts",
        id_col="event_id",
        payload_cols=["value"],
    )


WSAMPLE_K = 50  # weighted-sample size


def q_value_pct_rank(sf_dir: str):
    """Per-user PERCENT_RANK of value in (value, event_id) order —
    exact integer rank/(n−1), single mirrored division."""
    import ray.data as rd

    from .extras.windows import percent_rank_per_group

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "value"],
    )
    return percent_rank_per_group(ds)


def q_weighted_doc_sample(sf_dir: str):
    """Deterministic weighted sample (Efraimidis–Spirakis, md5-derived
    keys, weight = token count): k docs, no RNG state, distributive
    per-block top-k."""
    from .extras.split import weighted_sample

    out = (
        weighted_sample(_docs_text(sf_dir), k=WSAMPLE_K)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "n_tokens": pa.array(out["n_tokens"], pa.int64()),
        }
    )


def q_cms_tokens(sf_dir: str):
    """Count-Min Sketch register table over corpus token frequencies —
    O(d·w) integer state per block, merged under +; the oracle compares
    the exact register state."""
    from .extras.sketch import cms_token_registers

    out = (
        cms_token_registers(_docs_text(sf_dir))
        .to_pandas()
        .sort_values(["j", "idx"])
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "j": pa.array(out["j"], pa.int64()),
            "idx": pa.array(out["idx"], pa.int64()),
            "c": pa.array(out["c"], pa.int64()),
        }
    )


def q_customer_event_counts(sf_dir: str):
    """LEFT OUTER JOIN + COUNT: per customer, how many events they have
    (0 for inactive customers) — the right side collapses to per-key
    counts and broadcasts once; the customer table never shuffles."""
    import ray.data as rd

    from .extras.joins import left_outer_count_join

    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"]
    )
    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id"]
    )
    out = left_outer_count_join(
        cust, ev, left_key="c_custkey", right_key="user_id"
    ).to_pandas()
    out = out.sort_values("c_custkey").reset_index(drop=True)
    return pa.table(
        {
            "c_custkey": pa.array(out["c_custkey"], pa.int64()),
            "n_events": pa.array(out["n_right"], pa.int64()),
        }
    )


def q_token_entropy(sf_dir: str):
    """Per-doc Shannon entropy of the token distribution (floor-
    quantized at 1e-6 so the sum is an exact integer on both sides)."""
    from .extras.textstats import token_entropy

    return token_entropy(_docs_text(sf_dir))


KEYWORDS_K = 5  # keywords per document


def q_keyword_extract(sf_dir: str):
    """Top-k TF-IDF keywords per document — (c/doclen)·log10(N/df),
    ranked (raw score desc, term asc); the reference's tf·idf weighting
    (idf = log10(N/df)) reduced to the shared tokenization.  Uses the
    broadcast-df strategy (fixture vocabulary is tiny); the open-vocab
    distributed-join path is asserted equal in tests/test_extras.py."""
    from .extras.lm import tfidf_keywords

    return tfidf_keywords(_docs_text(sf_dir), k=KEYWORDS_K, strategy="broadcast")


def q_bigram_lm(sf_dir: str):
    """Per-doc mean bigram log10-probability under the corpus's own
    add-one-smoothed bigram LM (the CCNet/Gopher-style quality filter).
    Per-bigram logprobs are quantized once to integer micro-units so the
    per-doc reduction is an exact integer sum on both sides."""
    from .extras.lm import bigram_lm_quality

    return bigram_lm_quality(_docs_text(sf_dir))


FUNNEL_STAGES = ("view", "click", "purchase")
FUNNEL_WINDOW_US = 24 * 3_600_000_000  # 24h conversion window


def q_funnel(sf_dir: str):
    """Per-user funnel depth (view -> click -> purchase within 24h of
    the first view) — sequential min-timestamp funnel with a deadline.
    Integer/timestamp-only output; zero FP risk."""
    import ray.data as rd

    from .extras.funnel import funnel_stages

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_type"],
    )
    return funnel_stages(ev, FUNNEL_STAGES, window_us=FUNNEL_WINDOW_US)


def q_mad_value(sf_dir: str):
    """Per-event-type median absolute deviation of ``value`` (robust
    outlier scale; inner median 6dp-rounded both sides before the
    deviations)."""
    import ray.data as rd

    from .extras.stats import grouped_mad

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "value"]
    )
    return grouped_mad(ev, key_col="event_type", val_col="value")


DSIR_BUCKETS = 1024
DSIR_TARGET_LANG = "en"


def q_dsir(sf_dir: str):
    """DSIR importance scores (hashed-unigram log-likelihood ratio of
    the lang='en' target subset vs the full corpus; arXiv 2302.03169).
    Per-bucket log-ratios micro-quantized once, per-doc exact integer
    sum (the bigram_lm discipline)."""
    import ray.data as rd

    from .extras.dsir import dsir_weights

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )
    return dsir_weights(
        ds,
        target_col="lang",
        target_value=DSIR_TARGET_LANG,
        n_buckets=DSIR_BUCKETS,
    )


CHUNK_SIZE = 200  # chars per chunk
CHUNK_OVERLAP = 50


def q_chunk_docs(sf_dir: str):
    """Overlapping character-window chunking of documents (the LLM
    context-window explode).  Pure integer arithmetic + codepoint
    slicing; offsets match DuckDB substr exactly."""
    from .extras.chunk import chunk_documents

    return chunk_documents(
        _docs(sf_dir).select_columns(["doc_id", "text", "n_chars"]),
        size=CHUNK_SIZE,
        overlap=CHUNK_OVERLAP,
    )


def q_fuzzy_pairs(sf_dir: str):
    """Edit-distance-1 token pairs over the union vocabulary of
    documents.text + part.p_name/p_type + events.event_type (FastSS
    deletion-neighborhood blocking + exact verify — the typo-mining
    primitive).  The union keeps the oracle non-vacuous: the synthetic
    doc vocabulary alone has no distance-1 pairs at any SF.
    String-only output; zero FP risk."""
    import pyarrow as pa
    import ray.data as rd

    from .extras.fuzzy import fuzzy_token_pairs

    def _one_col(path: str, cols: list[str]):
        def to_text(batch: pa.Table) -> pa.Table:
            parts = []
            for c in cols:
                col = batch[c]
                parts.append(
                    col.combine_chunks()
                    if isinstance(col, pa.ChunkedArray)
                    else col
                )
            return pa.table({"text": pa.concat_arrays(parts)})

        return rd.read_parquet(
            os.path.join(sf_dir, path), columns=cols
        ).map_batches(to_text, batch_format="pyarrow")

    corpus = (
        _one_col("documents.parquet", ["text"])
        .union(_one_col("part.parquet", ["p_name", "p_type"]))
        .union(_one_col("events.parquet", ["event_type"]))
    )
    return fuzzy_token_pairs(corpus)


PROFILE_COLS = ["event_id", "user_id", "event_type"]


def q_profile_events(sf_dir: str):
    """Column-profile of the events table (n / nulls / exact distinct /
    min / max per column) — the data-quality expectation check.
    Restricted to int64 + ASCII-string columns where Python str() and
    DuckDB ::VARCHAR renderings agree byte-for-byte."""
    import ray.data as rd

    from .extras.profile import profile_columns

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=PROFILE_COLS
    )
    return profile_columns(ev, PROFILE_COLS)


def q_embed_int8(sf_dir: str):
    """Absmax int8 quantization of the embedding column, flattened to
    (vec_id, i, code, scale) scalar rows.  scale and x/scale are single
    mirrored IEEE divisions; rounding is half-away-from-zero."""
    import ray.data as rd

    from .extras.vecquant import int8_quantize

    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    return int8_quantize(ds)


def q_lexical_diversity(sf_dir: str):
    """Per-doc type-token ratio + hapax count (vocabulary-richness
    quality signals)."""
    from .extras.textstats import lexical_diversity

    return lexical_diversity(_docs_text(sf_dir))


def q_retention(sf_dir: str):
    """Weekly retention cohorts (cohort = ISO week of first event;
    retention = active fraction at week offset k).  One bucketed
    shuffle of per-block-distinct (user, week) pairs."""
    import ray.data as rd

    from .extras.retention import retention_cohorts

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )
    return retention_cohorts(ev)


def q_lang_quality_gate(sf_dir: str):
    """Per-LANGUAGE adaptive length gate: docs strictly above their own
    lang's exact p10 token count (a global threshold over-prunes
    low-resource slices)."""
    import ray.data as rd

    from .extras.stats import grouped_quantile_filter
    from .extras.textstats import simple_tokens

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "text"],
    )

    def counts(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang": batch["lang"],
                "n_tokens": pa.array(
                    [
                        len(simple_tokens(t or ""))
                        for t in batch["text"].to_pylist()
                    ],
                    pa.int64(),
                ),
            }
        )

    # two consumers (per-group histograms + keep pass): tokenize once
    return grouped_quantile_filter(
        docs.map_batches(counts, batch_format="pyarrow").materialize(),
        key_col="lang",
        id_col="doc_id",
        val_col="n_tokens",
        q=0.1,
    )


CONVERT_TYPE = "purchase"


def q_conversion_lag(sf_dir: str):
    """Per-user µs from their FIRST event to their FIRST 'purchase' —
    the funnel-timing metric (non-converting users omitted; a first
    event that IS the purchase yields lag 0).  ONE user-bucketed
    co-partition; integer-µs arithmetic."""
    import ray.data as rd

    from .extras.funnel import conversion_lag

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_type"],
    )
    return conversion_lag(ev, target_type=CONVERT_TYPE)


def q_basket_sizes(sf_dir: str):
    """Distribution of distinct items per order: (n_items, n_orders) —
    the basket-shape profile behind co-purchase support thresholds."""
    import ray.data as rd

    from .extras.basket import basket_size_histogram

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey"],
    )
    return basket_size_histogram(li)


def q_cumulative_users(sf_dir: str):
    """Cumulative distinct users per day (growth curve) — exact via
    first-active-day attribution, no running sketch."""
    import ray.data as rd

    from .extras.cumulative import cumulative_users_by_day

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )
    return cumulative_users_by_day(ev)


def q_compress_ratio(sf_dir: str):
    """Per-doc zlib compression ratio (Gopher-style repetitiveness
    proxy).  Rows-only: DuckDB has no compression scalar; semantics
    pinned by pytest against direct zlib."""
    from .extras.compressq import compression_ratio

    return compression_ratio(_docs_text(sf_dir))


def q_copurchase(sf_dir: str):
    """Market-basket part pairs with support ≥ 2 orders + lift —
    the association-rule primitive over lineitem baskets."""
    import ray.data as rd

    from .extras.basket import copurchase_lift

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey"],
    )
    return copurchase_lift(li, min_support=2)


APSS_THRESHOLD = 0.4
APSS_MAX_DF_FRAC = 0.2  # df cap scales with corpus size

# deterministic snapshot simulation for q_corpus_diff: old drops
# doc_id % 17 == 0, new drops % 13 == 0 and edits % 7 == 0
DIFF_OLD_MOD, DIFF_NEW_MOD, DIFF_EDIT_MOD = 17, 13, 7


def q_corpus_diff(sf_dir: str):
    """Per-key added/removed/changed/unchanged across two deterministic
    snapshots of the documents table — the incremental-rebuild planner
    input (what stages/extend.py actually has to touch)."""
    import hashlib

    from .extras.diff import snapshot_diff

    def hashed(drop_mod: int, edit: bool):
        def fn(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_pylist()
            txts = batch["text"].to_pylist()
            out_i, out_h = [], []
            for i, t in zip(ids, txts):
                if i % drop_mod == 0:
                    continue
                s = t + ".v2" if (edit and i % DIFF_EDIT_MOD == 0) else t
                out_i.append(i)
                out_h.append(hashlib.md5(s.encode()).hexdigest())
            return pa.table(
                {
                    "doc_id": pa.array(out_i, pa.int64()),
                    "content_hash": pa.array(out_h, pa.string()),
                }
            )

        return fn

    old = _docs_text(sf_dir).map_batches(
        hashed(DIFF_OLD_MOD, edit=False), batch_format="pyarrow"
    )
    new = _docs_text(sf_dir).map_batches(
        hashed(DIFF_NEW_MOD, edit=True), batch_format="pyarrow"
    )
    return snapshot_diff(old, new)


def q_cosine_pairs(sf_dir: str):
    """All-pairs bag-of-words cosine >= threshold over the df-capped
    term space — the lexical (inverted-index self-join) complement of
    the embedding near-dup path; exact integer dots and norms."""
    from .extras.apss import cosine_pairs

    return cosine_pairs(
        _docs_text(sf_dir),
        threshold=APSS_THRESHOLD,
        max_df_frac=APSS_MAX_DF_FRAC,
    )


KNN_K = 3
KNN_EPS = 0.1


def q_knn_graph(sf_dir: str):
    """ε-thresholded top-k cosine neighbors per doc (the kNN similarity
    graph): APSS pair generation + one bucketed vectorized segment
    head-k; rank by (rounded cosine desc, neighbor id asc)."""
    from .extras.apss import knn_graph

    return knn_graph(
        _docs_text(sf_dir),
        k=KNN_K,
        eps=KNN_EPS,
        max_df_frac=APSS_MAX_DF_FRAC,
    )


KCORE_K = 2
KCORE_MIN_SUPPORT = 2
KCORE_SQL_MAX_ROUNDS = 24  # >> observed peel depth (5 at sf0.1)


def _copurchase_support_edges(
    sf_dir: str, min_support: int, with_support: bool = False
):
    """Distinct canonical part pairs sharing >= min_support orders —
    the support-thresholded co-purchase graph feeding q_kcore,
    q_bfs_hops and q_sssp.  hash(order)-bucketed pair emission with
    per-bucket support partials, then hash(pair)-bucketed global
    support sum; ``with_support`` carries the support count out (the
    SSSP edge-weight input)."""
    import ray.data as rd

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey"],
    )

    # distinct (order, part) -> canonical pairs with support >= 2,
    # hash(group)-bucketed like cooccurrence_edges but support-counted
    def tag(batch: pa.Table) -> pa.Table:
        g = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        return pa.table(
            {
                "_b": pa.array(g % 64, pa.int64()),
                "g": pa.array(g, pa.int64()),
                "i": pa.array(
                    batch["l_partkey"]
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    def pairs_per_bucket(group: pa.Table) -> pa.Table:
        g = group["g"].to_numpy(zero_copy_only=False)
        i = group["i"].to_numpy(zero_copy_only=False)
        order = np.lexsort((i, g))
        g, i = g[order], i[order]
        keep = np.ones(len(g), bool)
        if len(g) > 1:
            keep[1:] = (g[1:] != g[:-1]) | (i[1:] != i[:-1])
        g, i = g[keep], i[keep]
        starts = np.flatnonzero(
            np.concatenate(([True], g[1:] != g[:-1])) if len(g) else []
        )
        ends = np.append(starts[1:], len(g))
        from .extras.copart import pairs_within_runs

        a, b = pairs_within_runs(i, starts, ends)
        k = (a.astype(np.uint64) << np.uint64(32)) | b.astype(np.uint64)
        uk, cnt = np.unique(k, return_counts=True)
        return pa.table(
            {
                "_pb": pa.array(
                    (uk % np.uint64(64)).astype(np.int64), pa.int64()
                ),
                "k": pa.array(uk, pa.uint64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    def support_bucket(group: pa.Table) -> pa.Table:
        k = group["k"].to_numpy(zero_copy_only=False)
        n = group["n"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(k, return_inverse=True)
        tot = np.zeros(len(uk), np.int64)
        np.add.at(tot, inv, n)
        m = tot >= min_support
        uk, tot = uk[m], tot[m]
        cols = {
            "a": pa.array(
                (uk >> np.uint64(32)).astype(np.int64), pa.int64()
            ),
            "b": pa.array(
                (uk & np.uint64(0xFFFFFFFF)).astype(np.int64), pa.int64()
            ),
        }
        if with_support:
            cols["support"] = pa.array(tot, pa.int64())
        return pa.table(cols)

    return (
        li.map_batches(tag, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(pairs_per_bucket, batch_format="pyarrow")
        .groupby("_pb")
        .map_groups(support_bucket, batch_format="pyarrow")
    )


def q_kcore(sf_dir: str):
    """k-core of the support-thresholded co-purchase graph — iterative
    degree peel to the unique fixpoint; (node, in-core degree)."""
    from .extras.kcore import k_core

    edges = _copurchase_support_edges(sf_dir, KCORE_MIN_SUPPORT)
    return k_core(edges, k=KCORE_K)


BFS_MAX_DIST_SQL = 64  # recursion guard >> any observed eccentricity
LPA_FIXED_ITERS = 4


def q_lpa_communities(sf_dir: str):
    """Synchronous label-propagation communities over the
    support-thresholded co-purchase graph — (node, label) after exactly
    K mode-adoption rounds with min-label tie-break."""
    from .graph.lpa import lpa_communities

    edges = _copurchase_support_edges(sf_dir, KCORE_MIN_SUPPORT)
    return lpa_communities(edges, n_iters=LPA_FIXED_ITERS)


def q_bfs_hops(sf_dir: str):
    """Hop distance from the minimum part node over the
    support-thresholded co-purchase graph — (node, dist) for the
    reachable component."""
    from .graph.bfs import bfs_hops

    edges = _copurchase_support_edges(sf_dir, KCORE_MIN_SUPPORT)
    edges = edges.materialize()
    seed = edges.min("a")  # canonical a < b, so min endpoint == min(a)
    return bfs_hops(edges, sources=[int(seed)])


SSSP_MAX_COST = 12


def q_sssp(sf_dir: str):
    """Bounded-cost weighted shortest paths from the minimum part node
    over the co-purchase graph: edge weight 1 + 8 // support (stronger
    ties are cheaper), budget 12 — the weighted companion of bfs_hops
    (graph/sssp.py; fixed-round relaxation, budget makes the recursive
    SQL oracle's row space finite)."""
    from .graph.sssp import sssp_bounded

    edges = _copurchase_support_edges(
        sf_dir, KCORE_MIN_SUPPORT, with_support=True
    )

    def weigh(batch: pa.Table) -> pa.Table:
        sup = batch["support"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "a": batch["a"],
                "b": batch["b"],
                "w": pa.array(1 + 8 // sup, pa.int64()),
            }
        )

    edges = edges.map_batches(weigh, batch_format="pyarrow").materialize()
    seed = edges.min("a")
    return sssp_bounded(edges, int(seed), SSSP_MAX_COST)


def q_triangles(sf_dir: str):
    """Triangle count of the co-purchase graph (distinct canonical part
    pairs sharing an order) — degree-oriented compact-forward, the
    O(m^1.5) wedge-probe bound with per-bucket vectorized kernels."""
    import ray.data as rd

    from .extras.triangles import cooccurrence_edges, triangle_count

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey"],
    )
    edges = cooccurrence_edges(
        li, group_col="l_orderkey", item_col="l_partkey"
    )
    return triangle_count(edges)


def q_value_trend(sf_dir: str):
    """Per-event-type OLS trend of value over time (dollars/day) —
    drift detection with exact integer sufficient statistics."""
    import ray.data as rd

    from .extras.stats import grouped_trend

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "ts", "value"],
    )
    return grouped_trend(ev, key_col="event_type", ts_col="ts", val_col="value")


def q_transition_entropy(sf_dir: str):
    """Per-prev-type Shannon entropy of the next-event distribution
    (predictability profile), quantized-term exact."""
    import ray.data as rd

    from .extras.markov import transition_entropy

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    return transition_entropy(ev)


def q_source_overlap(sf_dir: str):
    """Pairwise shingle-Jaccard between document sources — the
    cross-corpus contamination / redundancy matrix."""
    import ray.data as rd

    from .extras.overlap import source_overlap_matrix

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["source", "text"]
    )
    return source_overlap_matrix(ds, k=NGRAM_K)


def q_phash_pairs(sf_dir: str):
    """Near-duplicate IMAGE pairs via perceptual aHash + the banded
    hamming machinery (rows-only: binary P6 decode is not
    SQL-expressible; the pair law itself is pinned by the simhash_pairs
    oracle over the shared banded_hamming_pairs kernel and by pytest
    against a brute-force popcount)."""
    import ray.data as rd

    from .extras.multimodal import image_phash_pairs, synthesize_image_table

    n = max(_corpus_rows_for(sf_dir) // 2, 50)
    media = rd.from_arrow(synthesize_image_table(n)).repartition(4)
    return image_phash_pairs(media)


Q3_SEGMENT = "BUILDING"
Q3_CUTOFF = "1995-03-15"


def q_top_unshipped_orders(sf_dir: str):
    """TPC-H Q3 analog: top-10 not-yet-shipped orders by revenue for
    one market segment — the classic selective 3-way join + top-k.

    Plan (100 TB honest): customer and the date-filtered orders are the
    SMALL sides after their filters — both reduce where they live and
    broadcast (`ray.put`) into the lineitem scan, which never shuffles;
    revenue accumulates in exact 1e-4-dollar integers (the
    priority_revenue law) so the top-k order is deterministic.  At a
    scale where filtered orders outgrow a broadcast, swap the lookup
    for the real `Dataset.join` path priority_revenue demonstrates.
    """
    import ray
    import ray.data as rd

    cutoff = np.datetime64(Q3_CUTOFF, "us")

    cust_keys: set = set()
    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"],
    )
    for b in cust.iter_batches(batch_format="pyarrow"):
        m = pc.equal(b["c_mktsegment"], Q3_SEGMENT)
        cust_keys.update(b["c_custkey"].filter(m).to_pylist())

    order_date: dict = {}
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )
    for b in orders.iter_batches(batch_format="pyarrow"):
        ok = b["o_orderkey"].to_numpy(zero_copy_only=False)
        ck = b["o_custkey"].to_numpy(zero_copy_only=False)
        od = pc.cast(b["o_orderdate"], pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        )
        keep = od < cutoff
        for o, c, d in zip(ok[keep], ck[keep], od[keep]):
            if int(c) in cust_keys:
                order_date[int(o)] = d
    oref = ray.put(order_date)

    def partial(batch: pa.Table) -> pa.Table:
        omap = ray.get(oref)
        sd = pc.cast(batch["l_shipdate"], pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        )
        keep = sd > cutoff
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False)[keep]
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)[keep]
        hit = np.fromiter((int(o) in omap for o in ok), bool, len(ok))
        ok, price, disc = ok[hit], price[hit], disc[hit]
        rev = np.rint(price * 100.0) * (100.0 - np.rint(disc * 100.0))
        un, inv = np.unique(ok, return_inverse=True)
        return pa.table(
            {
                "o_orderkey": pa.array(un, pa.int64()),
                "o_orderdate": pa.array(
                    np.array([omap[int(o)] for o in un], "datetime64[us]"),
                    pa.timestamp("us"),
                ),
                "rev_part": pa.array(
                    np.bincount(inv, weights=rev).astype(np.int64), pa.int64()
                ),
            }
        )

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    top = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby(["o_orderkey", "o_orderdate"])
        .sum("rev_part")
        .sort(
            ["sum(rev_part)", "o_orderdate", "o_orderkey"],
            descending=[True, False, False],
        )
        .limit(10)
        .to_pandas()
    )
    return pa.table(
        {
            "o_orderkey": pa.array(top["o_orderkey"], pa.int64()),
            "o_orderdate": pa.array(top["o_orderdate"], pa.timestamp("us")),
            "revenue": pa.array(
                [round6(v / 10000.0) for v in top["sum(rev_part)"]],
                pa.float64(),
            ),
        }
    )


def q_embedding_drift(sf_dir: str):
    """Dataset-shift probe: cosine between the exact quantized centroids
    of two deterministic md5-parity halves of the embedding corpus (≈1.0
    means the halves are exchangeable; the A/B ingestion check).  One
    row: (n_a, n_b, cosine).  Per-dim products floor-quantized at 1e-6
    and summed as integers before the single mirrored cosine."""
    import ray.data as rd

    from .extras.stats import _md5_le64

    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )

    def add_split(batch: pa.Table) -> pa.Table:
        h = _md5_le64(batch["vec_id"].to_pylist())
        return pa.table(
            {
                "split": pa.array((h % 2).astype(np.int64), pa.int64()),
                "embedding": batch["embedding"],
            }
        )

    from .extras.similarity import label_centroids

    cents = pa.concat_tables(
        label_centroids(
            ds.map_batches(add_split, batch_format="pyarrow"),
            label_col="split",
            vec_col="embedding",
        ).iter_batches(batch_format="pyarrow")
    ).to_pandas()
    a = cents[cents["split"] == 0].sort_values("dim")
    b = cents[cents["split"] == 1].sort_values("dim")
    av = a["centroid"].to_numpy()
    bv = b["centroid"].to_numpy()
    dq = int(np.floor(av * bv * 1e6).astype(np.int64).sum())
    naq = int(np.floor(av * av * 1e6).astype(np.int64).sum())
    nbq = int(np.floor(bv * bv * 1e6).astype(np.int64).sum())
    cos = (dq / 1_000_000) / (
        math.sqrt(naq / 1_000_000) * math.sqrt(nbq / 1_000_000)
    )
    return pa.table(
        {
            "n_a": pa.array([int(a["n"].iloc[0])], pa.int64()),
            "n_b": pa.array([int(b["n"].iloc[0])], pa.int64()),
            "cosine": pa.array([round6(cos)], pa.float64()),
        }
    )


def q_skipgram_counts(sf_dir: str):
    """Positional skip-gram pair counts (window 2) — the word2vec/GloVe
    training-pair extraction; unordered pairs, ONE bucketed sum."""
    from .extras.skipgram import skipgram_pair_counts

    return skipgram_pair_counts(_docs_text(sf_dir), window=2)


def q_top_terms_per_lang(sf_dir: str):
    """Each language's 10 most frequent tokens (count DESC, token ASC)
    — vocabulary profiling without a global sort."""
    import ray.data as rd

    from .extras.topk_terms import top_terms_per_group

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang", "text"]
    )
    return top_terms_per_group(ds, group_col="lang", k=10)


def q_zipf_fit(sf_dir: str):
    """Zipf's-law OLS fit (ln freq on ln rank) over the corpus unigram
    distribution — every regression term floor-quantized at 1e-6 and
    summed as exact integers; ranks derived from the count histogram,
    no global sort."""
    from .extras.zipf import zipf_fit

    return zipf_fit(_docs_text(sf_dir))


def q_rrf_fusion(sf_dir: str):
    """Reciprocal-rank fusion of the tf·idf and BM25 top-20 lists
    (k=60): ``rrf = 1/(60+r_tfidf) + 1/(60+r_bm25)``, absent list
    contributing 0 — the standard hybrid-retrieval merge over the two
    scorer paths the engine already serves.  Ranks are assigned from
    the ROUNDED scores (doc_id tiebreak) on both sides so the fusion
    is deterministic; the fuse itself runs on 2×20 rows."""
    def ranks(tbl: pa.Table) -> dict[int, int]:
        df = tbl.to_pandas().sort_values(
            ["score", "doc_id"], ascending=[False, True]
        )
        return {int(d): i + 1 for i, d in enumerate(df["doc_id"])}

    r1 = ranks(q_search_tfidf_topk(sf_dir))
    r2 = ranks(q_search_bm25_topk(sf_dir))
    docs = sorted(set(r1) | set(r2))
    a = [1.0 / (60.0 + r1[d]) if d in r1 else 0.0 for d in docs]
    b = [1.0 / (60.0 + r2[d]) if d in r2 else 0.0 for d in docs]
    return pa.table(
        {
            "doc_id": pa.array(docs, pa.int64()),
            "rank_tfidf": pa.array([r1.get(d, 0) for d in docs], pa.int64()),
            "rank_bm25": pa.array([r2.get(d, 0) for d in docs], pa.int64()),
            "rrf": pa.array(
                [round6(x + y) for x, y in zip(a, b)], pa.float64()
            ),
        }
    )


def q_hourly_burst(sf_dir: str):
    """Burst detection: hourly (event_type, window) count z-scored
    against the type's own hourly baseline (exact integer sufficient
    statistics — the grouped_zscore law), keeping windows with rounded
    z > 2.0.  The anomaly screen of a streaming-ingest pipeline."""
    import ray.data as rd

    from .extras.stats import grouped_zscore
    from .extras.windows import tumbling_agg

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "event_type", "value"],
    )
    # grouped_zscore reads its input twice (moments + map); materialize
    # the O(types x hours) counts so the tumbling agg runs once
    counts = (
        tumbling_agg(ev, unit="hour")
        .select_columns(["window", "event_type", "n"])
        .materialize()
    )
    z = grouped_zscore(
        counts, key_col="event_type", val_col="n", id_col="window", scale=1
    )

    def keep_bursts(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater(batch["z"], 2.0))

    return z.map_batches(keep_bursts, batch_format="pyarrow")


def q_user_features(sf_dir: str):
    """Per-user activity profile (counts, distinct days/types, value
    sum/mean, first/last ts) — the feature-engineering stage."""
    import ray.data as rd

    from .extras.features import user_activity_features

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_type", "value"],
    )
    return user_activity_features(ev)


def q_degree_stats(sf_dir: str):
    """Per-node in/out degree over the lineitem order→part bipartite
    graph (the pagerank_lineitem node law: 2·orderkey / 2·partkey+1)."""
    import ray.data as rd

    from .extras.features import degree_stats

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey"],
    )

    def to_edges(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(2 * ok, pa.int64()),
                "dst": pa.array(2 * pk + 1, pa.int64()),
            }
        )

    return degree_stats(ds.map_batches(to_edges, batch_format="pyarrow"))


def q_simhash_pairs(sf_dir: str):
    """Banded simhash near-dup pairs (≤3-bit hamming) — the scale path
    over the simhash entry's fingerprints."""
    from .extras.dedup import simhash_near_pairs

    return simhash_near_pairs(_docs_text(sf_dir))


def q_mad_outliers(sf_dir: str):
    """Robust outlier rows: events where |value − med(type)| > 3·mad(type)
    — the heavy-tail-safe screen before value aggregation.  med/mad are
    the mad_value oracle's exact quantile law; the corpus never
    shuffles (O(types) stats broadcast into a map filter)."""
    import ray.data as rd

    from .extras.stats import mad_outlier_rows

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "event_type", "value"],
    )
    return mad_outlier_rows(
        ev, key_col="event_type", val_col="value", id_col="event_id", k=3.0
    )


def q_quality_filter(sf_dir: str):
    """Drop-the-bottom-decile length gate: docs strictly above the
    corpus-wide exact p10 of n_tokens.  At 100 TB pass a persisted
    (doc_id, n_tokens) table instead of recomputing the counts for the
    filter pass."""
    from .extras.stats import global_quantile_filter
    from .extras.textstats import doc_token_counts

    # the filter consumes counts twice (histogram + keep pass);
    # materialize the narrow (doc_id, n_tokens) table so the text is
    # tokenized once — at 100 TB write it to parquet instead
    counts = doc_token_counts(_docs_text(sf_dir)).materialize()
    return global_quantile_filter(
        counts, id_col="doc_id", val_col="n_tokens", q=0.1
    )


def q_source_quality(sf_dir: str):
    """Per-source curation profile (n_docs / n_tokens / mean_tokens /
    doc_share) — the domain-level blocklist view."""
    import ray.data as rd

    from .extras.curate import source_stats

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["source", "text"]
    )
    return source_stats(ds)


SOURCE_DOC_CAP_K = 7


def q_source_doc_cap(sf_dir: str):
    """Per-source document cap: keep the ``SOURCE_DOC_CAP_K`` lowest
    doc_ids per source — the build-side analog of the crawler's
    per-domain page cap (``Crawler.java:140-153``
    ``MAX_PAGES_PER_DOMAIN`` CAS loop); a boilerplate-heavy repo must
    not flood the curated corpus.  Two-phase keep-k: per-batch combiner
    (O(k · sources) exchange rows) + bucketed per-source finalize."""
    import ray.data as rd

    from .extras.curate import source_doc_cap

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source"],
    )
    return source_doc_cap(ds, k=SOURCE_DOC_CAP_K)


def q_ngram_novelty(sf_dir: str):
    """Per-doc k-gram novelty: fraction of the doc's distinct trigrams
    whose corpus-wide first occurrence (min doc_id) is this doc — the
    fresh-content curation metric."""
    from .extras.novelty import ngram_novelty

    return ngram_novelty(_docs_text(sf_dir), k=NGRAM_K)


def q_lang_kl(sf_dir: str):
    """Per-language unigram KL divergence vs the corpus blend
    (mixture-balance diagnostic); contributions floor-quantized at 1e-6
    and summed as exact integers."""
    import ray.data as rd

    from .extras.divergence import lang_unigram_kl

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )
    return lang_unigram_kl(ds)


def q_event_transitions(sf_dir: str):
    """First-order Markov transition counts + row-conditional
    probabilities over per-user (ts, event_id)-ordered event streams."""
    import ray.data as rd

    from .extras.markov import event_type_transitions

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    return event_type_transitions(ev)


def q_cluster_winners(sf_dir: str):
    """Canonical doc per MinHash near-dup cluster (max tokens, then min
    doc_id) — the dedup ACTION over minhash_clusters' groups."""
    from .extras.canonical import dedup_cluster_winners
    from .extras.dedup import minhash_dedup_clusters

    clusters = minhash_dedup_clusters(
        _docs_text(sf_dir),
        threshold=MINHASH_THRESHOLD,
        num_bands=MINHASH_BANDS,
        rows_per_band=MINHASH_ROWS_PER_BAND,
        shingle_k=NGRAM_K,
    )
    return dedup_cluster_winners(_docs_text(sf_dir), clusters)


def q_bounce_rate(sf_dir: str):
    """Bounce rate: the share of sessions containing exactly one event —
    the canonical engagement KPI, derived from the SAME gap-based
    sessionization as the `sessions` entry (one definition, two views).
    The per-session table reduces to three integers and one mirrored
    division.

    Output: one row ``(n_sessions, n_bounces, bounce_rate)`` (6dp)."""
    from .extras.textstats import round6

    sess = q_sessions(sf_dir)
    n_sessions = 0
    n_bounces = 0
    for b in sess.iter_batches(batch_format="pyarrow"):
        ne = b["n_events"].to_numpy(zero_copy_only=False)
        n_sessions += len(ne)
        n_bounces += int((ne == 1).sum())
    rate = n_bounces / float(n_sessions) if n_sessions else 0.0
    return pa.table(
        {
            "n_sessions": pa.array([n_sessions], pa.int64()),
            "n_bounces": pa.array([n_bounces], pa.int64()),
            "bounce_rate": pa.array([round6(rate)], pa.float64()),
        }
    )


def q_tpch_q6(sf_dir: str):
    """TPC-H Q6 (forecasting revenue change): revenue that WOULD vanish
    if discounts in a band were eliminated — Σ extendedprice·discount
    over shipdate year 1996, discount in [0.05, 0.07], quantity < 24.
    Pure filtered aggregation: the band compares on exact cent-scaled
    integers, revenue accumulates as e4-scaled int64 partials.

    Output: one row ``(n_lines, revenue)`` (6dp)."""
    import ray.data as rd

    from .extras.textstats import round6

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_shipdate", "l_extendedprice", "l_discount", "l_quantity"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = pc.cast(batch["l_shipdate"], pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        )
        year = t.astype("datetime64[Y]").astype(np.int64) + 1970
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        dc = np.rint(disc * 100.0).astype(np.int64)
        qty = np.rint(
            batch["l_quantity"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        m = (year == 1996) & (dc >= 5) & (dc <= 7) & (qty < 24)
        x = np.rint(ep[m] * disc[m] * 10000.0).astype(np.int64)
        return pa.table(
            {
                "_one": pa.array([0], pa.int32()),
                "_n": pa.array([int(m.sum())], pa.int64()),
                "_s": pa.array([int(x.sum())], pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_one")
        .sum(["_n", "_s"])
    )
    t = pa.concat_tables(list(agg.iter_batches(batch_format="pyarrow")))
    n = int(t["sum(_n)"][0].as_py())
    s = int(t["sum(_s)"][0].as_py())
    return pa.table(
        {
            "n_lines": pa.array([n], pa.int64()),
            "revenue": pa.array([round6(s / 10000.0)], pa.float64()),
        }
    )


def q_tpch_q14(sf_dir: str):
    """TPC-H Q14 (promotion effect): the percent of June-1996 revenue
    from PROMO-type parts.  The part side broadcasts as a sorted
    promo-flag key array (O(parts) per worker, never shuffled); the
    lineitem side reduces to two e4-scaled int64 sums per block; one
    mirrored 100·promo/total division.

    Output: one row ``(n_lines, promo_pct)`` (6dp)."""
    import ray.data as rd

    from .extras.textstats import round6
    from .nputil import isin_sorted

    part = rd.read_parquet(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_type"]
    )
    pk_parts, promo_parts = [], []
    for b in part.iter_batches(batch_format="pyarrow"):
        pk_parts.append(b["p_partkey"].to_numpy(zero_copy_only=False))
        promo_parts.append(
            np.asarray(b["p_type"].to_pylist(), dtype=object) == "PROMO"
        )
    pk = np.concatenate(pk_parts)
    promo = np.concatenate(promo_parts)
    order = np.argsort(pk)
    pk, promo = pk[order], promo[order]
    promo_keys = pk[promo]

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = pc.cast(batch["l_shipdate"], pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        )
        ym = t.astype("datetime64[M]").astype(np.int64)
        m = ym == (1996 - 1970) * 12 + 5  # 1996-06
        lp = batch["l_partkey"].to_numpy(zero_copy_only=False)[m]
        x = np.rint(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)[m]
            * (1.0 - batch["l_discount"].to_numpy(zero_copy_only=False)[m])
            * 10000.0
        ).astype(np.int64)
        # mirror the SQL inner join: only lines with a matching part
        has_part, _ = isin_sorted(pk, lp)
        is_promo, _ = isin_sorted(promo_keys, lp)
        return pa.table(
            {
                "_one": pa.array([0], pa.int32()),
                "_n": pa.array([int(has_part.sum())], pa.int64()),
                "_sp": pa.array(
                    [int(x[has_part & is_promo].sum())], pa.int64()
                ),
                "_st": pa.array([int(x[has_part].sum())], pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_one")
        .sum(["_n", "_sp", "_st"])
    )
    t = pa.concat_tables(list(agg.iter_batches(batch_format="pyarrow")))
    n = int(t["sum(_n)"][0].as_py())
    sp = int(t["sum(_sp)"][0].as_py())
    st = int(t["sum(_st)"][0].as_py())
    pct = 100.0 * sp / float(st) if st else 0.0
    return pa.table(
        {
            "n_lines": pa.array([n], pa.int64()),
            "promo_pct": pa.array([round6(pct)], pa.float64()),
        }
    )


TPCH_CUTOFF_US = int(np.datetime64("1996-07-01", "us").astype(np.int64))


def q_tpch_q3v(sf_dir: str):
    """TPC-H Q3 variant (shipping priority — the synthesized schema has
    no o_shippriority, so the output is (l_orderkey, revenue,
    o_orderdate)): top 10 unshipped BUILDING-segment orders by revenue
    at the 1996-07-01 cutoff.

    Ray plan (100 TB honest): two co-partitioned attach joins — the
    customer segment flag stamps orders, surviving orders' dates stamp
    lineitem with INNER ("drop") semantics — so neither big side
    broadcasts or collects; then a bucketed (orderkey, date) sum of
    e4-cent integers and a mergeable per-batch top-10."""
    import ray.data as rd

    from .bucket_agg import bucketed_group_agg
    from .extras.copart import attach_value
    from .extras.textstats import round6

    D = TPCH_CUTOFF_US
    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"],
    )

    def seg_flag(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch["c_custkey"],
                "value": pc.cast(
                    pc.equal(batch["c_mktsegment"], "BUILDING"), pa.int64()
                ),
            }
        )

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )

    def ord_rows(batch: pa.Table) -> pa.Table:
        t = (
            pc.cast(batch["o_orderdate"], pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .view("int64")
        )
        m = t < D
        return pa.table(
            {
                "o_custkey": batch["o_custkey"].filter(pa.array(m)),
                "o_orderkey": batch["o_orderkey"].filter(pa.array(m)),
                "odate": pa.array(t[m], pa.int64()),
            }
        )

    with_flag = attach_value(
        orders.map_batches(ord_rows, batch_format="pyarrow"),
        cust.map_batches(seg_flag, batch_format="pyarrow"),
        key_col="o_custkey",
        out_col="flag",
        carry=["o_orderkey", "odate"],
    )

    def bld_orders(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["flag"], 1))
        return pa.table({"node": t["o_orderkey"], "value": t["odate"]})

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )

    def li_rows(batch: pa.Table) -> pa.Table:
        t = (
            pc.cast(batch["l_shipdate"], pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .view("int64")
        )
        m = t > D
        cents = np.rint(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)[m]
            * (1.0 - batch["l_discount"].to_numpy(zero_copy_only=False)[m])
            * 10000.0
        ).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"].filter(pa.array(m)),
                "cents": pa.array(cents, pa.int64()),
            }
        )

    joined = attach_value(
        li.map_batches(li_rows, batch_format="pyarrow"),
        with_flag.map_batches(bld_orders, batch_format="pyarrow"),
        key_col="l_orderkey",
        out_col="odate",
        carry=["cents"],
        missing="drop",
    )
    agg = bucketed_group_agg(
        joined, ["l_orderkey", "odate"], [("cents", "sum")]
    )

    def top10(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        od = batch["odate"].to_numpy(zero_copy_only=False)
        s = batch["sum(cents)"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ok, -s))[:10]
        return pa.table(
            {
                "l_orderkey": pa.array(ok[order], pa.int64()),
                "odate": pa.array(od[order], pa.int64()),
                "cents": pa.array(s[order], pa.int64()),
            }
        )

    parts = [
        t
        for t in agg.map_batches(top10, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
        if t.num_rows
    ]
    if not parts:
        return pa.table(
            {
                "l_orderkey": pa.array([], pa.int64()),
                "revenue": pa.array([], pa.float64()),
                "o_orderdate": pa.array([], pa.timestamp("us")),
            }
        )
    allp = pa.concat_tables(parts)
    ok = allp["l_orderkey"].to_numpy(zero_copy_only=False)
    od = allp["odate"].to_numpy(zero_copy_only=False)
    s = allp["cents"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ok, -s))[:10]
    return pa.table(
        {
            "l_orderkey": pa.array(ok[order], pa.int64()),
            "revenue": pa.array(
                [round6(v / 10000.0) for v in s[order].tolist()], pa.float64()
            ),
            "o_orderdate": pa.array(
                od[order].view("datetime64[us]"), pa.timestamp("us")
            ),
        }
    )


def q_tpch_q5v(sf_dir: str):
    """TPC-H Q5 (local supplier volume): 1996 revenue from lineitems
    where the supplier and the ordering customer share a nation in
    region ASIA, grouped by nation.

    Ray plan: supplier nation stamps lineitem by suppkey (co-partition
    attach, every key present), 1996 orders carry their customer's
    nation and stamp lineitem by orderkey with INNER semantics; the
    tiny ASIA nation set rides as a sorted closure array; per-batch
    integer partials reduce over O(nations) keys.  Output
    ``(n_name, revenue)`` sorted revenue desc (the Q5 order)."""
    import ray.data as rd

    from .bucket_agg import bucketed_group_agg
    from .extras.copart import attach_value
    from .extras.textstats import round6
    from .nputil import isin_sorted

    region = rd.read_parquet(os.path.join(sf_dir, "region.parquet"))
    nation = rd.read_parquet(os.path.join(sf_dir, "nation.parquet"))
    rtbl = pa.concat_tables(region.iter_batches(batch_format="pyarrow"))
    ntbl = pa.concat_tables(nation.iter_batches(batch_format="pyarrow"))
    asia_rk = rtbl.filter(pc.equal(rtbl["r_name"], "ASIA"))["r_regionkey"][0].as_py()
    nmask = pc.equal(ntbl["n_regionkey"], asia_rk)
    asia = np.sort(
        ntbl.filter(nmask)["n_nationkey"].to_numpy(zero_copy_only=False)
    )
    name_of = dict(
        zip(
            ntbl["n_nationkey"].to_pylist(),
            ntbl["n_name"].to_pylist(),
        )
    )

    supp = rd.read_parquet(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"],
    ).map_batches(
        lambda b: pa.table(
            {"node": b["s_suppkey"], "value": b["s_nationkey"]}
        ),
        batch_format="pyarrow",
    )

    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    ).map_batches(
        lambda b: pa.table(
            {"node": b["c_custkey"], "value": b["c_nationkey"]}
        ),
        batch_format="pyarrow",
    )

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )

    def ord_1996(batch: pa.Table) -> pa.Table:
        t = (
            pc.cast(batch["o_orderdate"], pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[Y]")
            .astype(np.int64)
            + 1970
        )
        m = t == 1996
        return pa.table(
            {
                "o_custkey": batch["o_custkey"].filter(pa.array(m)),
                "o_orderkey": batch["o_orderkey"].filter(pa.array(m)),
            }
        )

    ord_nat = attach_value(
        orders.map_batches(ord_1996, batch_format="pyarrow"),
        cust,
        key_col="o_custkey",
        out_col="c_nat",
        carry=["o_orderkey"],
    ).map_batches(
        lambda b: pa.table({"node": b["o_orderkey"], "value": b["c_nat"]}),
        batch_format="pyarrow",
    )

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def li_rows(batch: pa.Table) -> pa.Table:
        cents = np.rint(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)
            * (1.0 - batch["l_discount"].to_numpy(zero_copy_only=False))
            * 10000.0
        ).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "l_suppkey": batch["l_suppkey"],
                "cents": pa.array(cents, pa.int64()),
            }
        )

    with_snat = attach_value(
        li.map_batches(li_rows, batch_format="pyarrow"),
        supp,
        key_col="l_suppkey",
        out_col="s_nat",
        carry=["l_orderkey", "cents"],
    )
    with_both = attach_value(
        with_snat,
        ord_nat,
        key_col="l_orderkey",
        out_col="c_nat",
        carry=["cents", "s_nat"],
        missing="drop",
    )

    def local_partial(batch: pa.Table) -> pa.Table:
        sn = batch["s_nat"].to_numpy(zero_copy_only=False)
        cn = batch["c_nat"].to_numpy(zero_copy_only=False)
        cents = batch["cents"].to_numpy(zero_copy_only=False)
        in_asia, _ = isin_sorted(asia, sn)
        m = (sn == cn) & in_asia
        keys, inv = np.unique(sn[m], return_inverse=True)
        sums = np.zeros(len(keys), np.int64)
        np.add.at(sums, inv, cents[m])
        return pa.table(
            {
                "nat": pa.array(keys, pa.int64()),
                "cents": pa.array(sums, pa.int64()),
            }
        )

    agg = bucketed_group_agg(
        with_both.map_batches(local_partial, batch_format="pyarrow"),
        "nat",
        [("cents", "sum")],
    )
    rows = []
    for t in agg.iter_batches(batch_format="pyarrow"):
        for nk, c in zip(t["nat"].to_pylist(), t["sum(cents)"].to_pylist()):
            rows.append((name_of[nk], int(c)))
    rows.sort(key=lambda r: (-r[1], r[0]))
    return pa.table(
        {
            "n_name": pa.array([r[0] for r in rows], pa.string()),
            "revenue": pa.array(
                [round6(r[1] / 10000.0) for r in rows], pa.float64()
            ),
        }
    )


def q_tpch_q10v(sf_dir: str):
    """TPC-H Q10 (returned-item reporting): top 20 customers by revenue
    lost to returns (l_returnflag='R') on 1996-Q1 orders.

    Ray plan: Q1-1996 orders stamp their custkey onto 'R' lineitems
    (co-partition attach, INNER), per-batch integer partials reduce
    over O(customers) bucketed keys, a mergeable per-batch top-20
    bounds the collect; customer metadata (name, acctbal, nation) is a
    point-lookup finalize over the 20 winners (the doc_meta pattern —
    at corpus scale a row-group-pruned read, never a table scan)."""
    import ray.data as rd

    from .bucket_agg import bucketed_group_agg
    from .extras.copart import attach_value
    from .extras.textstats import round6

    q1_lo = int(np.datetime64("1996-01-01", "us").astype(np.int64))
    q1_hi = int(np.datetime64("1996-04-01", "us").astype(np.int64))

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )

    def ord_q1(batch: pa.Table) -> pa.Table:
        t = (
            pc.cast(batch["o_orderdate"], pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .view("int64")
        )
        m = (t >= q1_lo) & (t < q1_hi)
        return pa.table(
            {
                "node": batch["o_orderkey"].filter(pa.array(m)),
                "value": batch["o_custkey"].filter(pa.array(m)),
            }
        )

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    )

    def li_r(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["l_returnflag"], "R"))
        cents = np.rint(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)
            * (1.0 - t["l_discount"].to_numpy(zero_copy_only=False))
            * 10000.0
        ).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "cents": pa.array(cents, pa.int64()),
            }
        )

    joined = attach_value(
        li.map_batches(li_r, batch_format="pyarrow"),
        orders.map_batches(ord_q1, batch_format="pyarrow"),
        key_col="l_orderkey",
        out_col="cust",
        carry=["cents"],
        missing="drop",
    )
    agg = bucketed_group_agg(joined, "cust", [("cents", "sum")])

    def top20(batch: pa.Table) -> pa.Table:
        ck = batch["cust"].to_numpy(zero_copy_only=False)
        s = batch["sum(cents)"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ck, -s))[:20]
        return pa.table(
            {
                "cust": pa.array(ck[order], pa.int64()),
                "cents": pa.array(s[order], pa.int64()),
            }
        )

    parts = [
        t
        for t in agg.map_batches(top20, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
        if t.num_rows
    ]
    empty = pa.table(
        {
            "c_custkey": pa.array([], pa.int64()),
            "c_name": pa.array([], pa.string()),
            "revenue": pa.array([], pa.float64()),
            "c_acctbal": pa.array([], pa.float64()),
            "n_name": pa.array([], pa.string()),
        }
    )
    if not parts:
        return empty
    allp = pa.concat_tables(parts)
    ck = allp["cust"].to_numpy(zero_copy_only=False)
    s = allp["cents"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ck, -s))[:20]
    winners = ck[order]
    cents = s[order]

    cust_tbl = pa.concat_tables(
        rd.read_parquet(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
        )
        .map_batches(
            lambda b: b.filter(
                pc.is_in(b["c_custkey"], pa.array(winners, pa.int64()))
            ),
            batch_format="pyarrow",
        )
        .iter_batches(batch_format="pyarrow")
    )
    ntbl = pa.concat_tables(
        rd.read_parquet(os.path.join(sf_dir, "nation.parquet")).iter_batches(
            batch_format="pyarrow"
        )
    )
    nname = dict(
        zip(ntbl["n_nationkey"].to_pylist(), ntbl["n_name"].to_pylist())
    )
    meta = {
        r["c_custkey"]: (r["c_name"], r["c_acctbal"], nname[r["c_nationkey"]])
        for r in cust_tbl.to_pylist()
    }
    return pa.table(
        {
            "c_custkey": pa.array(winners, pa.int64()),
            "c_name": pa.array([meta[c][0] for c in winners.tolist()], pa.string()),
            "revenue": pa.array(
                [round6(v / 10000.0) for v in cents.tolist()], pa.float64()
            ),
            "c_acctbal": pa.array(
                [meta[c][1] for c in winners.tolist()], pa.float64()
            ),
            "n_name": pa.array(
                [meta[c][2] for c in winners.tolist()], pa.string()
            ),
        }
    )


def q_tpch_q7v(sf_dir: str):
    """TPC-H Q7 generalization (volume shipping matrix): 1995-96
    revenue for every CROSS-nation (supplier nation, customer nation)
    lane — the canonical pair filter empties at small sf, so the full
    matrix keeps the entry total at every scale.

    Ray plan: supplier nation stamps lineitem by suppkey, each order's
    customer nation stamps it by orderkey (both co-partition attach,
    every key present), per-batch integer partials reduce over the
    O(nations^2 x years) bucketed key."""
    import ray.data as rd

    from .bucket_agg import bucketed_group_agg
    from .extras.copart import attach_value
    from .extras.textstats import round6

    nation = rd.read_parquet(os.path.join(sf_dir, "nation.parquet"))
    ntbl = pa.concat_tables(nation.iter_batches(batch_format="pyarrow"))
    name_of = dict(
        zip(ntbl["n_nationkey"].to_pylist(), ntbl["n_name"].to_pylist())
    )

    supp = rd.read_parquet(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"],
    ).map_batches(
        lambda b: pa.table({"node": b["s_suppkey"], "value": b["s_nationkey"]}),
        batch_format="pyarrow",
    )
    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    ).map_batches(
        lambda b: pa.table({"node": b["c_custkey"], "value": b["c_nationkey"]}),
        batch_format="pyarrow",
    )
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey"],
    )
    ord_nat = attach_value(
        orders, cust, key_col="o_custkey", out_col="c_nat",
        carry=["o_orderkey"],
    ).map_batches(
        lambda b: pa.table({"node": b["o_orderkey"], "value": b["c_nat"]}),
        batch_format="pyarrow",
    )

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice",
                 "l_discount"],
    )

    def li_rows(batch: pa.Table) -> pa.Table:
        y = (
            pc.cast(batch["l_shipdate"], pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[Y]")
            .astype(np.int64)
            + 1970
        )
        m = (y >= 1995) & (y <= 1996)
        cents = np.rint(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)[m]
            * (1.0 - batch["l_discount"].to_numpy(zero_copy_only=False)[m])
            * 10000.0
        ).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"].filter(pa.array(m)),
                "l_suppkey": batch["l_suppkey"].filter(pa.array(m)),
                "l_year": pa.array(y[m], pa.int64()),
                "cents": pa.array(cents, pa.int64()),
            }
        )

    with_snat = attach_value(
        li.map_batches(li_rows, batch_format="pyarrow"),
        supp,
        key_col="l_suppkey",
        out_col="s_nat",
        carry=["l_orderkey", "l_year", "cents"],
    )
    with_both = attach_value(
        with_snat,
        ord_nat,
        key_col="l_orderkey",
        out_col="c_nat",
        carry=["l_year", "cents", "s_nat"],
    )

    def cross_partial(batch: pa.Table) -> pa.Table:
        sn = batch["s_nat"].to_numpy(zero_copy_only=False)
        cn = batch["c_nat"].to_numpy(zero_copy_only=False)
        y = batch["l_year"].to_numpy(zero_copy_only=False)
        cents = batch["cents"].to_numpy(zero_copy_only=False)
        m = sn != cn
        key = sn[m] * 100_000 + cn[m] * 100 + (y[m] - 1995)
        keys, inv = np.unique(key, return_inverse=True)
        sums = np.zeros(len(keys), np.int64)
        np.add.at(sums, inv, cents[m])
        return pa.table(
            {
                "key": pa.array(keys, pa.int64()),
                "cents": pa.array(sums, pa.int64()),
            }
        )

    agg = bucketed_group_agg(
        with_both.map_batches(cross_partial, batch_format="pyarrow"),
        "key",
        [("cents", "sum")],
    )
    rows = []
    for t in agg.iter_batches(batch_format="pyarrow"):
        for k, c in zip(t["key"].to_pylist(), t["sum(cents)"].to_pylist()):
            sn, rest = divmod(int(k), 100_000)
            cn, yy = divmod(rest, 100)
            rows.append((name_of[sn], name_of[cn], 1995 + yy, int(c)))
    rows.sort(key=lambda r: (r[0], r[1], r[2]))
    return pa.table(
        {
            "supp_nation": pa.array([r[0] for r in rows], pa.string()),
            "cust_nation": pa.array([r[1] for r in rows], pa.string()),
            "l_year": pa.array([r[2] for r in rows], pa.int64()),
            "revenue": pa.array(
                [round6(r[3] / 10000.0) for r in rows], pa.float64()
            ),
        }
    )


TPCH_Q18_QTY = 300


def q_tpch_q18v(sf_dir: str):
    """TPC-H Q18 (large-volume customers): top 100 orders whose total
    quantity exceeds 300 units, with customer name and order header.

    Ray plan: lineitem reduces FIRST to per-order integer quantity
    cents (bucketed sum over the order grain — the fact table never
    carries header columns through the shuffle); the > threshold
    winners are a tiny set, so the header+name finalize is a pruned
    point-lookup read (doc_meta pattern)."""
    import ray.data as rd

    from .bucket_agg import bucketed_group_agg

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_quantity"],
    )

    def qty_cents(batch: pa.Table) -> pa.Table:
        qc = np.rint(
            batch["l_quantity"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table(
            {"l_orderkey": batch["l_orderkey"], "qc": pa.array(qc, pa.int64())}
        )

    agg = bucketed_group_agg(
        li.map_batches(qty_cents, batch_format="pyarrow"),
        "l_orderkey",
        [("qc", "sum")],
    )

    def over(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.greater(batch["sum(qc)"], TPCH_Q18_QTY * 100)
        )

    parts = [
        t
        for t in agg.map_batches(over, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
        if t.num_rows
    ]
    empty = pa.table(
        {
            "c_name": pa.array([], pa.string()),
            "c_custkey": pa.array([], pa.int64()),
            "o_orderkey": pa.array([], pa.int64()),
            "o_orderdate": pa.array([], pa.timestamp("us")),
            "o_totalprice": pa.array([], pa.float64()),
            "total_qty": pa.array([], pa.float64()),
        }
    )
    if not parts:
        return empty
    win = pa.concat_tables(parts)
    wkeys = win["l_orderkey"].to_numpy(zero_copy_only=False)
    wq = dict(zip(wkeys.tolist(), win["sum(qc)"].to_pylist()))
    key_arr = pa.array(wkeys, pa.int64())

    ords = pa.concat_tables(
        rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
        )
        .map_batches(
            lambda b: b.filter(pc.is_in(b["o_orderkey"], key_arr)),
            batch_format="pyarrow",
        )
        .iter_batches(batch_format="pyarrow")
    )
    ck_arr = pc.unique(ords["o_custkey"].combine_chunks())
    cust = pa.concat_tables(
        rd.read_parquet(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_name"],
        )
        .map_batches(
            lambda b: b.filter(pc.is_in(b["c_custkey"], ck_arr)),
            batch_format="pyarrow",
        )
        .iter_batches(batch_format="pyarrow")
    )
    cname = dict(
        zip(cust["c_custkey"].to_pylist(), cust["c_name"].to_pylist())
    )
    rows = []
    for r in ords.to_pylist():
        rows.append(
            (
                cname[r["o_custkey"]],
                r["o_custkey"],
                r["o_orderkey"],
                r["o_orderdate"],
                r["o_totalprice"],
                wq[r["o_orderkey"]] / 100.0,
            )
        )
    rows.sort(key=lambda r: (-r[4], r[2]))
    rows = rows[:100]
    return pa.table(
        {
            "c_name": pa.array([r[0] for r in rows], pa.string()),
            "c_custkey": pa.array([r[1] for r in rows], pa.int64()),
            "o_orderkey": pa.array([r[2] for r in rows], pa.int64()),
            "o_orderdate": pa.array([r[3] for r in rows], pa.timestamp("us")),
            "o_totalprice": pa.array([r[4] for r in rows], pa.float64()),
            "total_qty": pa.array([r[5] for r in rows], pa.float64()),
        }
    )


def q_tpch_q4v(sf_dir: str):
    """TPC-H Q4 variant (order-priority checking): orders placed in
    H1-1996 with at least one lineitem shipped more than 30 days after
    the order date, counted by priority — the EXISTS semi-join shape
    (the schema has no commit/receipt dates, so 'late' is
    ship > order + 30d).

    Ray plan: window orders stamp their date onto lineitem by orderkey
    (co-partition attach, INNER), the late predicate filters, a
    bucketed distinct reduces to the late-order key set, and a second
    INNER attach back onto the window orders is the semi-join; counts
    reduce per priority code (the digit prefix) with the tiny
    code->name map collected from per-batch partials."""
    import ray.data as rd

    from .bucket_agg import bucketed_group_agg
    from .extras.copart import attach_value

    lo_us = int(np.datetime64("1996-01-01", "us").astype(np.int64))
    hi_us = int(np.datetime64("1996-07-01", "us").astype(np.int64))
    late_us = 30 * 86_400 * 1_000_000

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )

    def owin_dates(batch: pa.Table) -> pa.Table:
        t = (
            pc.cast(batch["o_orderdate"], pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .view("int64")
        )
        m = (t >= lo_us) & (t < hi_us)
        return pa.table(
            {
                "node": batch["o_orderkey"].filter(pa.array(m)),
                "value": pa.array(t[m], pa.int64()),
            }
        )

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_shipdate"],
    )

    def li_rows(batch: pa.Table) -> pa.Table:
        s = (
            pc.cast(batch["l_shipdate"], pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .view("int64")
        )
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "ship": pa.array(s, pa.int64()),
            }
        )

    with_od = attach_value(
        li.map_batches(li_rows, batch_format="pyarrow"),
        orders.map_batches(owin_dates, batch_format="pyarrow"),
        key_col="l_orderkey",
        out_col="odate",
        carry=["ship"],
        missing="drop",
    )

    def late(batch: pa.Table) -> pa.Table:
        ship = batch["ship"].to_numpy(zero_copy_only=False)
        od = batch["odate"].to_numpy(zero_copy_only=False)
        m = ship > od + late_us
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"].filter(pa.array(m)),
                "one": pa.array(np.ones(int(m.sum()), np.int64), pa.int64()),
            }
        )

    late_set = bucketed_group_agg(
        with_od.map_batches(late, batch_format="pyarrow"),
        "l_orderkey",
        [("one", "min")],
    ).map_batches(
        lambda b: pa.table({"node": b["l_orderkey"], "value": b["min(one)"]}),
        batch_format="pyarrow",
    )

    def owin_prio(batch: pa.Table) -> pa.Table:
        t = (
            pc.cast(batch["o_orderdate"], pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .view("int64")
        )
        m = (t >= lo_us) & (t < hi_us)
        prio = batch["o_orderpriority"].filter(pa.array(m)).to_pylist()
        codes = np.empty(len(prio), dtype=np.int64)
        for i, p in enumerate(prio):
            # the fixture's priorities are 'N-NAME'; anything else is a
            # data-contract break we refuse rather than mis-bucket
            if not p or not p[0].isdigit():
                raise ValueError(f"unparseable o_orderpriority {p!r}")
            codes[i] = int(p[0])
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"].filter(pa.array(m)),
                "code": pa.array(codes, pa.int64()),
                "name": pa.array(prio, pa.string()),
            }
        )

    # materialized ONCE: the attach target below and the tiny
    # code->name map both read it — no second orders scan
    owin = orders.map_batches(owin_prio, batch_format="pyarrow").materialize()
    joined = attach_value(
        owin,
        late_set,
        key_col="o_orderkey",
        out_col="flag",
        carry=["code"],
        missing="drop",
    )

    def count_partial(batch: pa.Table) -> pa.Table:
        codes = batch["code"].to_numpy(zero_copy_only=False)
        keys, counts = np.unique(codes, return_counts=True)
        return pa.table(
            {
                "code": pa.array(keys, pa.int64()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    agg = bucketed_group_agg(
        joined.map_batches(count_partial, batch_format="pyarrow"),
        "code",
        [("n", "sum")],
    )
    # tiny code -> priority-name map from the SAME materialized window
    # rows (no extra orders scan); a code mapping to two names would be
    # a silent count-merge, so it raises instead
    names: dict[int, str] = {}

    def name_partial(batch: pa.Table) -> pa.Table:
        seen: dict[int, str] = {}
        for c, p in zip(
            batch["code"].to_pylist(), batch["name"].to_pylist()
        ):
            seen[c] = p
        return pa.table(
            {
                "code": pa.array(list(seen.keys()), pa.int64()),
                "name": pa.array(list(seen.values()), pa.string()),
            }
        )

    for t in owin.map_batches(
        name_partial, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        for c, p in zip(t["code"].to_pylist(), t["name"].to_pylist()):
            if names.setdefault(c, p) != p:
                raise ValueError(
                    f"priority code {c} maps to both {names[c]!r} and {p!r}"
                )
    rows = []
    for t in agg.iter_batches(batch_format="pyarrow"):
        for c, n in zip(t["code"].to_pylist(), t["sum(n)"].to_pylist()):
            rows.append((names[c], int(n)))
    rows.sort()
    return pa.table(
        {
            "o_orderpriority": pa.array([r[0] for r in rows], pa.string()),
            "order_count": pa.array([r[1] for r in rows], pa.int64()),
        }
    )


def q_tpch_q13v(sf_dir: str):
    """TPC-H Q13 (customer distribution): how many customers placed
    exactly N orders, INCLUDING the zero-order customers the left join
    exists for.

    Ray plan: per-custkey order counts (bucketed sum of ones) co-group
    with the customer key set (marker rows) so absent customers emit
    count 0 — no broadcast, one narrow exchange each way — then an
    O(distinct counts) histogram reduce."""
    import ray.data as rd

    from .bucket_agg import bucketed_group_agg

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey"]
    )

    def ones(batch: pa.Table) -> pa.Table:
        k = batch["o_custkey"].to_numpy(zero_copy_only=False)
        keys, counts = np.unique(k, return_counts=True)
        return pa.table(
            {
                "c_custkey": pa.array(keys, pa.int64()),
                "cnt": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    per_cust = bucketed_group_agg(
        orders.map_batches(ones, batch_format="pyarrow"),
        "c_custkey",
        [("cnt", "sum")],
    ).map_batches(
        lambda b: pa.table(
            {"c_custkey": b["c_custkey"], "cnt": b["sum(cnt)"]}
        ),
        batch_format="pyarrow",
    )

    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"]
    ).map_batches(
        lambda b: pa.table(
            {
                "c_custkey": b["c_custkey"],
                "cnt": pa.array(
                    np.zeros(b.num_rows, np.int64), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )

    def bucket(batch: pa.Table) -> pa.Table:
        k = batch["c_custkey"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "_b", pa.array((k % 64).astype(np.int64), pa.int64())
        )

    def per_customer(group: pa.Table) -> pa.Table:
        # each customer has one marker row (0) and at most one count
        # row; the sum per key is its order count
        agg = (
            group.select(["c_custkey", "cnt"])
            .group_by("c_custkey")
            .aggregate([("cnt", "sum")])
        )
        cc = agg["cnt_sum"].to_numpy(zero_copy_only=False)
        keys, counts = np.unique(cc, return_counts=True)
        return pa.table(
            {
                "c_count": pa.array(keys, pa.int64()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    hist = bucketed_group_agg(
        per_cust.union(cust)
        .map_batches(bucket, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(per_customer, batch_format="pyarrow"),
        "c_count",
        [("n", "sum")],
    )
    rows = []
    for t in hist.iter_batches(batch_format="pyarrow"):
        rows.extend(
            zip(t["c_count"].to_pylist(), t["sum(n)"].to_pylist())
        )
    rows.sort(key=lambda r: (-r[1], -r[0]))
    return pa.table(
        {
            "c_count": pa.array([r[0] for r in rows], pa.int64()),
            "custdist": pa.array([r[1] for r in rows], pa.int64()),
        }
    )


def q_tpch_q22v(sf_dir: str):
    """TPC-H Q22 variant (global sales opportunity; the schema has no
    phone column, so no country-code grouping): count and total balance
    of customers with an above-average positive account balance and NO
    orders — the anti-join + global-scalar-subquery family.

    Exactness law: the threshold compare cross-multiplies integers
    (cents_i * n_pos > total_cents) instead of comparing against a
    float average, so summation order cannot flip a boundary customer;
    the oracle mirrors the same inequality."""
    import ray.data as rd

    from .bucket_agg import bucketed_group_agg

    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_acctbal"],
    )

    def bal_partial(batch: pa.Table) -> pa.Table:
        cents = np.rint(
            batch["c_acctbal"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        pos = cents > 0
        return pa.table(
            {
                "_one": pa.array([0], pa.int32()),
                "n": pa.array([int(pos.sum())], pa.int64()),
                "s": pa.array([int(cents[pos].sum())], pa.int64()),
            }
        )

    agg = (
        cust.map_batches(bal_partial, batch_format="pyarrow")
        .groupby("_one")
        .sum(["n", "s"])
    )
    t = pa.concat_tables(agg.iter_batches(batch_format="pyarrow"))
    n_pos = int(t["sum(n)"][0].as_py())
    total = int(t["sum(s)"][0].as_py())

    # co-group customers with the ordering-customer key set: keep
    # above-threshold customers with NO order marker in their run
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey"]
    )

    def order_marks(batch: pa.Table) -> pa.Table:
        keys = np.unique(batch["o_custkey"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "c_custkey": pa.array(keys, pa.int64()),
                "cents": pa.array(
                    np.full(len(keys), np.int64(-1)), pa.int64()
                ),
                "_side": pa.array(np.ones(len(keys), np.int8), pa.int8()),
            }
        )

    def cust_rows(batch: pa.Table) -> pa.Table:
        cents = np.rint(
            batch["c_acctbal"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "c_custkey": batch["c_custkey"],
                "cents": pa.array(cents, pa.int64()),
                "_side": pa.array(np.zeros(batch.num_rows, np.int8), pa.int8()),
            }
        )

    def bucket(batch: pa.Table) -> pa.Table:
        k = batch["c_custkey"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "_b", pa.array((k % 64).astype(np.int64), pa.int64())
        )

    def anti(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group,
            sort_keys=[("c_custkey", "ascending"), ("_side", "ascending")],
        )
        g = group.take(order)
        k = g["c_custkey"].to_numpy(zero_copy_only=False)
        cents = g["cents"].to_numpy(zero_copy_only=False)
        side = g["_side"].to_numpy(zero_copy_only=False)
        n = len(k)
        cnt = 0
        s = 0
        i = 0
        while i < n:
            j = i
            has_order = False
            cval = None
            while j < n and k[j] == k[i]:
                if side[j] == 1:
                    has_order = True
                else:
                    cval = int(cents[j])
                j += 1
            # threshold: cents * n_pos > total (integer cross-multiply)
            if (
                not has_order
                and cval is not None
                and cval * n_pos > total
            ):
                cnt += 1
                s += cval
            i = j
        return pa.table(
            {
                "_one": pa.array([0], pa.int32()),
                "numcust": pa.array([cnt], pa.int64()),
                "cents": pa.array([s], pa.int64()),
            }
        )

    final = (
        cust.map_batches(cust_rows, batch_format="pyarrow")
        .union(orders.map_batches(order_marks, batch_format="pyarrow"))
        .map_batches(bucket, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(anti, batch_format="pyarrow")
        .groupby("_one")
        .sum(["numcust", "cents"])
    )
    ft = pa.concat_tables(final.iter_batches(batch_format="pyarrow"))
    return pa.table(
        {
            "numcust": pa.array([int(ft["sum(numcust)"][0].as_py())], pa.int64()),
            "totacctbal": pa.array(
                [int(ft["sum(cents)"][0].as_py()) / 100.0], pa.float64()
            ),
        }
    )


def q_tpch_q8v(sf_dir: str):
    """TPC-H Q8 variant (national market share): among 1995-1996 revenue
    from PROMO-type parts ordered by ASIA-region customers, the share
    supplied by NATION_2, per order year.

    Ray plan: the PROMO partkey set and the supplier->nation map ride as
    sorted closure arrays (small sides, broadcast once per task);
    year-filtered orders stamp their customer's nation via co-partition
    ``attach_value`` (INNER), keep ASIA customers, and become an
    (orderkey -> year) lookup that stamps lineitem INNER; per-batch
    integer e4-cent partials reduce over O(years) keys.  Share =
    num_cents / den_cents — one division of two exact integers, 6dp,
    mirrored by the oracle."""
    import ray.data as rd

    from .bucket_agg import bucketed_group_agg
    from .extras.copart import attach_value
    from .extras.textstats import round6
    from .nputil import isin_sorted

    region = pa.concat_tables(
        rd.read_parquet(os.path.join(sf_dir, "region.parquet")).iter_batches(
            batch_format="pyarrow"
        )
    )
    nation = pa.concat_tables(
        rd.read_parquet(os.path.join(sf_dir, "nation.parquet")).iter_batches(
            batch_format="pyarrow"
        )
    )
    asia_rk = region.filter(pc.equal(region["r_name"], "ASIA"))[
        "r_regionkey"
    ][0].as_py()
    asia = np.sort(
        nation.filter(pc.equal(nation["n_regionkey"], asia_rk))[
            "n_nationkey"
        ].to_numpy(zero_copy_only=False)
    )
    target_nk = nation.filter(pc.equal(nation["n_name"], "NATION_2"))[
        "n_nationkey"
    ][0].as_py()

    part = pa.concat_tables(
        rd.read_parquet(
            os.path.join(sf_dir, "part.parquet"),
            columns=["p_partkey", "p_type"],
        ).iter_batches(batch_format="pyarrow")
    )
    promo = np.sort(
        part.filter(pc.equal(part["p_type"], "PROMO"))["p_partkey"].to_numpy(
            zero_copy_only=False
        )
    )
    supp = pa.concat_tables(
        rd.read_parquet(
            os.path.join(sf_dir, "supplier.parquet"),
            columns=["s_suppkey", "s_nationkey"],
        ).iter_batches(batch_format="pyarrow")
    )
    sk = supp["s_suppkey"].to_numpy(zero_copy_only=False)
    sn = supp["s_nationkey"].to_numpy(zero_copy_only=False)
    so = np.argsort(sk)
    sk, sn = sk[so], sn[so]

    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    ).map_batches(
        lambda b: pa.table({"node": b["c_custkey"], "value": b["c_nationkey"]}),
        batch_format="pyarrow",
    )
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )

    def ord_years(batch: pa.Table) -> pa.Table:
        y = (
            pc.cast(batch["o_orderdate"], pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[Y]")
            .astype(np.int64)
            + 1970
        )
        m = (y == 1995) | (y == 1996)
        return pa.table(
            {
                "o_custkey": batch["o_custkey"].filter(pa.array(m)),
                "o_orderkey": batch["o_orderkey"].filter(pa.array(m)),
                "o_year": pa.array(y[m], pa.int64()),
            }
        )

    ord_nat = attach_value(
        orders.map_batches(ord_years, batch_format="pyarrow"),
        cust,
        key_col="o_custkey",
        out_col="c_nat",
        carry=["o_orderkey", "o_year"],
    )

    def asia_orders(batch: pa.Table) -> pa.Table:
        cn = batch["c_nat"].to_numpy(zero_copy_only=False)
        m, _ = isin_sorted(asia, cn)
        return pa.table(
            {
                "node": batch["o_orderkey"].filter(pa.array(m)),
                "value": batch["o_year"].filter(pa.array(m)),
            }
        )

    ord_lookup = ord_nat.map_batches(asia_orders, batch_format="pyarrow")

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=[
            "l_orderkey", "l_partkey", "l_suppkey",
            "l_extendedprice", "l_discount",
        ],
    )

    def li_rows(batch: pa.Table) -> pa.Table:
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False)
        m, _ = isin_sorted(promo, pk)
        cents = np.rint(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)[m]
            * (1.0 - batch["l_discount"].to_numpy(zero_copy_only=False)[m])
            * 10000.0
        ).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"].filter(pa.array(m)),
                "l_suppkey": batch["l_suppkey"].filter(pa.array(m)),
                "cents": pa.array(cents, pa.int64()),
            }
        )

    with_year = attach_value(
        li.map_batches(li_rows, batch_format="pyarrow"),
        ord_lookup,
        key_col="l_orderkey",
        out_col="o_year",
        carry=["l_suppkey", "cents"],
        missing="drop",
    )

    def partial(batch: pa.Table) -> pa.Table:
        yr = batch["o_year"].to_numpy(zero_copy_only=False)
        cents = batch["cents"].to_numpy(zero_copy_only=False)
        lsk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        if len(sk):
            pos = np.searchsorted(sk, lsk).clip(max=len(sk) - 1)
            is_target = (sk[pos] == lsk) & (sn[pos] == target_nk)
        else:
            is_target = np.zeros(len(lsk), dtype=bool)
        keys, inv = np.unique(yr, return_inverse=True)
        den = np.zeros(len(keys), np.int64)
        num = np.zeros(len(keys), np.int64)
        np.add.at(den, inv, cents)
        np.add.at(num, inv[is_target], cents[is_target])
        return pa.table(
            {
                "o_year": pa.array(keys, pa.int64()),
                "num": pa.array(num, pa.int64()),
                "den": pa.array(den, pa.int64()),
            }
        )

    agg = bucketed_group_agg(
        with_year.map_batches(partial, batch_format="pyarrow"),
        "o_year",
        [("num", "sum"), ("den", "sum")],
    )
    rows = []
    for t in agg.iter_batches(batch_format="pyarrow"):
        for y, nu, de in zip(
            t["o_year"].to_pylist(),
            t["sum(num)"].to_pylist(),
            t["sum(den)"].to_pylist(),
        ):
            if de > 0:
                rows.append((int(y), round6(int(nu) / int(de))))
    rows.sort()
    return pa.table(
        {
            "o_year": pa.array([r[0] for r in rows], pa.int64()),
            "mkt_share": pa.array([r[1] for r in rows], pa.float64()),
        }
    )


def q_tpch_q15v(sf_dir: str):
    """TPC-H Q15 (top supplier): supplier(s) with the maximum revenue
    over 1996-Q1 shipments — exact integer e4-cent totals, so the
    global max and its tie set are order-free; ties all emitted,
    suppkey-sorted, names joined from the small side."""
    import ray.data as rd

    from .bucket_agg import bucketed_group_agg
    from .extras.textstats import round6

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )
    lo = np.datetime64("1996-01-01", "us").astype(np.int64)
    hi = np.datetime64("1996-04-01", "us").astype(np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        ts = (
            pc.cast(batch["l_shipdate"], pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        m = (ts >= lo) & (ts < hi)
        cents = np.rint(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)[m]
            * (1.0 - batch["l_discount"].to_numpy(zero_copy_only=False)[m])
            * 10000.0
        ).astype(np.int64)
        keys, inv = np.unique(
            batch["l_suppkey"].to_numpy(zero_copy_only=False)[m],
            return_inverse=True,
        )
        sums = np.zeros(len(keys), np.int64)
        np.add.at(sums, inv, cents)
        return pa.table(
            {
                "sk": pa.array(keys, pa.int64()),
                "cents": pa.array(sums, pa.int64()),
            }
        )

    agg = bucketed_group_agg(
        li.map_batches(partial, batch_format="pyarrow"), "sk", [("cents", "sum")]
    )
    totals: dict[int, int] = {}
    for t in agg.iter_batches(batch_format="pyarrow"):
        for s, c in zip(t["sk"].to_pylist(), t["sum(cents)"].to_pylist()):
            totals[int(s)] = int(c)
    if not totals:
        return pa.table(
            {
                "s_suppkey": pa.array([], pa.int64()),
                "s_name": pa.array([], pa.string()),
                "total_revenue": pa.array([], pa.float64()),
            }
        )
    best = max(totals.values())
    winners = sorted(s for s, c in totals.items() if c == best)
    supp = pa.concat_tables(
        rd.read_parquet(
            os.path.join(sf_dir, "supplier.parquet"),
            columns=["s_suppkey", "s_name"],
        ).iter_batches(batch_format="pyarrow")
    )
    name_of = dict(
        zip(supp["s_suppkey"].to_pylist(), supp["s_name"].to_pylist())
    )
    return pa.table(
        {
            "s_suppkey": pa.array(winners, pa.int64()),
            "s_name": pa.array([name_of[s] for s in winners], pa.string()),
            "total_revenue": pa.array(
                [round6(best / 10000.0)] * len(winners), pa.float64()
            ),
        }
    )


def q_tpch_q17v(sf_dir: str):
    """TPC-H Q17 (small-quantity-order revenue): average yearly revenue
    lost if Brand#23 orders below 20%% of the part's average quantity
    were not taken.

    Exactness law: the per-part threshold compare cross-multiplies
    integers (5·q·cnt < sum_q, quantities are integer-valued) instead
    of comparing against the float 0.2·avg, so block layout cannot flip
    a boundary row; two passes over the brand-filtered rows (per-part
    stats, then the gated cent sum)."""
    import ray.data as rd

    from .bucket_agg import bucketed_group_agg
    from .extras.textstats import round6
    from .nputil import isin_sorted

    part = pa.concat_tables(
        rd.read_parquet(
            os.path.join(sf_dir, "part.parquet"),
            columns=["p_partkey", "p_brand"],
        ).iter_batches(batch_format="pyarrow")
    )
    keep = np.sort(
        part.filter(pc.equal(part["p_brand"], "Brand#23"))[
            "p_partkey"
        ].to_numpy(zero_copy_only=False)
    )
    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )

    def stats_partial(batch: pa.Table) -> pa.Table:
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False)
        m, _ = isin_sorted(keep, pk)
        q = np.rint(
            batch["l_quantity"].to_numpy(zero_copy_only=False)[m]
        ).astype(np.int64)
        keys, inv = np.unique(pk[m], return_inverse=True)
        sums = np.zeros(len(keys), np.int64)
        cnts = np.zeros(len(keys), np.int64)
        np.add.at(sums, inv, q)
        np.add.at(cnts, inv, 1)
        return pa.table(
            {
                "pk": pa.array(keys, pa.int64()),
                "sq": pa.array(sums, pa.int64()),
                "n": pa.array(cnts, pa.int64()),
            }
        )

    agg = bucketed_group_agg(
        li.map_batches(stats_partial, batch_format="pyarrow"),
        "pk",
        [("sq", "sum"), ("n", "sum")],
    )
    pks, sqs, cns = [], [], []
    for t in agg.iter_batches(batch_format="pyarrow"):
        pks.extend(t["pk"].to_pylist())
        sqs.extend(t["sum(sq)"].to_pylist())
        cns.extend(t["sum(n)"].to_pylist())
    pk_arr = np.asarray(pks, np.int64)
    o = np.argsort(pk_arr)
    pk_arr = pk_arr[o]
    sq_arr = np.asarray(sqs, np.int64)[o]
    cn_arr = np.asarray(cns, np.int64)[o]

    def gated_cents(batch: pa.Table) -> pa.Table:
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False)
        m, _ = isin_sorted(pk_arr, pk)
        q = np.rint(
            batch["l_quantity"].to_numpy(zero_copy_only=False)[m]
        ).astype(np.int64)
        pos = np.searchsorted(pk_arr, pk[m])
        gate = 5 * q * cn_arr[pos] < sq_arr[pos]
        cents = np.rint(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)[m][gate]
            * 10000.0
        ).astype(np.int64)
        return pa.table({"cents": pa.array([int(cents.sum())], pa.int64())})

    total = 0
    for t in li.map_batches(gated_cents, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        total += sum(t["cents"].to_pylist())
    return pa.table(
        {
            "avg_yearly": pa.array(
                [round6((total / 10000.0) / 7.0)], pa.float64()
            )
        }
    )


Q19_BANDS = [  # (brand, size_lo, size_hi, qty_lo, qty_hi)
    ("Brand#12", 1, 5, 1, 11),
    ("Brand#23", 1, 10, 10, 20),
    ("Brand#34", 1, 15, 20, 30),
]


def q_tpch_q19v(sf_dir: str):
    """TPC-H Q19 (discounted revenue, no container column): revenue from
    lineitems matching ANY of three (brand, size-range, quantity-range)
    bands — the OR-of-conjunctive-bands predicate family.  Per-band
    partkey sets ride as sorted closure arrays; quantity compares are
    integer; one e4-cent total row (always emitted)."""
    import ray.data as rd

    from .extras.textstats import round6
    from .nputil import isin_sorted

    part = pa.concat_tables(
        rd.read_parquet(
            os.path.join(sf_dir, "part.parquet"),
            columns=["p_partkey", "p_brand", "p_size"],
        ).iter_batches(batch_format="pyarrow")
    )
    band_keys = []
    for brand, slo, shi, _qlo, _qhi in Q19_BANDS:
        m = pc.and_(
            pc.equal(part["p_brand"], brand),
            pc.and_(
                pc.greater_equal(part["p_size"], slo),
                pc.less_equal(part["p_size"], shi),
            ),
        )
        band_keys.append(
            np.sort(
                part.filter(m)["p_partkey"].to_numpy(zero_copy_only=False)
            )
        )

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False)
        q = np.rint(
            batch["l_quantity"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        m = np.zeros(len(pk), dtype=bool)
        for keys, (_b, _sl, _sh, qlo, qhi) in zip(band_keys, Q19_BANDS):
            bm, _ = isin_sorted(keys, pk)
            m |= bm & (q >= qlo) & (q <= qhi)
        cents = np.rint(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)[m]
            * (1.0 - batch["l_discount"].to_numpy(zero_copy_only=False)[m])
            * 10000.0
        ).astype(np.int64)
        return pa.table({"cents": pa.array([int(cents.sum())], pa.int64())})

    total = 0
    for t in li.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        total += sum(t["cents"].to_pylist())
    return pa.table(
        {"revenue": pa.array([round6(total / 10000.0)], pa.float64())}
    )


Q21_LATE_DAYS = 60


def q_tpch_q21v(sf_dir: str):
    """TPC-H Q21 variant (suppliers who kept orders waiting; the schema
    has no commit/receipt dates, so "late" = shipped more than 60 days
    after the order date): for 'F'-status multi-supplier orders where
    EXACTLY ONE supplier shipped late, count the offending orders per
    supplier — the EXISTS / NOT-EXISTS pair collapsed into per-order
    (n_suppliers, n_late_suppliers) integer aggregates over one
    bucketed orderkey exchange."""
    import ray.data as rd

    from .bucket_agg import _bucket_ids, bucketed_group_agg
    from .extras.copart import attach_value

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderstatus", "o_orderdate"],
    )

    def ord_f(batch: pa.Table) -> pa.Table:
        m = pc.equal(batch["o_orderstatus"], "F")
        od = (
            pc.cast(batch["o_orderdate"].filter(m), pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return pa.table(
            {
                "node": batch["o_orderkey"].filter(m),
                "value": pa.array(od, pa.int64()),
            }
        )

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    )

    def li_rows(batch: pa.Table) -> pa.Table:
        ts = (
            pc.cast(batch["l_shipdate"], pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "l_suppkey": batch["l_suppkey"],
                "ship_us": pa.array(ts, pa.int64()),
            }
        )

    stamped = attach_value(
        li.map_batches(li_rows, batch_format="pyarrow"),
        orders.map_batches(ord_f, batch_format="pyarrow"),
        key_col="l_orderkey",
        out_col="od_us",
        carry=["l_suppkey", "ship_us"],
        missing="drop",
    )
    late_cut = np.int64(Q21_LATE_DAYS) * 86_400_000_000

    def tag(batch: pa.Table) -> pa.Table:
        late = (
            batch["ship_us"].to_numpy(zero_copy_only=False)
            > batch["od_us"].to_numpy(zero_copy_only=False) + late_cut
        )
        t = pa.table(
            {
                "ok": batch["l_orderkey"],
                "sk": batch["l_suppkey"],
                "late": pa.array(late.astype(np.int64), pa.int64()),
            }
        )
        return t.append_column(
            "_b", pa.array(_bucket_ids(t, ["ok"], 64), pa.int64())
        )

    def per_order(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group, sort_keys=[("ok", "ascending"), ("sk", "ascending")]
        )
        t = group.take(order)
        ok = t["ok"].to_numpy(zero_copy_only=False)
        sk = t["sk"].to_numpy(zero_copy_only=False)
        late = t["late"].to_numpy(zero_copy_only=False)
        n = len(ok)
        if n == 0:
            return pa.table({"sk": pa.array([], pa.int64())})
        # collapse to distinct (order, supplier) pairs with any(late)
        new_pair = np.empty(n, dtype=bool)
        new_pair[0] = True
        new_pair[1:] = (ok[1:] != ok[:-1]) | (sk[1:] != sk[:-1])
        pair_id = np.cumsum(new_pair) - 1
        n_pairs = int(pair_id[-1]) + 1
        p_ok = ok[new_pair]
        p_sk = sk[new_pair]
        p_late = np.zeros(n_pairs, np.int64)
        np.maximum.at(p_late, pair_id, late)
        # per order: supplier count and late-supplier count
        new_ord = np.empty(n_pairs, dtype=bool)
        new_ord[0] = True
        new_ord[1:] = p_ok[1:] != p_ok[:-1]
        ord_id = np.cumsum(new_ord) - 1
        n_ord = int(ord_id[-1]) + 1
        n_supp = np.bincount(ord_id, minlength=n_ord)
        n_late = np.zeros(n_ord, np.int64)
        np.add.at(n_late, ord_id, p_late)
        good = (n_supp[ord_id] >= 2) & (n_late[ord_id] == 1) & (p_late == 1)
        return pa.table({"sk": pa.array(p_sk[good], pa.int64())})

    winners = (
        stamped.map_batches(tag, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(per_order, batch_format="pyarrow")
    )
    counts = bucketed_group_agg(winners, "sk", [("sk", "count")])
    rows = []
    for t in counts.iter_batches(batch_format="pyarrow"):
        for s, c in zip(t["sk"].to_pylist(), t["count()"].to_pylist()):
            rows.append((int(s), int(c)))
    supp = pa.concat_tables(
        rd.read_parquet(
            os.path.join(sf_dir, "supplier.parquet"),
            columns=["s_suppkey", "s_name"],
        ).iter_batches(batch_format="pyarrow")
    )
    name_of = dict(
        zip(supp["s_suppkey"].to_pylist(), supp["s_name"].to_pylist())
    )
    named = sorted(
        ((name_of[s], c) for s, c in rows), key=lambda r: (-r[1], r[0])
    )
    return pa.table(
        {
            "s_name": pa.array([r[0] for r in named], pa.string()),
            "numwait": pa.array([r[1] for r in named], pa.int64()),
        }
    )


def q_gopher_signals(sf_dir: str):
    """Gopher-rule symbol/layout signals per doc: '#' count, '...'
    (ellipsis) count, bullet-line fraction ('-'/'*' starts) and mean
    kept-token length — the remaining quality-rule family next to
    quality_stats and repetition_signals.  Pure per-doc integer counts;
    two 6dp single divisions."""
    from .extras.textstats import round6, simple_tokens

    def signals(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"]
        nh, ne, blf, mtl = [], [], [], []
        for t in batch["text"].to_pylist():
            t = t or ""
            nh.append(t.count("#"))
            ne.append(t.count("..."))
            lines = t.split("\n")
            bullets = sum(
                1 for l in lines if l.startswith("-") or l.startswith("*")
            )
            blf.append(round6(bullets / len(lines)))
            toks = simple_tokens(t)
            mtl.append(
                round6(sum(len(w) for w in toks) / len(toks)) if toks else 0.0
            )
        return pa.table(
            {
                "doc_id": ids,
                "n_hash": pa.array(nh, pa.int64()),
                "n_ellipsis": pa.array(ne, pa.int64()),
                "bullet_line_frac": pa.array(blf, pa.float64()),
                "mean_token_len": pa.array(mtl, pa.float64()),
            }
        )

    return _docs_text(sf_dir).map_batches(signals, batch_format="pyarrow")


def q_curated_rewrite(sf_dir: str):
    """The COMPOSED curation ACTION, oracled end-to-end: run
    ``pipeline.curate_write`` (exact first-wins dedup -> repetition +
    min-token gates -> PII scrub) over the documents table into a
    fresh sharded output dir, then report each surviving shard row as
    (doc_id, scrubbed_md5).  The oracle replays the whole composition
    in SQL — dedup by PARTITION BY text, the gate expressions, and the
    nested regexp_replace scrub — so the ACTION's on-disk output is
    digest-pinned, not just its plan."""
    import hashlib as _hl
    import shutil
    import tempfile

    import pyarrow.parquet as pq2

    from .extras.pipeline import curate_write

    # a UNIQUE scratch dir per call: concurrent audits of the same sf
    # must not race on one path, and nothing may be left behind
    out = tempfile.mkdtemp(prefix="seekr_curated_")
    try:
        curate_write(
            os.path.join(sf_dir, "documents.parquet"),
            out,
            min_tokens=CURATE_MIN_TOKENS,
            max_dup_line_frac=REP_MAX_DUP_LINE_FRAC,
            max_top_bigram_share=REP_MAX_TOP_BIGRAM_SHARE,
        )
        ids: list[int] = []
        digests: list[str] = []
        for f in sorted(os.listdir(out)):
            if f.startswith("part-") and f.endswith(".parquet"):
                t = pq2.read_table(os.path.join(out, f))
                for d, txt in zip(
                    t["doc_id"].to_pylist(), t["text"].to_pylist()
                ):
                    ids.append(d)
                    digests.append(_hl.md5(txt.encode()).hexdigest())
    finally:
        shutil.rmtree(out, ignore_errors=True)
    order = np.argsort(np.asarray(ids, dtype=np.int64))
    return pa.table(
        {
            "doc_id": pa.array(np.asarray(ids, np.int64)[order], pa.int64()),
            "scrubbed_md5": pa.array(
                [digests[i] for i in order.tolist()], pa.string()
            ),
        }
    )


CURATE_MIN_TOKENS = 5
SPAN_DEDUP_K = 8


def q_span_dedup(sf_dir: str):
    """Exact duplicate-SPAN removal (Lee et al. 2022 substring dedup):
    any 8-token window occurring at >= 2 positions corpus-wide is cut
    from every doc; report ``(doc_id, n_tokens, n_removed, kept_md5)``
    with the md5 of the token-space rewrite.  Three narrow exchanges
    (kgram rows -> dup positions -> per-doc co-grouped rewrite), no
    driver or broadcast state — see ``extras/spandedup.py``.  Both
    sides decide duplication on the SAME 64-bit positional hash law
    (md5 tokens + polynomial combine), so the compare is exact even at
    hash collisions."""
    from .extras.spandedup import span_dedup_stats

    return span_dedup_stats(_docs_text(sf_dir), k=SPAN_DEDUP_K)


def q_neardup_rewrite(sf_dir: str):
    """The MinHash near-dup ACTION, oracled end-to-end: run
    ``pipeline.neardup_write`` (cluster losers dropped, winner = min
    doc_id per verified component) into a fresh sharded dir and report
    the surviving doc_ids — the oracle is the documents table minus the
    SQL cluster replication's non-winner members."""
    import shutil
    import tempfile

    import pyarrow.parquet as pq2

    from .extras.pipeline import neardup_write

    out = tempfile.mkdtemp(prefix="seekr_neardup_")
    try:
        neardup_write(
            os.path.join(sf_dir, "documents.parquet"),
            out,
            threshold=MINHASH_THRESHOLD,
            num_bands=MINHASH_BANDS,
            rows_per_band=MINHASH_ROWS_PER_BAND,
            shingle_k=NGRAM_K,
        )
        ids: list[int] = []
        for f in sorted(os.listdir(out)):
            if f.startswith("part-") and f.endswith(".parquet"):
                ids.extend(
                    pq2.read_table(
                        os.path.join(out, f), columns=["doc_id"]
                    )["doc_id"].to_pylist()
                )
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return pa.table({"doc_id": pa.array(sorted(ids), pa.int64())})


def q_pii_scrub(sf_dir: str):
    """PII/secret redaction report per doc: email / IPv4 / long-hex
    counts in fixed application order plus the md5 of the scrubbed text
    — the oracle replays the same three RE2 replacements in SQL and the
    digest pins byte-identical redaction without moving the corpus."""
    from .extras.scrub import pii_scrub

    return pii_scrub(_docs_text(sf_dir))


def q_repetition_signals(sf_dir: str):
    """Gopher-style per-doc repetition profile: duplicate-line fraction
    (plain newline split, the string_split law) and top token-bigram
    share over the shared tokenization — 6dp single divisions of exact
    integer counts."""
    from .extras.repetition import repetition_signals

    return repetition_signals(_docs_text(sf_dir))


REP_MAX_DUP_LINE_FRAC = 0.2
REP_MAX_TOP_BIGRAM_SHARE = 0.2


def q_repetition_gate(sf_dir: str):
    """The repetition ACTION: survivors under both thresholds (strict
    comparisons on UNROUNDED single divisions, mirrored in SQL)."""
    from .extras.repetition import repetition_gate

    return repetition_gate(
        _docs_text(sf_dir),
        max_dup_line_frac=REP_MAX_DUP_LINE_FRAC,
        max_top_bigram_share=REP_MAX_TOP_BIGRAM_SHARE,
    )


def q_fulfillment_latency(sf_dir: str):
    """Fulfillment latency by order priority: mean days from order date
    to line-item ship date per o_orderpriority — the SLA report of an
    order pipeline.  The fact-fact join runs as a broadcast of the
    O(orders) (key, date, priority) side... at this shape orders IS the
    big side, so instead the lineitem side reduces FIRST to per-order
    (n_lines, sum_ship_days) partials (one groupby exchange) and the
    merge happens on the per-order grain — integer day sums, one
    mirrored division.

    Output: ``(priority, n_lines, mean_days)`` (6dp)."""
    import ray.data as rd

    from .extras.textstats import round6_arr

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_shipdate"],
    )
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )

    def li_partial(batch: pa.Table) -> pa.Table:
        k = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        d = pc.cast(batch["l_shipdate"], pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        ).view("int64") // 86_400_000_000
        u, inv = np.unique(k, return_inverse=True)
        n = np.bincount(inv, minlength=len(u)).astype(np.int64)
        s = np.bincount(inv, weights=d, minlength=len(u)).astype(np.int64)
        return pa.table(
            {"k": pa.array(u), "_n": pa.array(n), "_sd": pa.array(s)}
        )

    per_order = (
        li.map_batches(li_partial, batch_format="pyarrow")
        .groupby("k")
        .sum(["_n", "_sd"])
    )
    po = pa.concat_tables(
        list(per_order.iter_batches(batch_format="pyarrow"))
    )
    ok = po["k"].to_numpy(zero_copy_only=False)
    on = po["sum(_n)"].to_numpy(zero_copy_only=False)
    osd = po["sum(_sd)"].to_numpy(zero_copy_only=False)
    order = np.argsort(ok)
    ok, on, osd = ok[order], on[order], osd[order]

    from .nputil import isin_sorted

    acc: dict[str, tuple[int, int]] = {}
    for batch in orders.iter_batches(batch_format="pyarrow"):
        keys = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        od = pc.cast(
            batch["o_orderdate"], pa.timestamp("us")
        ).to_numpy(zero_copy_only=False).view("int64") // 86_400_000_000
        pri = np.asarray(batch["o_orderpriority"].to_pylist(), dtype=object)
        mask, pos = isin_sorted(ok, keys)
        for p in np.unique(pri[mask]):
            m = mask & (pri == p)
            idx = pos[m]
            nl = int(on[idx].sum())
            # sum over lines of (ship_day - order_day), exact integers
            lag = int(osd[idx].sum()) - int((od[m] * on[idx]).sum())
            a, b = acc.get(str(p), (0, 0))
            acc[str(p)] = (a + nl, b + lag)
    pris = sorted(acc)
    n_out = np.array([acc[p][0] for p in pris], np.int64)
    lag_out = np.array([acc[p][1] for p in pris], np.int64)
    return pa.table(
        {
            "priority": pa.array(pris, pa.string()),
            "n_lines": pa.array(n_out, pa.int64()),
            "mean_days": pa.array(
                round6_arr(lag_out / n_out.astype(np.float64)),
                pa.float64(),
            ),
        }
    )


def q_revenue_mom_growth(sf_dir: str):
    """Month-over-month revenue growth: per calendar month the exact
    discounted-revenue cent total and its growth rate vs the previous
    month — the core finance trend table.  Integer e4-scaled partials;
    growth = (cur - prev) / prev as the one mirrored division (first
    month omitted — no NULL reaches the driver compare).

    Output: ``(month, revenue, growth)`` (6dp)."""
    import ray.data as rd

    from .extras.textstats import round6, round6_arr

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_shipdate", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = pc.cast(batch["l_shipdate"], pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        )
        months = t.astype("datetime64[M]").astype(np.int64)  # months since epoch
        x = np.rint(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)
            * (1.0 - batch["l_discount"].to_numpy(zero_copy_only=False))
            * 10000.0
        ).astype(np.int64)
        u, inv = np.unique(months, return_inverse=True)
        s = np.bincount(inv, weights=x, minlength=len(u)).astype(np.int64)
        return pa.table({"m": pa.array(u), "_s": pa.array(s)})

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("m")
        .sum("_s")
    )
    t = pa.concat_tables(list(agg.iter_batches(batch_format="pyarrow")))
    m = t["m"].to_numpy(zero_copy_only=False)
    s = t["sum(_s)"].to_numpy(zero_copy_only=False)
    order = np.argsort(m)
    m, s = m[order], s[order]
    rev = s / 10000.0
    growth = (s[1:] - s[:-1]) / s[:-1].astype(np.float64)
    return pa.table(
        {
            # month key as yyyymm int for a SQL-friendly identity
            "month": pa.array(
                ((m[1:] // 12) + 1970) * 100 + (m[1:] % 12) + 1, pa.int64()
            ),
            "revenue": pa.array(round6_arr(rev[1:]), pa.float64()),
            "growth": pa.array(round6_arr(growth), pa.float64()),
        }
    )


def q_dup_cluster_sizes(sf_dir: str):
    """Near-dup cluster size histogram: how many MinHash clusters have
    2, 3, ... members — the dedup-savings report ('removing dups keeps
    N docs, drops M') derived from the same cluster assignment as
    minhash_clusters/cluster_winners.

    Output: ``(cluster_size, n_clusters)``."""
    from .extras.dedup import minhash_dedup_clusters

    clusters = minhash_dedup_clusters(
        _docs_text(sf_dir),
        threshold=MINHASH_THRESHOLD,
        num_bands=MINHASH_BANDS,
        rows_per_band=MINHASH_ROWS_PER_BAND,
        shingle_k=NGRAM_K,
    )

    if isinstance(clusters, pa.Table):  # small-pair driver form
        cid = clusters["cluster_id"].to_numpy(zero_copy_only=False)
        _u, n = np.unique(cid, return_counts=True)
    else:

        def sizes(batch: pa.Table) -> pa.Table:
            agg = batch.group_by(["cluster_id"]).aggregate(
                [([], "count_all")]
            )
            return agg.rename_columns(["cluster_id", "_n"])

        out = (
            clusters.map_batches(sizes, batch_format="pyarrow")
            .groupby("cluster_id")
            .sum("_n")
        )
        t = pa.concat_tables(
            list(out.iter_batches(batch_format="pyarrow"))
        )
        n = t["sum(_n)"].to_numpy(zero_copy_only=False)
    u, cnt = np.unique(n, return_counts=True)
    return pa.table(
        {
            "cluster_size": pa.array(u.astype(np.int64), pa.int64()),
            "n_clusters": pa.array(cnt.astype(np.int64), pa.int64()),
        }
    )


def q_weighted_median_price(sf_dir: str):
    """Quantity-weighted lower median of the extended price: the first
    price (asc, orderkey/linenumber-free — prices tie-break by value
    only) whose cumulative quantity weight reaches half the total —
    'the price point at which half the UNITS sell at or below'.
    Integer weights and cent values keep the whole reduction exact; no
    interpolation convention to mirror.

    Output: one row ``(total_qty, median_price)``."""
    import ray.data as rd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_extendedprice", "l_quantity"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.rint(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        q = np.rint(
            batch["l_quantity"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        u, inv = np.unique(cents, return_inverse=True)
        w = np.bincount(inv, weights=q, minlength=len(u)).astype(np.int64)
        return pa.table({"c": pa.array(u), "_w": pa.array(w)})

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("c")
        .sum("_w")
    )
    t = pa.concat_tables(list(agg.iter_batches(batch_format="pyarrow")))
    c = t["c"].to_numpy(zero_copy_only=False)
    w = t["sum(_w)"].to_numpy(zero_copy_only=False)
    order = np.argsort(c)
    c, w = c[order], w[order]
    total = int(w.sum())
    cum = np.cumsum(w)
    i = int(np.searchsorted(cum * 2, total, side="left"))
    return pa.table(
        {
            "total_qty": pa.array([total], pa.int64()),
            "median_price": pa.array([c[i] / 100.0], pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# oracle SQL
# ---------------------------------------------------------------------------


def _stoplist_sql() -> str:
    from .text.stopwords import STOPWORDS

    return (
        "["
        + ",".join("'" + w.replace("'", "''") + "'" for w in sorted(STOPWORDS))
        + "]"
    )


def _toks_cte() -> str:
    # Row-form tokenization: unnest to rows, hash anti-join the stopword
    # set, re-aggregate ordered lists.  Value-identical to the original
    # list_filter(list_contains(...)) form but ~60x faster in DuckDB —
    # list_contains over a ~700-word constant list is an O(|stopwords|)
    # linear scan PER TOKEN, while `t NOT IN (SELECT w FROM sw)` builds
    # one hash table.  The LEFT JOIN + coalesce keeps docs whose raw or
    # kept token list is empty (they must appear with [] not vanish).
    stop = _stoplist_sql()
    return f"""WITH sw AS (SELECT unnest({stop}) AS w),
tok_rows AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z]+')) AS t,
         unnest(range(1, len(regexp_extract_all(lower(text), '[a-z]+')) + 1)) AS i
  FROM documents
),
tok_agg AS (
  SELECT doc_id,
         list(t ORDER BY i) AS raw,
         list(t ORDER BY i) FILTER (
           WHERE length(t) BETWEEN 2 AND 45 AND t NOT IN (SELECT w FROM sw)
         ) AS tokens,
         count(*) FILTER (WHERE t IN (SELECT w FROM sw)) AS n_stop
  FROM tok_rows GROUP BY doc_id
),
toks AS (
  SELECT d.doc_id, d.lang,
         coalesce(a.raw, []::VARCHAR[]) AS raw,
         coalesce(a.tokens, []::VARCHAR[]) AS tokens,
         coalesce(a.n_stop, 0)::BIGINT AS n_stop,
         d.text
  FROM documents d LEFT JOIN tok_agg a USING (doc_id)
)"""


MINHASH_THRESHOLD = 0.8
MINHASH_BANDS = 16
MINHASH_ROWS_PER_BAND = 4


def _span_dedup_sql() -> str:
    """Bit-exact SQL replication of extras/spandedup.span_dedup_stats:
    per-POSITION k-gram hashes (md5_number_upper tokens + the uint64
    polynomial combine, powers of the shingle base mod 2^64 inlined and
    each product reduced before summing — 8 mod-2^64 terms stay under
    UHUGEINT), corpus-wide count >= 2 duplication, window coverage via
    an anti-join on covered token indexes, and md5 of the kept-token
    join.  Duplication is decided on the SAME hash values both sides,
    so the compare is collision-proof."""
    from .extras.dedup import _SHINGLE_BASE

    k = SPAN_DEDUP_K
    m64 = 1 << 64
    base = int(_SHINGLE_BASE)
    powers = [pow(base, k - 1 - w, m64) for w in range(k)]
    terms = " + ".join(
        f"((md5_number_upper(tokens[i + {w}])::UHUGEINT * {p})"
        f" % {m64}::UHUGEINT)"
        for w, p in enumerate(powers)
    )
    toks = _toks_cte()
    return f"""{toks},
ph AS MATERIALIZED (
  SELECT doc_id,
         unnest(range(1, len(tokens) - {k - 2})) AS pos,
         unnest(list_transform(range(1, len(tokens) - {k - 2}),
                i -> (({terms}) % {m64}::UHUGEINT)::UBIGINT)) AS h
  FROM toks WHERE len(tokens) >= {k}),
dup AS (SELECT h FROM ph GROUP BY h HAVING count(*) >= 2),
fl AS (SELECT doc_id, pos FROM ph WHERE h IN (SELECT h FROM dup)),
cov AS (SELECT DISTINCT doc_id, unnest(range(pos, pos + {k})) AS idx
        FROM fl),
tok AS (
  SELECT doc_id, unnest(tokens) AS tok,
         unnest(range(1, len(tokens) + 1)) AS idx
  FROM toks),
kept AS (
  SELECT t.doc_id,
         string_agg(t.tok, ' ' ORDER BY t.idx) AS txt,
         count(*)::BIGINT AS n_kept
  FROM tok t ANTI JOIN cov c ON c.doc_id = t.doc_id AND c.idx = t.idx
  GROUP BY t.doc_id),
b AS (SELECT doc_id, len(tokens)::BIGINT AS n_tokens FROM toks)
SELECT b.doc_id, b.n_tokens,
       (b.n_tokens - coalesce(k2.n_kept, 0))::BIGINT AS n_removed,
       md5(coalesce(k2.txt, '')) AS kept_md5
FROM b LEFT JOIN kept k2 ON k2.doc_id = b.doc_id"""


def _minhash_clusters_sql() -> str:
    """Bit-exact SQL replication of extras/dedup.minhash_dedup_clusters:
    md5-LE token hashes (== md5_number_upper), the uint64-wraparound
    polynomial shingle combine, the (a·h+b) mod 2^61−1 permutations with
    the ACTUAL seeded constants inlined, banding by exact signature slice
    (the Ray side buckets by a hash of it — identity modulo blake2b
    collisions), exact-Jaccard verify, and min-label transitive closure."""
    from .extras.dedup import _MERSENNE, _SHINGLE_BASE, _minhash_params

    k = NGRAM_K
    # the hsh polynomial below hardcodes the 3-term combine
    # (tokens[i]·base² + tokens[i+1]·base + tokens[i+2]); every other
    # k-dependent expression derives from NGRAM_K, so changing k without
    # regenerating the polynomial would silently diverge from the Ray side
    assert k == 3, "regenerate the shingle-hash polynomial for k != 3"
    p61 = int(_MERSENNE)
    m64 = 1 << 64
    base = int(_SHINGLE_BASE)
    base2 = (base * base) % m64
    a, b = _minhash_params(MINHASH_BANDS * MINHASH_ROWS_PER_BAND)
    perm_vals = ", ".join(
        f"({j}, {int(a[j])}::UBIGINT, {int(b[j])}::UBIGINT)"
        for j in range(len(a))
    )
    toks = _toks_cte().replace("WITH ", "WITH RECURSIVE ", 1)
    return f"""{toks}
, sh AS MATERIALIZED (
  SELECT doc_id,
         CASE WHEN len(tokens) = 0 THEN []::VARCHAR[]
              WHEN len(tokens) < {k} THEN [array_to_string(tokens, ' ')]
              ELSE list_distinct(list_transform(range(1, len(tokens) - {k - 2}),
                   i -> array_to_string(list_slice(tokens, i, i + {k - 1}), ' ')))
         END AS shingles
  FROM toks
),
hsh AS MATERIALIZED (
  SELECT doc_id,
         CASE WHEN len(tokens) = 0 THEN []::UBIGINT[]
              WHEN len(tokens) < {k} THEN [md5_number_upper(array_to_string(tokens, ' '))]
              ELSE list_distinct(list_transform(range(1, len(tokens) - {k - 2}),
                   i -> ((md5_number_upper(tokens[i])::UHUGEINT * {base2}
                          + md5_number_upper(tokens[i + 1])::UHUGEINT * {base}
                          + md5_number_upper(tokens[i + 2])::UHUGEINT)
                         % {m64}::UHUGEINT)::UBIGINT))
         END AS hshingles
  FROM toks
),
perms(j, a, b) AS (VALUES {perm_vals}),
hr AS MATERIALIZED (SELECT doc_id, unnest(hshingles) AS h FROM hsh),
-- permute DISTINCT shingle hashes once, then join back for the per-doc
-- min: the UHUGEINT mulmod runs O(distinct · perms) times instead of
-- O(occurrences · perms) inside a grouped aggregate — ~14x faster in
-- DuckDB, value-identical (min over equal h gives equal permuted v)
dh AS (SELECT DISTINCT h FROM hr),
pv AS MATERIALIZED (
  SELECT dh.h, p.j,
         ((p.a::UHUGEINT * (dh.h % {p61}) + p.b) % {p61})::UBIGINT AS v
  FROM dh CROSS JOIN perms p
),
sig AS MATERIALIZED (
  SELECT s.doc_id, pv.j, min(pv.v) AS mv
  FROM hr s JOIN pv ON s.h = pv.h
  GROUP BY s.doc_id, pv.j
  UNION ALL
  SELECT h.doc_id, p.j, 0::UBIGINT AS mv
  FROM hsh h CROSS JOIN perms p WHERE len(h.hshingles) = 0
),
bands AS MATERIALIZED (
  SELECT doc_id, j // {MINHASH_ROWS_PER_BAND} AS band, list(mv ORDER BY j) AS key
  FROM sig GROUP BY doc_id, j // {MINHASH_ROWS_PER_BAND}
),
cand AS MATERIALIZED (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
),
pairs AS MATERIALIZED (
  SELECT c.a, c.b
  FROM cand c JOIN sh sa ON sa.doc_id = c.a JOIN sh sb ON sb.doc_id = c.b
  WHERE CASE WHEN len(sa.shingles) = 0 AND len(sb.shingles) = 0 THEN 1.0
             ELSE len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
                  / len(list_distinct(list_concat(sa.shingles, sb.shingles)))
        END >= {MINHASH_THRESHOLD}
),
edges AS (SELECT a AS s, b AS t FROM pairs UNION ALL SELECT b AS s, a AS t FROM pairs),
reach(node, label) AS (
  SELECT s, s FROM edges
  UNION
  SELECT e.t, r.label FROM reach r JOIN edges e ON e.s = r.node
)
SELECT node AS doc_id, min(label)::BIGINT AS cluster_id
FROM reach GROUP BY node"""


FINGERPRINT_WINDOW = 8


def _fingerprints_sql() -> str:
    """Bit-exact SQL replication of extras/textstats.rolling_fingerprint:
    min over the doc of the uint64-wraparound polynomial combine of the
    window's md5-LE token hashes (powers of the roll base mod 2^64
    inlined); short docs fall back to md5 of the joined tokens."""
    w = FINGERPRINT_WINDOW
    m64 = 1 << 64
    base = 1099511628211  # _ROLL_BASE
    powers = [pow(base, w - 1 - i, m64) for i in range(w)]
    # mod each product before summing: two raw < 2^128 products would
    # overflow UINT128 on addition; 8 mod-2^64 terms sum to < 2^67
    terms = " + ".join(
        f"((md5_number_upper(tokens[i + {i}])::UHUGEINT * {p}) % {m64}::UHUGEINT)"
        for i, p in enumerate(powers)
    )
    toks = _toks_cte()
    return f"""{toks}
, fp AS (
  SELECT doc_id,
         CASE WHEN len(tokens) = 0 THEN 0::UBIGINT
              WHEN len(tokens) < {w}
                   THEN md5_number_upper(array_to_string(tokens, ' '))
              ELSE list_aggregate(list_transform(range(1, len(tokens) - {w - 2}),
                   i -> (({terms}) % {m64}::UHUGEINT)::UBIGINT), 'min')
         END AS u
  FROM toks
)
SELECT doc_id,
       CASE WHEN u >= 9223372036854775808::UHUGEINT
            THEN (u::UHUGEINT::HUGEINT - 18446744073709551616::HUGEINT)
            ELSE u::HUGEINT END::BIGINT AS fingerprint
FROM fp"""


def q_ewma_user_value(sf_dir: str):
    """Trailing-32 EWMA (alpha=1/2) of each user's value stream — the
    per-key online smoother, exact-dyadic so the distributed scan is
    bit-stable under any association (extras/windows.ewma_per_group)."""
    import ray.data as rd

    from .extras.windows import ewma_per_group

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "value"],
    )
    return ewma_per_group(ds)


def q_scd2_intervals(sf_dir: str):
    """SCD-type-2 compaction of each user's value stream: change rows
    with [valid_from, valid_to) stamps (extras/windows.scd2_intervals)."""
    import ray.data as rd

    from .extras.windows import scd2_intervals

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "value"],
    )
    return scd2_intervals(ds)


# overlapping value tiers: a true one-to-many interval join (each event
# can land in up to 3 bands), not a bucketing
VALUE_BANDS = [(0, 0, 250), (1, 100, 350), (2, 200, 450), (3, 300, 550), (4, 400, 650)]


def q_interval_band_join(sf_dir: str):
    """Broadcast non-equi interval join: events x overlapping value
    bands, aggregated per (band, type) with integer-exact partials
    (extras/joins.interval_band_join_agg)."""
    import ray.data as rd

    from .extras.joins import interval_band_join_agg

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "value"],
    )
    return interval_band_join_agg(ds, VALUE_BANDS)


BOOTSTRAP_R = 64


def q_poisson_bootstrap(sf_dir: str):
    """Poisson-bootstrap resample means of discounted revenue over
    lineitem: per-row md5-derived Poisson(1) weights, integer sufficient
    statistics, O(R) exchange (extras/bootstrap.py)."""
    import ray.data as rd

    from .extras.bootstrap import poisson_bootstrap_means

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"],
    )

    def id_expr(batch: pa.Table) -> np.ndarray:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        ln = batch["l_linenumber"].to_numpy(zero_copy_only=False).astype(np.int64)
        return ok * 8 + ln  # l_linenumber in 1..7: reversible packing

    def value_expr(batch: pa.Table) -> np.ndarray:
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        dc = batch["l_discount"].to_numpy(zero_copy_only=False)
        return np.rint(ep * (1.0 - dc) * 10000.0).astype(np.int64)

    return poisson_bootstrap_means(
        ds, id_expr=id_expr, value_expr=value_expr, n_resamples=BOOTSTRAP_R
    )


LDIV_L = 4
LDIV_CHARS_BUCKET = 256


def q_ldiversity_risk(sf_dir: str):
    """l-diversity screen (the k-anonymity companion): quasi-identifier
    groups (lang, size bucket) whose SENSITIVE attribute (source) has
    fewer than l distinct values — a homogeneous group leaks the
    attribute even when k-anonymous.  Per-block distinct-triple partials
    cut the first exchange to O(distinct triples); the second is
    O(groups)."""
    import ray.data as rd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["lang", "source", "n_chars"],
    )

    def triples(batch: pa.Table) -> pa.Table:
        nb = (
            batch["n_chars"].to_numpy(zero_copy_only=False)
            // LDIV_CHARS_BUCKET
        ).astype(np.int64)
        tbl = pa.table(
            {
                "lang": batch["lang"],
                "size_bucket": pa.array(nb, pa.int64()),
                "source": batch["source"],
            }
        )
        agg = tbl.group_by(["lang", "size_bucket", "source"]).aggregate([])
        return agg

    def count_sources(batch: pa.Table) -> pa.Table:
        agg = (
            batch.select(["lang", "size_bucket", "source"])
            .group_by(["lang", "size_bucket", "source"])
            .aggregate([])
            .group_by(["lang", "size_bucket"])
            .aggregate([("source", "count")])
        )
        n = pc.cast(agg["source_count"], pa.int64())
        # every group with its diversity + risk flag (a filtered-only
        # result goes EMPTY at larger scales and an empty Dataset loses
        # its schema in the driver compare)
        return pa.table(
            {
                "lang": agg["lang"],
                "size_bucket": agg["size_bucket"],
                "n_sources": n,
                "at_risk": pc.cast(pc.less(n, LDIV_L), pa.int64()),
            }
        )

    # distinct triples per block -> one exchange co-locating each
    # (lang, bucket) via groupby -> per-group distinct-source count
    return (
        ds.map_batches(triples, batch_format="pyarrow")
        .groupby(["lang", "size_bucket"])
        .map_groups(count_sources, batch_format="pyarrow")
    )


def q_fk_orphans(sf_dir: str):
    """Referential-integrity audit: orphan counts for the schema's
    foreign keys (lineitem->part, lineitem->supplier, orders->customer,
    lineitem->orders) — the data-quality gate a warehouse load runs.
    Dimension key sets broadcast once (ray.put-style closure capture);
    each fact block reduces to per-relation orphan counts, so the
    exchange is O(relations x blocks).  At dimension sizes past worker
    memory the same contract runs on the bucketed anti-join
    (extras/joins.py semi/anti kernel).

    Output: ``(relation, n_rows, n_orphans)``."""
    import ray.data as rd

    def keyset(table: str, col: str) -> np.ndarray:
        t = rd.read_parquet(
            os.path.join(sf_dir, f"{table}.parquet"), columns=[col]
        )
        parts = [
            b[col].to_numpy(zero_copy_only=False)
            for b in t.iter_batches(batch_format="pyarrow")
        ]
        return np.unique(np.concatenate(parts))

    part_keys = keyset("part", "p_partkey")
    supp_keys = keyset("supplier", "s_suppkey")
    cust_keys = keyset("customer", "c_custkey")
    order_keys = keyset("orders", "o_orderkey")

    from .nputil import isin_sorted

    checks = [
        ("lineitem->part", "lineitem", "l_partkey", part_keys),
        ("lineitem->supplier", "lineitem", "l_suppkey", supp_keys),
        ("lineitem->orders", "lineitem", "l_orderkey", order_keys),
        ("orders->customer", "orders", "o_custkey", cust_keys),
    ]
    rel_out, n_out, o_out = [], [], []
    for rel, fact, col, keys in checks:
        ds = rd.read_parquet(
            os.path.join(sf_dir, f"{fact}.parquet"), columns=[col]
        )

        def count(batch: pa.Table, _c=col, _k=keys, _r=rel) -> pa.Table:
            v = batch[_c].to_numpy(zero_copy_only=False).astype(np.int64)
            mask, _pos = isin_sorted(_k, v)
            orphans = int((~mask).sum())
            return pa.table(
                {
                    "relation": pa.array([_r], pa.string()),
                    "_n": pa.array([len(v)], pa.int64()),
                    "_o": pa.array([orphans], pa.int64()),
                }
            )

        agg = (
            ds.map_batches(count, batch_format="pyarrow")
            .groupby("relation")
            .sum(["_n", "_o"])
        )
        t = pa.concat_tables(list(agg.iter_batches(batch_format="pyarrow")))
        rel_out.append(t["relation"][0].as_py())
        n_out.append(int(t["sum(_n)"][0].as_py()))
        o_out.append(int(t["sum(_o)"][0].as_py()))
    return pa.table(
        {
            "relation": pa.array(rel_out, pa.string()),
            "n_rows": pa.array(n_out, pa.int64()),
            "n_orphans": pa.array(o_out, pa.int64()),
        }
    )


def q_ks_two_sample(sf_dir: str):
    """Kolmogorov-Smirnov two-sample statistic (purchase vs view
    values): D = max over the value grid of |F_a - F_b|, with the ECDFs
    as exact integer cumulative counts over distinct cents — the
    distribution-shift companion of the Mann-Whitney test, no special
    functions anywhere.  Same O(distinct cents) exchange shape.

    Output: one row ``(n1, n2, d_stat)`` (6dp)."""
    import ray.data as rd

    from .extras.textstats import round6

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "value"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        m = (et == "purchase") | (et == "view")
        cents = np.rint(
            batch["value"].to_numpy(zero_copy_only=False)[m] * 100.0
        ).astype(np.int64)
        isp = (et[m] == "purchase").astype(np.int64)
        u, inv = np.unique(cents, return_inverse=True)
        na = np.bincount(inv, weights=isp, minlength=len(u)).astype(np.int64)
        nb = np.bincount(inv, weights=1 - isp, minlength=len(u)).astype(
            np.int64
        )
        return pa.table(
            {"c": pa.array(u), "_na": pa.array(na), "_nb": pa.array(nb)}
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("c")
        .sum(["_na", "_nb"])
    )
    tbl = pa.concat_tables(list(agg.iter_batches(batch_format="pyarrow")))
    c = tbl["c"].to_numpy(zero_copy_only=False)
    na = tbl["sum(_na)"].to_numpy(zero_copy_only=False)
    nb = tbl["sum(_nb)"].to_numpy(zero_copy_only=False)
    order = np.argsort(c)
    na, nb = na[order], nb[order]
    n1, n2 = int(na.sum()), int(nb.sum())
    ca = np.cumsum(na)
    cb = np.cumsum(nb)
    # |F1 - F2| with the single float division per side mirrored in SQL
    d = np.abs(ca / float(n1) - cb / float(n2)).max() if len(ca) else 0.0
    return pa.table(
        {
            "n1": pa.array([n1], pa.int64()),
            "n2": pa.array([n2], pa.int64()),
            "d_stat": pa.array([round6(float(d))], pa.float64()),
        }
    )


def q_expfit_ks_gaps(sf_dir: str):
    """Exponential goodness-of-fit of inter-event gaps: MLE rate
    lambda = n / sum(gap), then the one-sample KS statistic
    D = max(F_emp_hi - F_exp, F_exp - F_emp_lo) over the distinct gap
    grid — 'is user activity Poisson?' in one number.  Gaps come from
    the same per-user LAG kernel as event_gaps; the reduction is
    O(distinct gaps).

    Output: one row ``(n, lambda_per_hour, d_stat)`` (6dp)."""
    import ray.data as rd

    from .extras.textstats import round6
    from .extras.windows import lag_gaps_per_group

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id"],
    )
    gaps = lag_gaps_per_group(ds)

    def partial(batch: pa.Table) -> pa.Table:
        g = batch["gap_us"].to_numpy(zero_copy_only=False)
        u, cnt = np.unique(g, return_counts=True)
        return pa.table(
            {"g": pa.array(u), "_n": pa.array(cnt.astype(np.int64))}
        )

    agg = (
        gaps.map_batches(partial, batch_format="pyarrow")
        .groupby("g")
        .sum("_n")
    )
    tbl = pa.concat_tables(list(agg.iter_batches(batch_format="pyarrow")))
    g = tbl["g"].to_numpy(zero_copy_only=False)
    cnt = tbl["sum(_n)"].to_numpy(zero_copy_only=False)
    order = np.argsort(g)
    g, cnt = g[order], cnt[order]
    n = int(cnt.sum())
    total = int((g * cnt).sum())
    lam = n / float(total)  # per microsecond
    ca = np.cumsum(cnt)
    f_hi = ca / float(n)
    f_lo = (ca - cnt) / float(n)
    f_exp = 1.0 - np.exp(-lam * g)
    d = float(np.maximum(f_hi - f_exp, f_exp - f_lo).max()) if n else 0.0
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "lambda_per_hour": pa.array(
                [round6(lam * 3600.0 * 1e6)], pa.float64()
            ),
            "d_stat": pa.array([round6(d)], pa.float64()),
        }
    )


def q_mannwhitney_value(sf_dir: str):
    """Tie-corrected Mann-Whitney U test: do purchase events draw their
    value from the same distribution as view events?  The nonparametric
    two-sample test of the statistics suite.  Exact integer machinery:
    per-block (cents, n_purchase, n_view) partials, one O(distinct
    cents) exchange (bounded: 2dp values on a bounded range), DOUBLED
    tie-average ranks keep every rank sum an exact int64; only the
    final (U - mu) / sigma mirrors the SQL float expression.

    Output: one row ``(n1, n2, u1, z)`` (purchase side, 6dp)."""
    import ray.data as rd

    from .extras.textstats import round6

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "value"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        m = (et == "purchase") | (et == "view")
        cents = np.rint(
            batch["value"].to_numpy(zero_copy_only=False)[m] * 100.0
        ).astype(np.int64)
        isp = (et[m] == "purchase").astype(np.int64)
        u, inv = np.unique(cents, return_inverse=True)
        na = np.bincount(inv, weights=isp, minlength=len(u)).astype(np.int64)
        nb = np.bincount(inv, weights=1 - isp, minlength=len(u)).astype(
            np.int64
        )
        return pa.table(
            {
                "c": pa.array(u),
                "_na": pa.array(na),
                "_nb": pa.array(nb),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("c")
        .sum(["_na", "_nb"])
    )
    tbl = pa.concat_tables(list(agg.iter_batches(batch_format="pyarrow")))
    c = tbl["c"].to_numpy(zero_copy_only=False)
    na = tbl["sum(_na)"].to_numpy(zero_copy_only=False)
    nb = tbl["sum(_nb)"].to_numpy(zero_copy_only=False)
    order = np.argsort(c)
    na, nb = na[order], nb[order]
    cnt = na + nb
    n1, n2 = int(na.sum()), int(nb.sum())
    n = n1 + n2
    cum_before = np.concatenate([[0], np.cumsum(cnt)[:-1]])
    # doubled average rank of a tie group: 2*cum_before + cnt + 1 (int)
    r1x2 = int((na * (2 * cum_before + cnt + 1)).sum())
    u1 = (r1x2 - n1 * (n1 + 1)) / 2.0
    mu = n1 * n2 / 2.0
    tie = int((cnt**3 - cnt).sum())
    sigma = (
        (n1 * n2 / 12.0) * ((n + 1) - tie / (n * (n - 1.0)))
    ) ** 0.5
    z = (u1 - mu) / sigma if sigma > 0 else 0.0
    return pa.table(
        {
            "n1": pa.array([n1], pa.int64()),
            "n2": pa.array([n2], pa.int64()),
            "u1": pa.array([round6(u1)], pa.float64()),
            "z": pa.array([round6(z)], pa.float64()),
        }
    )


QUOTA_PER_LANG = 200


def q_quota_sample(sf_dir: str):
    """Exact per-group quota sampling: the md5-smallest QUOTA docs of
    every lang (groups under quota keep everything) — the
    deterministic 'exactly N per class' rebalancer.  Scale shape: a
    KMV-style per-(block, lang) bottom-quota partial finds each group's
    quota-th-smallest hash THRESHOLD (O(langs x quota x blocks)
    exchange), then one stateless filter pass keeps rows under the
    threshold — the group itself never has to fit anywhere.

    Output: ``(doc_id, lang)``."""
    import hashlib

    import ray.data as rd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang"],
    )

    def hashed(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        h = np.empty(len(ids), np.uint64)
        for i, v in enumerate(ids):
            h[i] = int.from_bytes(
                hashlib.md5(str(v).encode()).digest()[:8], "little"
            )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang": batch["lang"],
                "h": pa.array(h, pa.uint64()),
            }
        )

    hds = ds.map_batches(hashed, batch_format="pyarrow").materialize()

    def partial(batch: pa.Table) -> pa.Table:
        lang = np.asarray(batch["lang"].to_pylist(), dtype=object)
        h = batch["h"].to_numpy(zero_copy_only=False)
        l_out, h_out = [], []
        for g in np.unique(lang):
            hg = np.sort(h[lang == g])[:QUOTA_PER_LANG]
            l_out.extend([g] * len(hg))
            h_out.append(hg)
        return pa.table(
            {
                "lang": pa.array(l_out, pa.string()),
                "h": pa.array(
                    np.concatenate(h_out) if h_out else np.empty(0, np.uint64),
                    pa.uint64(),
                ),
            }
        )

    def threshold(group: pa.Table) -> pa.Table:
        g = group["lang"][0].as_py()
        hg = np.sort(group["h"].to_numpy(zero_copy_only=False))[
            :QUOTA_PER_LANG
        ]
        return pa.table(
            {
                "lang": pa.array([g], pa.string()),
                "thr": pa.array([hg[-1]], pa.uint64()),
            }
        )

    thr_tbl = pa.concat_tables(
        list(
            hds.map_batches(partial, batch_format="pyarrow")
            .groupby("lang")
            .map_groups(threshold, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")
        )
    )
    thr = dict(
        zip(thr_tbl["lang"].to_pylist(), thr_tbl["thr"].to_pylist())
    )

    def keep(batch: pa.Table) -> pa.Table:
        lang = batch["lang"].to_pylist()
        h = batch["h"].to_numpy(zero_copy_only=False)
        mask = np.array(
            [hv <= thr.get(g, 0) for g, hv in zip(lang, h.tolist())],
            dtype=bool,
        )
        return batch.filter(pa.array(mask)).select(["doc_id", "lang"])

    return hds.map_batches(keep, batch_format="pyarrow")


def q_asof_nearest_view(sf_dir: str):
    """Nearest-event temporal join: for every purchase, the SAME user's
    closest view in time (either direction; ties prefer the earlier
    side, then the smaller event id) — the bidirectional companion of
    the as-of join.  Hash-bucketed co-partition by user; per user the
    full |dt| matrix argmin is vectorized (views x purchases per user
    is session-sized).

    Output: ``(event_id, view_id, dt_us)`` (dt signed, view - purchase)."""
    import ray.data as rd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    def tag(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        m = (et == "view") | (et == "purchase")
        k = batch["user_id"].to_numpy(zero_copy_only=False)[m]
        t = pc.cast(batch["ts"], pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        ).view("int64")[m]
        return pa.table(
            {
                "_b": pa.array((k % 64).astype(np.int32), pa.int32()),
                "k": pa.array(k, pa.int64()),
                "t": pa.array(t, pa.int64()),
                "i": pa.array(
                    batch["event_id"].to_numpy(zero_copy_only=False)[m],
                    pa.int64(),
                ),
                "isv": pa.array((et[m] == "view").astype(np.int8), pa.int8()),
            }
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        k = group["k"].to_numpy(zero_copy_only=False)
        t = group["t"].to_numpy(zero_copy_only=False)
        i = group["i"].to_numpy(zero_copy_only=False)
        isv = group["isv"].to_numpy(zero_copy_only=False).astype(bool)
        out_p, out_v, out_dt = [], [], []
        for u in np.unique(k):
            m = k == u
            vt, vi = t[m & isv], i[m & isv]
            ptm, pim = t[m & ~isv], i[m & ~isv]
            if len(vt) == 0 or len(ptm) == 0:
                continue
            dt = vt[:, None] - ptm[None, :]  # (V, P), view - purchase
            # argmin by (|dt|, prefer dt<=0, view id) per purchase
            order = np.lexsort(
                (
                    np.broadcast_to(vi[:, None], dt.shape).ravel(),
                    (dt > 0).astype(np.int8).ravel(),
                    np.abs(dt).ravel(),
                )
            ).reshape(-1)
            # first occurrence per purchase column in the sorted order
            cols = order % dt.shape[1]
            first = np.full(dt.shape[1], -1, np.int64)
            seen = np.zeros(dt.shape[1], bool)
            remaining = dt.shape[1]
            for idx, c in zip(order.tolist(), cols.tolist()):
                if not seen[c]:
                    seen[c] = True
                    first[c] = idx
                    remaining -= 1
                    if remaining == 0:
                        break  # winners cluster at the sorted front
            rows = first // dt.shape[1]
            out_p.extend(pim.tolist())
            out_v.extend(vi[rows].tolist())
            out_dt.extend(dt.ravel()[first].tolist())
        return pa.table(
            {
                "event_id": pa.array(out_p, pa.int64()),
                "view_id": pa.array(out_v, pa.int64()),
                "dt_us": pa.array(out_dt, pa.int64()),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


COV_DIMS = 16


def q_embed_cov16(sf_dir: str):
    """Covariance matrix of the first 16 dims of the int8-quantized
    embeddings (absmax-per-vector codes, the embed_int8 scheme) —
    drift/whitening statistics with EXACT integer sufficient
    statistics: per-block (n, Σq_i, Σq_j, Σq_iq_j) int64 partials via
    one Q^T Q matmul on the zero-copy matrix; the exchange is
    O(dim-pairs x blocks) and the two divisions per cell mirror the
    SQL expression.

    Output: ``(di, dj, cov)`` upper triangle, 6dp."""
    import ray.data as rd

    from .extras.similarity import _to_matrix
    from .extras.textstats import round6_arr

    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    iu, ju = np.triu_indices(COV_DIMS)

    def partial(batch: pa.Table) -> pa.Table:
        m = _to_matrix(batch["embedding"]).astype(np.float64)
        amax = np.abs(m).max(axis=1)
        scale = amax / 127.0
        with np.errstate(divide="ignore", invalid="ignore"):
            q = m / np.where(scale[:, None] == 0, 1, scale[:, None])
        q = np.where(scale[:, None] == 0.0, 0.0, q)
        # half-away rounding: the embed_int8 scheme (== SQL ROUND(x, 0))
        q = np.sign(q) * np.floor(np.abs(q) + 0.5)
        q16 = q[:, :COV_DIMS].astype(np.int64)
        n = q16.shape[0]
        s = q16.sum(axis=0)
        ss = q16.T @ q16
        return pa.table(
            {
                "di": pa.array(iu.astype(np.int64)),
                "dj": pa.array(ju.astype(np.int64)),
                "_n": pa.array(np.full(len(iu), n, np.int64)),
                "_si": pa.array(s[iu]),
                "_sj": pa.array(s[ju]),
                "_sij": pa.array(ss[iu, ju]),
            }
        )

    def finalize(batch: pa.Table) -> pa.Table:
        di = batch["di"].to_numpy(zero_copy_only=False)
        dj = batch["dj"].to_numpy(zero_copy_only=False)
        n = batch["sum(_n)"].to_numpy(zero_copy_only=False).astype(np.float64)
        si = batch["sum(_si)"].to_numpy(zero_copy_only=False)
        sj = batch["sum(_sj)"].to_numpy(zero_copy_only=False)
        sij = batch["sum(_sij)"].to_numpy(zero_copy_only=False)
        cov = (sij.astype(np.float64) - (si * sj).astype(np.float64) / n) / n
        return pa.table(
            {
                "di": pa.array(di, pa.int64()),
                "dj": pa.array(dj, pa.int64()),
                "cov": pa.array(round6_arr(cov), pa.float64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["di", "dj"])
        .sum(["_n", "_si", "_sj", "_sij"])
        .map_batches(finalize, batch_format="pyarrow")
    )


CV_FOLDS = 5
CV_EMBARGO_PCT = 2  # embargo = 2% of the time range after each test fold


def q_purged_cv_folds(sf_dir: str):
    """Purged time-series cross-validation assignment (the financial-ML
    splitter): the time range divides into 5 contiguous folds; for each
    fold k an event is 'test' inside the fold, PURGED if it falls in
    the embargo window right after the fold (leakage via overlapping
    label horizons), else 'train'.  Stateless per-row integer-us
    arithmetic from footer-stats bounds — no shuffle at all; emits one
    row per (event, fold).

    Output: ``(event_id, fold, role)``."""
    import ray.data as rd

    path = os.path.join(sf_dir, "events.parquet")
    lo, hi = _events_ts_bounds_us(path)
    span = hi - lo + 1
    ds = rd.read_parquet(path, columns=["event_id", "ts"])

    def assign(batch: pa.Table) -> pa.Table:
        t = pc.cast(batch["ts"], pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        ).view("int64")
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        n = len(eid)
        ev_out = np.repeat(eid, CV_FOLDS)
        fold_out = np.tile(np.arange(CV_FOLDS, dtype=np.int64), n)
        # fold k test window: [lo + k*span//F, lo + (k+1)*span//F)
        k = fold_out
        f_lo = lo + k * span // CV_FOLDS
        f_hi = lo + (k + 1) * span // CV_FOLDS
        emb_hi = f_hi + span * CV_EMBARGO_PCT // 100
        tt = np.repeat(t, CV_FOLDS)
        role = np.where(
            (tt >= f_lo) & (tt < f_hi),
            "test",
            np.where((tt >= f_hi) & (tt < emb_hi), "purged", "train"),
        )
        return pa.table(
            {
                "event_id": pa.array(ev_out, pa.int64()),
                "fold": pa.array(fold_out, pa.int64()),
                "role": pa.array(role.tolist(), pa.string()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def q_seq3_patterns(sf_dir: str):
    """Length-3 event-type sequence mining (PrefixSpan-lite): every
    window of three CONSECUTIVE events of one user in (ts, id) order is
    a sequence occurrence; output every observed sequence with its
    support (consumers threshold — a filtered result can go empty at
    some scale and lose its schema).  Per-bucket vectorized triple
    emission with
    local (sequence -> count) partials; the exchange is O(distinct
    sequences x buckets), never O(events).

    Output: ``(t1, t2, t3, support)``."""
    import ray.data as rd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    def tag(batch: pa.Table) -> pa.Table:
        k = batch["user_id"].to_numpy(zero_copy_only=False)
        t = pc.cast(batch["ts"], pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "_b": pa.array((k % 64).astype(np.int32), pa.int32()),
                "k": pa.array(k, pa.int64()),
                "t": pa.array(t.view("int64"), pa.int64()),
                "i": batch["event_id"],
                "e": batch["event_type"],
            }
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        k = group["k"].to_numpy(zero_copy_only=False)
        t = group["t"].to_numpy(zero_copy_only=False)
        i = group["i"].to_numpy(zero_copy_only=False)
        e = np.asarray(group["e"].to_pylist(), dtype=object)
        order = np.lexsort((i, t, k))
        k, e = k[order], e[order]
        n = len(k)
        if n < 3:
            return pa.table(
                {
                    "t1": pa.array([], pa.string()),
                    "t2": pa.array([], pa.string()),
                    "t3": pa.array([], pa.string()),
                    "_n": pa.array([], pa.int64()),
                }
            )
        same3 = (k[:-2] == k[1:-1]) & (k[1:-1] == k[2:])
        a, b, c = e[:-2][same3], e[1:-1][same3], e[2:][same3]
        # local (sequence -> count) partial before the exchange
        seq = np.char.add(
            np.char.add(
                np.char.add(a.astype(str), "\x1f"),
                np.char.add(b.astype(str), "\x1f"),
            ),
            c.astype(str),
        )
        u, cnt = np.unique(seq, return_counts=True)
        parts = [s.split("\x1f") for s in u.tolist()]
        return pa.table(
            {
                "t1": pa.array([p[0] for p in parts], pa.string()),
                "t2": pa.array([p[1] for p in parts], pa.string()),
                "t3": pa.array([p[2] for p in parts], pa.string()),
                "_n": pa.array(cnt.astype(np.int64)),
            }
        )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "t1": batch["t1"],
                "t2": batch["t2"],
                "t3": batch["t3"],
                "support": pc.cast(batch["sum(_n)"], pa.int64()),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pyarrow")
        .groupby(["t1", "t2", "t3"])
        .sum("_n")
        .map_batches(finalize, batch_format="pyarrow")
    )


CHURN_CUTOFF_PCT = 70  # feature window = first 70% of the time range


def _events_ts_bounds_us(path: str) -> tuple[int, int]:
    """(min, max) event timestamp in integer us from parquet footer
    statistics — no data pass."""
    import datetime as _dt

    import pyarrow.parquet as _pq

    pf = _pq.ParquetFile(path)
    ts_idx = pf.schema_arrow.get_field_index("ts")
    los, his = [], []
    for rg in range(pf.metadata.num_row_groups):
        st = pf.metadata.row_group(rg).column(ts_idx).statistics
        los.append(st.min)
        his.append(st.max)
    epoch = _dt.datetime(1970, 1, 1)
    one_us = _dt.timedelta(microseconds=1)
    return (min(los) - epoch) // one_us, (max(his) - epoch) // one_us


def q_churn_training_table(sf_dir: str):
    """Leakage-safe churn training table: features from the first 70% of
    the time range, the label from the rest — the feature/label time
    split every behavioral-ML pipeline needs to get right.  Per user:
    event count, purchase count, exact value sum, recency at cutoff;
    churned = no event after the cutoff.  Per-block integer partials
    (one row per user per block), one groupby exchange, integer-exact
    everywhere except the single cent division mirrored in SQL."""
    import ray.data as rd

    path = os.path.join(sf_dir, "events.parquet")
    lo, hi = _events_ts_bounds_us(path)
    cutoff = lo + (hi - lo) * CHURN_CUTOFF_PCT // 100
    ds = rd.read_parquet(
        path, columns=["ts", "user_id", "event_type", "value"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = pc.cast(batch["ts"], pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        ).view("int64")
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        cents = np.rint(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        before = t <= cutoff
        uu, inv = np.unique(u, return_inverse=True)
        nb = len(uu)
        n_ev = np.bincount(inv[before], minlength=nb)
        n_pur = np.bincount(
            inv[before & (et == "purchase")], minlength=nb
        )
        s_cents = np.bincount(
            inv[before], weights=cents[before], minlength=nb
        ).astype(np.int64)
        last = np.full(nb, -(1 << 62), np.int64)
        np.maximum.at(last, inv[before], t[before])
        after = np.zeros(nb, np.int64)
        np.maximum.at(after, inv[~before], 1)
        return pa.table(
            {
                "user_id": pa.array(uu, pa.int64()),
                "_n": pa.array(n_ev.astype(np.int64)),
                "_np": pa.array(n_pur.astype(np.int64)),
                "_sc": pa.array(s_cents),
                "_last": pa.array(last),
                "_after": pa.array(after),
            }
        )

    def per_user(group: pa.Table) -> pa.Table:
        u = group["user_id"][0].as_py()
        n = int(pc.sum(group["_n"]).as_py() or 0)
        if n == 0:  # user only active after the cutoff: not a sample
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "n_purchases": pa.array([], pa.int64()),
                    "sum_value": pa.array([], pa.float64()),
                    "recency_us": pa.array([], pa.int64()),
                    "churned": pa.array([], pa.int64()),
                }
            )
        npur = int(pc.sum(group["_np"]).as_py() or 0)
        sc = int(pc.sum(group["_sc"]).as_py() or 0)
        last = int(pc.max(group["_last"]).as_py())
        after = int(pc.max(group["_after"]).as_py() or 0)
        return pa.table(
            {
                "user_id": pa.array([u], pa.int64()),
                "n_events": pa.array([n], pa.int64()),
                "n_purchases": pa.array([npur], pa.int64()),
                "sum_value": pa.array([sc / 100.0], pa.float64()),
                "recency_us": pa.array([cutoff - last], pa.int64()),
                "churned": pa.array([1 - after], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
    )


CALIB_BINS = 10
CALIB_SCALE_CENTS = 50000  # prediction = value / 500.00, clamped to [0, 1]


def q_calibration_bins(sf_dir: str):
    """Reliability-diagram bins for a deterministic score: prediction
    p = value/500 (clamped), outcome = event is a purchase.  Per bin:
    n, mean prediction, empirical rate — the calibration/ECE input of a
    model-monitoring pipeline.  Integer cent sums per block; the two
    divisions per bin mirror the SQL expression."""
    import ray.data as rd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "value"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.rint(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        cents = np.clip(cents, 0, CALIB_SCALE_CENTS)
        y = (
            np.asarray(batch["event_type"].to_pylist(), dtype=object)
            == "purchase"
        ).astype(np.int64)
        b = np.minimum(
            cents * CALIB_BINS // CALIB_SCALE_CENTS, CALIB_BINS - 1
        )
        n = np.bincount(b, minlength=CALIB_BINS)
        sc = np.bincount(b, weights=cents, minlength=CALIB_BINS).astype(
            np.int64
        )
        sy = np.bincount(b, weights=y, minlength=CALIB_BINS).astype(np.int64)
        return pa.table(
            {
                "bin": pa.array(np.arange(CALIB_BINS, dtype=np.int64)),
                "_n": pa.array(n.astype(np.int64)),
                "_sc": pa.array(sc),
                "_sy": pa.array(sy),
            }
        )

    def finalize(batch: pa.Table) -> pa.Table:
        b = batch["bin"].to_numpy(zero_copy_only=False)
        n = batch["sum(_n)"].to_numpy(zero_copy_only=False)
        sc = batch["sum(_sc)"].to_numpy(zero_copy_only=False)
        sy = batch["sum(_sy)"].to_numpy(zero_copy_only=False)
        keep = n > 0
        b, n, sc, sy = b[keep], n[keep], sc[keep], sy[keep]
        from .extras.textstats import round6_arr

        mean_pred = round6_arr((sc / float(CALIB_SCALE_CENTS)) / n)
        rate = round6_arr(sy / n.astype(np.float64))
        return pa.table(
            {
                "bin": pa.array(b, pa.int64()),
                "n": pa.array(n, pa.int64()),
                "mean_pred": pa.array(mean_pred, pa.float64()),
                "rate": pa.array(rate, pa.float64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bin")
        .sum(["_n", "_sc", "_sy"])
        .map_batches(finalize, batch_format="pyarrow")
    )


HASH_DIMS = 64


def q_hashed_features(sf_dir: str):
    """Feature-hashing (hashing-trick) document vectors: every token
    lands in dim md5(token) % 64, counts summed per (doc, dim) — the
    stateless featurizer that needs no vocabulary broadcast at any
    corpus size.  Pure per-block map (one row per doc), no shuffle;
    per-block distinct-token hash cache keeps the md5 work O(distinct
    tokens)."""
    import ray.data as rd

    from .extras.textstats import simple_tokens

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )

    def feats(batch: pa.Table) -> pa.Table:
        import hashlib

        cache: dict[str, int] = {}

        def dim_of(tok: str) -> int:
            d = cache.get(tok)
            if d is None:
                h = hashlib.md5(tok.encode()).digest()[:8]
                d = int.from_bytes(h, "little") % HASH_DIMS
                cache[tok] = d
            return d

        doc_out, dim_out, n_out = [], [], []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            counts = np.zeros(HASH_DIMS, np.int64)
            for t in simple_tokens(text or ""):
                counts[dim_of(t)] += 1
            nz = np.flatnonzero(counts)
            doc_out.extend([doc_id] * len(nz))
            dim_out.extend(nz.tolist())
            n_out.extend(counts[nz].tolist())
        return pa.table(
            {
                "doc_id": pa.array(doc_out, pa.int64()),
                "dim": pa.array(dim_out, pa.int64()),
                "n": pa.array(n_out, pa.int64()),
            }
        )

    return ds.map_batches(feats, batch_format="pyarrow")


PSI_BINS = 16
PSI_CENTS_MAX = 50000  # value < 500.00 in this corpus; last bin catches the rest


def q_psi_value_drift(sf_dir: str):
    """Population stability index of the value distribution between the
    first and second time halves of the event stream — the standard
    feature-drift monitor of an ML serving pipeline (PSI > 0.2 = retrain
    signal).  Fixed equal-width cent bins, add-one smoothing, so both
    halves reduce to O(bins) integer counts per block; the only
    exchange is O(bins x blocks) partial rows.  The time midpoint is
    integer-us arithmetic from a one-row min/max aggregate.

    Output: ``(bin, n_first, n_second, contrib)`` — contrib is the
    bin's (p - q) * ln(p / q) term rounded 6dp; PSI is their sum."""
    import ray.data as rd

    path = os.path.join(sf_dir, "events.parquet")
    ds = rd.read_parquet(path, columns=["ts", "value"])
    # integer-us midpoint from parquet footer statistics — no data pass
    # (same expression as the SQL oracle: (min + max) // 2)
    t_lo, t_hi = _events_ts_bounds_us(path)
    mid_us = (t_lo + t_hi) // 2

    def partial(batch: pa.Table) -> pa.Table:
        t = pc.cast(batch["ts"], pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        ).view("int64")
        cents = np.rint(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        b = np.clip(cents * PSI_BINS // PSI_CENTS_MAX, 0, PSI_BINS - 1)
        first = t <= mid_us
        nf = np.bincount(b[first], minlength=PSI_BINS)
        ns = np.bincount(b[~first], minlength=PSI_BINS)
        return pa.table(
            {
                "bin": pa.array(np.arange(PSI_BINS, dtype=np.int64)),
                "_nf": pa.array(nf.astype(np.int64)),
                "_ns": pa.array(ns.astype(np.int64)),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bin")
        .sum(["_nf", "_ns"])
    )
    # O(bins) rows on the driver: the totals are GLOBAL (a per-batch
    # finalize would smooth against partial totals), and 16 rows is the
    # designed-small reduction of the whole stream
    tbl = pa.concat_tables(list(agg.iter_batches(batch_format="pyarrow")))
    b = tbl["bin"].to_numpy(zero_copy_only=False)
    nf = tbl["sum(_nf)"].to_numpy(zero_copy_only=False)
    ns = tbl["sum(_ns)"].to_numpy(zero_copy_only=False)
    order = np.argsort(b)
    b, nf, ns = b[order], nf[order], ns[order]
    tot_f, tot_s = int(nf.sum()), int(ns.sum())
    # add-one smoothing: exact rationals -> identical doubles in SQL
    p = (nf + 1.0) / float(tot_f + PSI_BINS)
    q = (ns + 1.0) / float(tot_s + PSI_BINS)
    contrib = (p - q) * np.log(p / q)
    from .extras.textstats import round6_arr

    return pa.table(
        {
            "bin": pa.array(b, pa.int64()),
            "n_first": pa.array(nf, pa.int64()),
            "n_second": pa.array(ns, pa.int64()),
            "contrib": pa.array(round6_arr(contrib), pa.float64()),
        }
    )


SKETCH_Q_K = 1024
SKETCH_QS = (0.25, 0.5, 0.75, 0.9)


def q_sketch_quantiles(sf_dir: str):
    """Bounded-state quantile estimates from a global bottom-k md5
    sample over lineitem prices (extras/kmv.bottomk_quantiles) — the
    O(k)-state companion to the exact quantiles_price."""
    import ray.data as rd

    from .extras.kmv import bottomk_quantiles

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linenumber", "l_extendedprice"],
    )

    def id_expr(batch: pa.Table) -> np.ndarray:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        ln = batch["l_linenumber"].to_numpy(zero_copy_only=False).astype(np.int64)
        return ok * 8 + ln

    return bottomk_quantiles(
        ds,
        id_col="",
        val_col="l_extendedprice",
        id_expr=id_expr,
        k=SKETCH_Q_K,
        qs=SKETCH_QS,
    )


KMV_K = 256


def q_kmv_user_overlap(sf_dir: str):
    """Estimated distinct-user intersection per event-type pair from
    per-type KMV sketches (extras/kmv.kmv_user_overlap) — no pairwise
    distinct count over the raw stream."""
    import ray.data as rd

    from .extras.kmv import kmv_user_overlap

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "user_id"],
    )
    return kmv_user_overlap(ds, k=KMV_K)


def oracle_sql_map() -> dict[str, str]:
    toks = _toks_cte()
    stop = _stoplist_sql()
    terms_vals = ", ".join(f"('{t}')" for t in SEARCH_TERMS)
    sql = {}

    sql["doc_token_counts"] = f"""{toks}
SELECT doc_id, len(tokens) AS n_tokens FROM toks"""

    sql["token_count_by_lang"] = f"""{toks}
SELECT lang, sum(len(tokens))::BIGINT AS n_tokens FROM toks GROUP BY lang"""

    sql["quality_stats"] = f"""{toks}
SELECT doc_id,
       len(tokens) AS n_tokens,
       CASE WHEN len(tokens) > 0
            THEN round(list_aggregate(list_transform(tokens, t -> length(t)), 'avg'), 6)
            ELSE 0.0 END AS mean_token_len,
       CASE WHEN len(raw) > 0
            THEN round(n_stop::DOUBLE / len(raw), 6)
            ELSE 0.0 END AS stopword_ratio,
       CASE WHEN length(text) > 0
            THEN round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE / length(text), 6)
            ELSE 0.0 END AS alpha_ratio
FROM toks"""

    sql["langid"] = f"""{toks}
SELECT doc_id,
       CASE WHEN len(raw) > 0
                 AND n_stop::DOUBLE / len(raw) >= {LANGID_THRESHOLD}
            THEN 'en' ELSE 'other' END AS pred_lang
FROM toks"""

    sql["term_df_idf"] = f"""{toks}
SELECT term,
       count(DISTINCT doc_id)::BIGINT AS df,
       round(log10((SELECT count(*) FROM documents)::DOUBLE / count(DISTINCT doc_id)), 6) AS idf
FROM (SELECT doc_id, unnest(tokens) AS term FROM toks)
GROUP BY term"""

    sql["term_tf"] = f"""{toks}
SELECT doc_id, term,
       round(cnt::DOUBLE / n_toks, 6) AS tf
FROM (
  SELECT t.doc_id, q.term,
         len(list_filter(t.tokens, x -> x = q.term)) AS cnt,
         len(t.tokens) AS n_toks
  FROM toks t CROSS JOIN (VALUES {terms_vals}) AS q(term)
)
WHERE cnt > 0 AND n_toks > 0"""

    # fixed-order FP sum: tf_spark*idf_spark + tf_join*idf_join + ...
    tf_exprs = []
    for t in SEARCH_TERMS:
        tf_exprs.append(
            f"(len(list_filter(tokens, x -> x = '{t}'))::DOUBLE / len(tokens)) * (SELECT idf FROM idfs WHERE term = '{t}')"
        )
    chain = tf_exprs[0]
    for e in tf_exprs[1:]:
        chain = f"({chain} + {e})"
    terms_in = ", ".join(f"'{t}'" for t in SEARCH_TERMS)
    sql["search_tfidf_topk"] = f"""{toks},
 idfs AS (
  SELECT term, log10((SELECT count(*) FROM documents)::DOUBLE / count(DISTINCT doc_id)) AS idf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM toks)
  WHERE term IN ({terms_in})
  GROUP BY term
)
SELECT doc_id, round(score_raw, 6) AS score FROM (
  SELECT doc_id, 0.7 * {chain} AS score_raw
  FROM toks
  WHERE len(tokens) > 0
    AND len(list_filter(tokens, x -> list_contains([{terms_in}], x))) > 0
  ORDER BY score_raw DESC, doc_id
  LIMIT 20
)"""

    sql["exact_dedup"] = """SELECT sha256(text) AS text_sha256,
       min(doc_id)::BIGINT AS keep_doc_id,
       count(*)::BIGINT AS n_copies
FROM documents GROUP BY text"""

    # row-form intersection: count shared shingles via a self-join on
    # shingle rows instead of O(n^2) pairwise list_intersect — only
    # co-occurring pairs are touched, value-identical (|A∪B| =
    # |A|+|B|−|A∩B| on the distinct sets; a zero-intersection or empty
    # pair can never reach a positive threshold in either form)
    jac_pairs_cte = f"""sh AS (
  SELECT doc_id,
         CASE WHEN len(tokens) = 0 THEN []::VARCHAR[]
              WHEN len(tokens) < {NGRAM_K} THEN [array_to_string(tokens, ' ')]
              ELSE list_distinct(list_transform(range(1, len(tokens) - {NGRAM_K - 2}),
                   i -> array_to_string(list_slice(tokens, i, i + {NGRAM_K - 1}), ' ')))
         END AS shingles
  FROM toks
),
sz AS (SELECT doc_id, len(shingles) AS m FROM sh),
sr AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*)::BIGINT AS i
  FROM sr x JOIN sr y ON x.s = y.s AND x.doc_id < y.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT inter.a, inter.b,
         round(inter.i::DOUBLE / (sa.m + sb.m - inter.i), 6) AS jaccard
  FROM inter JOIN sz sa ON sa.doc_id = inter.a
             JOIN sz sb ON sb.doc_id = inter.b
)"""
    sql["ngram_jaccard"] = f"""{toks}
, {jac_pairs_cte}
SELECT a, b, jaccard FROM jac
WHERE jaccard >= {NGRAM_JACCARD_THRESHOLD}"""

    # same shingle CTE as ngram_jaccard; intersections via the exploded
    # shingle self-join; each unordered pair yields up to two directed
    # rows with the src side's size as the denominator
    sql["containment"] = f"""{toks}
, sh AS MATERIALIZED (
  SELECT doc_id,
         CASE WHEN len(tokens) = 0 THEN []::VARCHAR[]
              WHEN len(tokens) < {NGRAM_K} THEN [array_to_string(tokens, ' ')]
              ELSE list_distinct(list_transform(range(1, len(tokens) - {NGRAM_K - 2}),
                   i -> array_to_string(list_slice(tokens, i, i + {NGRAM_K - 1}), ' ')))
         END AS shingles
  FROM toks
),
sz AS (SELECT doc_id, len(shingles)::BIGINT AS sz FROM sh),
ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
it AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*)::BIGINT AS inter
       FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
       GROUP BY 1, 2),
d AS (SELECT a AS src_doc, b AS in_doc, inter FROM it
      UNION ALL SELECT b, a, inter FROM it)
SELECT d.src_doc, d.in_doc, d.inter, z.sz AS size_src,
       round(d.inter::DOUBLE / z.sz, 6) AS containment
FROM d JOIN sz z ON z.doc_id = d.src_doc
WHERE d.inter::DOUBLE / z.sz >= {CONTAINMENT_THRESHOLD}"""

    sql["jaccard_clusters"] = f"""{toks.replace("WITH ", "WITH RECURSIVE ", 1)}
, {jac_pairs_cte},
pairs AS MATERIALIZED (
  SELECT a, b FROM jac WHERE jaccard >= {NGRAM_JACCARD_THRESHOLD}
),
edges AS (SELECT a AS s, b AS t FROM pairs UNION ALL SELECT b AS s, a AS t FROM pairs),
reach(node, label) AS (
  SELECT s, s FROM edges
  UNION
  SELECT e.t, r.label FROM reach r JOIN edges e ON e.s = r.node
)
SELECT node AS doc_id, min(label)::BIGINT AS cluster_id
FROM reach GROUP BY node"""

    sql["span_dedup"] = _span_dedup_sql()
    sql["minhash_clusters"] = _minhash_clusters_sql()
    sql["neardup_rewrite"] = f"""WITH cl AS (
  SELECT * FROM ({_minhash_clusters_sql()}) z)
SELECT d.doc_id FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM cl WHERE doc_id <> cluster_id)
ORDER BY d.doc_id"""

    sql["fingerprints"] = _fingerprints_sql()

    sql["corpus_pagerank"] = _corpus_pagerank_sql(40, 0.85, 1e-5)
    sql["corpus_search_bm25"] = _corpus_bm25_sql(
        40, 0.85, 1e-5, topk=10, w_tfidf=0.7, w_pr=0.3, k1=1.2, b=0.75
    )
    sql["corpus_search"] = _corpus_search_sql(
        40, 0.85, 1e-5, topk=10, w_tfidf=0.7, w_pr=0.3, k1=1.2, b=0.75
    )
    sql["corpus_index_manifest"] = _corpus_manifest_sql(8)
    sql["corpus_merge_parity"] = _corpus_merge_parity_sql(8)
    sql["corpus_rank_agreement"] = _corpus_rank_agreement_sql(
        40, 0.85, 1e-5, depth=RBO_DEPTH, p=RBO_P,
        w_tfidf=0.7, w_pr=0.3, k1=1.2, b=0.75,
    )

    sql["pagerank_lineitem"] = _pagerank_lineitem_sql(
        PAGERANK_FIXED_ITERS, PAGERANK_FIXED_DAMPING
    )
    sql["pagerank_weighted"] = _pagerank_weighted_sql(
        PAGERANK_FIXED_ITERS, PAGERANK_FIXED_DAMPING
    )

    sql["hits_lineitem"] = _hits_lineitem_sql(HITS_FIXED_ITERS)

    sql["ppr_lineitem"] = _ppr_lineitem_sql(
        PAGERANK_FIXED_ITERS, PAGERANK_FIXED_DAMPING, PPR_SEEDS_MOD
    )

    sql["bool_and"] = f"""{toks}
SELECT doc_id FROM toks WHERE list_contains(tokens, '{BOOL_TERM_A}')
INTERSECT
SELECT doc_id FROM toks WHERE list_contains(tokens, '{BOOL_TERM_B}')"""

    sql["bool_or"] = f"""{toks}
SELECT doc_id FROM toks WHERE list_contains(tokens, '{BOOL_TERM_A}')
UNION
SELECT doc_id FROM toks WHERE list_contains(tokens, '{BOOL_TERM_B}')"""

    sql["bool_not"] = f"""{toks}
SELECT doc_id FROM toks WHERE list_contains(tokens, '{BOOL_TERM_A}')
EXCEPT
SELECT doc_id FROM toks WHERE list_contains(tokens, '{BOOL_TERM_B}')"""

    sql["phrase_match"] = f"""{toks},
 pos AS (
  SELECT doc_id, unnest(tokens) AS term,
         unnest(range(0, len(tokens))) AS p
  FROM toks
)
SELECT DISTINCT a.doc_id
FROM pos a JOIN pos b ON a.doc_id = b.doc_id
WHERE a.term = '{PHRASE_W1}' AND b.term = '{PHRASE_W2}'
  AND b.p > a.p AND b.p <= a.p + 3"""

    sql["suggestions"] = f"""{toks}
SELECT term FROM (
  SELECT DISTINCT term FROM (SELECT unnest(tokens) AS term FROM toks)
  WHERE term LIKE '{SUGGEST_PREFIX}%'
)
ORDER BY CASE WHEN term = '{SUGGEST_PREFIX}' THEN 1
              WHEN term LIKE '{SUGGEST_PREFIX} %' THEN 2
              ELSE 3 END,
         term
LIMIT 5"""

    # money sums run in exact integer cents on both sides (2dp prices;
    # integer-valued doubles sum exactly), so the 6dp compare is
    # invariant to summation order / parallelism
    sql["orders_by_nation"] = """SELECT c_nationkey::BIGINT AS nation,
       count(*)::BIGINT AS n,
       round(sum(round(o_totalprice * 100)) / 100, 6) AS total
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1"""

    sql["events_hourly"] = """SELECT date_trunc('hour', ts) AS window,
       event_type, count(*)::BIGINT AS n, round(sum(value), 6) AS value_sum
FROM events GROUP BY 1, 2"""

    # simhash: md5_number_upper(t) == int.from_bytes(md5(t)[:8], "little"),
    # the token hash of extras/dedup._token_hashes — bit-exact replication
    sql["simhash"] = f"""{toks}
, dt AS (SELECT doc_id, unnest(list_distinct(tokens)) AS t FROM toks),
  th AS (SELECT doc_id, md5_number_upper(t) AS h FROM dt),
  acc AS (SELECT doc_id, j,
                 sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
          FROM th CROSS JOIN range(0, 64) g(j) GROUP BY 1, 2),
  fp AS (SELECT doc_id,
                sum(CASE WHEN s > 0 THEN (1::HUGEINT << j::INT)
                         ELSE 0::HUGEINT END) AS u
         FROM acc GROUP BY doc_id)
SELECT t.doc_id,
       coalesce(CASE WHEN f.u >= 9223372036854775808::HUGEINT
                     THEN f.u - 18446744073709551616::HUGEINT
                     ELSE f.u END, 0)::BIGINT AS simhash
FROM toks t LEFT JOIN fp f USING (doc_id)"""

    sql["asof_prev_purchase"] = f"""SELECT event_id, user_id, ts, prev_id, prev_ts FROM (
  SELECT e.event_id, e.user_id, e.ts, p.event_id AS prev_id, p.ts AS prev_ts,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY p.ts DESC, p.event_id DESC) AS rn
  FROM events e JOIN events p
    ON p.user_id = e.user_id AND p.ts < e.ts
   AND p.event_type = '{ASOF_BUILD_TYPE}'
) WHERE rn = 1"""

    sql["lookback_24h"] = f"""SELECT l.event_id,
       count(*)::BIGINT AS n_events, round(sum(r.value), 6) AS value_sum
FROM events l JOIN events r
  ON r.user_id = l.user_id
 AND r.ts >= l.ts - INTERVAL {LOOKBACK_HOURS} HOURS AND r.ts < l.ts
WHERE l.event_type = '{ASOF_BUILD_TYPE}'
GROUP BY l.event_id"""

    sql["top_events_per_user"] = f"""SELECT user_id, event_id, value, rank FROM (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id)::BIGINT AS rank
  FROM events
) WHERE rank <= {TOPK_PER_USER}"""

    # HLL: bucket = top 12 bits of md5_number_upper(token); rho = leading
    # zeros of the low 52 bits + 1 (bin() strips leading zeros, so
    # rho = 53 - bit_length; w = 0 → 53)
    sql["hll_vocab"] = f"""{toks}
, tv AS (SELECT DISTINCT unnest(tokens) AS t FROM toks),
h AS (SELECT md5_number_upper(t) AS hv FROM tv),
r AS (SELECT (hv >> 52)::BIGINT AS bucket,
             CASE WHEN (hv & 4503599627370495) = 0 THEN 53
                  ELSE 53 - length(bin(hv & 4503599627370495)) END AS rho
      FROM h)
SELECT bucket, max(rho)::BIGINT AS rho FROM r GROUP BY bucket"""

    sql["hll_event_ids"] = """WITH h AS (
  SELECT md5_number_upper(event_id::VARCHAR) AS hv
  FROM (SELECT DISTINCT event_id FROM events)
),
r AS (SELECT (hv >> 52)::BIGINT AS bucket,
             CASE WHEN (hv & 4503599627370495) = 0 THEN 53
                  ELSE 53 - length(bin(hv & 4503599627370495)) END AS rho
      FROM h)
SELECT bucket, max(rho)::BIGINT AS rho FROM r GROUP BY bucket"""

    sql["heavy_hitters"] = f"""{toks}
, tok AS (SELECT unnest(tokens) AS term FROM toks),
tot AS (SELECT count(*)::BIGINT AS n FROM tok)
SELECT term, count(*)::BIGINT AS n_occurrences
FROM tok, tot
GROUP BY term, tot.n
HAVING count(*) * 1000000 >= {HH_PHI_PPM} * tot.n"""

    sql["hash_split"] = f"""SELECT doc_id,
       CASE WHEN md5_number_upper(doc_id::VARCHAR) % 100 < {TRAIN_PCT}
            THEN 'train' ELSE 'test' END AS split
FROM documents"""

    hop_us = HOP_HOURS * 3_600_000_000
    win_us = HOP_WINDOW_HOURS * 3_600_000_000
    sql["events_hopping"] = f"""SELECT
  make_timestamp(((epoch_us(ts) // {hop_us}) - s.i) * {hop_us}) AS window,
  event_type, count(*)::BIGINT AS n, round(sum(value), 6) AS value_sum
FROM events CROSS JOIN range(0, {win_us // hop_us}) s(i)
GROUP BY 1, 2"""

    rate_cases = " ".join(
        f"WHEN event_type = '{g}' THEN {int(round(r * 1000))}"
        for g, r in SAMPLE_RATES.items()
    )
    sql["stratified_sample"] = f"""SELECT event_id, event_type
FROM events
WHERE md5_number_upper(event_id::VARCHAR) % 1000
      < CASE {rate_cases} ELSE 0 END"""

    sql["sessions"] = f"""WITH o AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_HOURS} HOURS
              THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts, value,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT user_id, sid::BIGINT AS session_id,
       min(ts) AS session_start, max(ts) AS session_end,
       count(*)::BIGINT AS n_events, round(sum(value), 6) AS value_sum
FROM s GROUP BY user_id, sid"""

    sql["events_recent_counts"] = """SELECT event_type, count(*)::BIGINT AS n
FROM events
WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 12 HOUR
GROUP BY event_type"""

    _qlog_prefix_list = ", ".join(f"'{p}'" for p in QLOG_PREFIXES)
    sql["query_log_suggest"] = f"""WITH log AS (
  SELECT lower(event_type || ' u' || (user_id % 97)::VARCHAR) AS query, ts
  FROM events
), win AS (
  SELECT query FROM log
  WHERE ts >= (SELECT max(ts) FROM log) - INTERVAL 12 HOUR
), counts AS (
  SELECT query, count(*)::BIGINT AS n FROM win GROUP BY query
), prefixes AS (
  SELECT unnest([{_qlog_prefix_list}]) AS prefix
), ranked AS (
  SELECT p.prefix, c.query, c.n,
         row_number() OVER (
           PARTITION BY p.prefix ORDER BY c.n DESC, c.query
         ) AS rank
  FROM prefixes p JOIN counts c ON starts_with(c.query, p.prefix)
)
SELECT prefix, rank, query, n FROM ranked WHERE rank <= 5"""

    sql["ann_topk"] = f"""WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
 scored AS (
  SELECT vec_id, list_cosine_similarity(embedding::DOUBLE[], q.qe) AS cos_raw
  FROM embeddings, q
)
SELECT (rank - 1)::INT AS rank, vec_id, round(cos_raw, 6) AS cos FROM (
  SELECT vec_id, cos_raw, row_number() OVER (ORDER BY cos_raw DESC, vec_id) AS rank
  FROM scored
)
WHERE rank <= {ANN_K}"""

    sql["embedding_neardup"] = f"""SELECT a.vec_id AS a, b.vec_id AS b,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE a.vec_id < {NEARDUP_LIMIT} AND b.vec_id < {NEARDUP_LIMIT}
  AND round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= {NEARDUP_THRESHOLD}"""

    # continuous quantile replicated expression-for-expression (same FP
    # order as extras/stats.quantile_cont) via 1-based list indexing
    qs_vals = ", ".join(f"({q}::DOUBLE)" for q in QUANTILE_QS)
    sql["quantiles_price"] = f"""WITH vals AS (
  SELECT l_returnflag, list_sort(list(l_extendedprice)) AS arr, count(*)::BIGINT AS n
  FROM lineitem GROUP BY l_returnflag
),
pos AS (
  SELECT l_returnflag, q, arr, q * (n - 1) AS p
  FROM vals CROSS JOIN (VALUES {qs_vals}) AS qs(q)
)
SELECT l_returnflag, q,
       round(arr[floor(p)::BIGINT + 1] * (1.0 - (p - floor(p)))
             + arr[ceil(p)::BIGINT + 1] * (p - floor(p)), 6) AS value
FROM pos"""

    sql["global_shuffle"] = f"""SELECT doc_id,
       (row_number() OVER (
          ORDER BY md5_number_upper('{SHUFFLE_SALT}' || doc_id::VARCHAR), doc_id
        ) - 1)::BIGINT AS shuffle_rank
FROM documents"""

    # per-group winsorize bounds replicate extras/stats.quantile_cont
    # expression-for-expression (same FP order), 6dp-rounded on both
    # sides before the clip (see winsorize_grouped docstring)
    sql["winsorize_price"] = f"""WITH vals AS (
  SELECT l_returnflag, list_sort(list(l_extendedprice)) AS arr,
         count(*)::BIGINT AS n
  FROM lineitem GROUP BY l_returnflag
),
pos AS (
  SELECT l_returnflag, arr,
         {WINSOR_QLO} * (n - 1) AS pl, {WINSOR_QHI} * (n - 1) AS ph
  FROM vals
),
b AS (
  SELECT l_returnflag,
         round(arr[floor(pl)::BIGINT + 1] * (1.0 - (pl - floor(pl)))
               + arr[ceil(pl)::BIGINT + 1] * (pl - floor(pl)), 6) AS lo,
         round(arr[floor(ph)::BIGINT + 1] * (1.0 - (ph - floor(ph)))
               + arr[ceil(ph)::BIGINT + 1] * (ph - floor(ph)), 6) AS hi
  FROM pos
)
SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
       round(least(greatest(l.l_extendedprice, b.lo), b.hi), 6) AS value_w
FROM lineitem l JOIN b USING (l_returnflag)"""

    sql["curate_corpus"] = f"""{toks}
, q AS (
  SELECT doc_id, lang, len(tokens) AS n_tokens,
         CASE WHEN len(raw) > 0
              THEN n_stop::DOUBLE / len(raw)
              ELSE 0.0 END AS stop_ratio,
         CASE WHEN length(text) > 0
              THEN length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE
                   / length(text)
              ELSE 0.0 END AS alpha_ratio
  FROM toks
), winners AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
)
SELECT q.doc_id, q.lang, q.n_tokens
FROM q JOIN winners USING (doc_id)
WHERE q.n_tokens >= {CURATE_MIN_TOKENS}
  AND q.alpha_ratio >= {CURATE_MIN_ALPHA}
  AND q.stop_ratio >= {LANGID_THRESHOLD}"""

    sql["kmeans_step"] = f"""WITH c AS (
  SELECT vec_id AS cid, embedding FROM embeddings WHERE vec_id < {KMEANS_K}
),
a AS (
  SELECT e.vec_id, c.cid, e.embedding,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[],
                                                 c.embedding::DOUBLE[]), 6)
                    DESC, c.cid
         ) AS rn
  FROM embeddings e CROSS JOIN c
),
asg AS (SELECT cid, embedding FROM a WHERE rn = 1)
SELECT cid, i AS dim, count(*)::BIGINT AS n,
       round(sum(floor(embedding[i + 1]::DOUBLE * {CENTROID_SCALE}))
             / {CENTROID_SCALE}.0 / count(*), 6) AS centroid
FROM asg, range(0, {EMB_DIM}) t(i)
GROUP BY cid, i"""

    sql["value_rank"] = f"""SELECT event_id,
       (row_number() OVER (ORDER BY value, event_id) - 1)::BIGINT AS value_rank,
       ntile({NTILE_K}) OVER (ORDER BY value, event_id)::BIGINT AS tile
FROM events"""

    # floor-quantized integer sums: exact at any summation order, and the
    # ::DOUBLE cast mirrors numpy's float32->float64 promotion BEFORE the
    # multiply (FLOAT arithmetic would floor differently)
    sql["label_centroids"] = f"""SELECT label, i AS dim, count(*)::BIGINT AS n,
       round(sum(floor(embedding[i + 1]::DOUBLE * {CENTROID_SCALE}))
             / {CENTROID_SCALE}.0 / count(*), 6) AS centroid
FROM embeddings, range(0, {EMB_DIM}) t(i)
GROUP BY label, i"""

    sql["lineitem_stats"] = """SELECT l_returnflag,
       count(*)::BIGINT AS n,
       min(l_extendedprice) AS vmin,
       max(l_extendedprice) AS vmax,
       round(avg(l_extendedprice), 6) AS mean,
       round(stddev_pop(l_extendedprice), 6) AS std_pop
FROM lineitem GROUP BY l_returnflag"""

    sql["revenue_rollup"] = """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
       coalesce(l_linestatus, 'ALL') AS l_linestatus,
       count(*)::BIGINT AS n,
       round(sum(round(l_extendedprice * 100)) / 100, 6) AS total
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)"""

    sql["interleave_order"] = """WITH r AS (
  SELECT doc_id, source,
         (row_number() OVER (
            PARTITION BY source
            ORDER BY md5_number_upper('' || doc_id::VARCHAR), doc_id
          ) - 1)::BIGINT AS src_rank
  FROM documents)
SELECT doc_id, source, src_rank,
       (row_number() OVER (ORDER BY src_rank, source) - 1)::BIGINT AS global_pos
FROM r"""

    sql["kanon_risk"] = f"""SELECT lang, source,
       (n_chars // {KANON_CHARS_BUCKET})::BIGINT AS size_bucket,
       count(*)::BIGINT AS n
FROM documents
GROUP BY lang, source, n_chars // {KANON_CHARS_BUCKET}
HAVING count(*) < {KANON_K}"""

    corr_pairs_sql = []
    corr_sums = ["count(*)::DOUBLE AS n"]
    for i, (c, s) in enumerate(_CORR_COLS):
        corr_sums.append(
            f"sum(round({c} * {s})::BIGINT)::DOUBLE AS s{i}"
        )
        corr_sums.append(
            f"sum(round({c} * {s})::BIGINT * round({c} * {s})::BIGINT)::DOUBLE AS q{i}"
        )
    _cnames = [c for c, _ in _CORR_COLS]
    for i in range(len(_CORR_COLS)):
        for j in range(len(_CORR_COLS)):
            if i < j:
                ci, si = _CORR_COLS[i]
                cj, sj = _CORR_COLS[j]
                corr_sums.append(
                    f"sum(round({ci} * {si})::BIGINT * round({cj} * {sj})::BIGINT)::DOUBLE AS p{i}{j}"
                )
                corr_pairs_sql.append(
                    f"""SELECT '{ci.replace("l_", "")}' AS col_a,
       '{cj.replace("l_", "")}' AS col_b,
       CASE WHEN (q{i} - s{i} * s{i} / n) * (q{j} - s{j} * s{j} / n) > 0
            THEN round((p{i}{j} - s{i} * s{j} / n)
                 / sqrt((q{i} - s{i} * s{i} / n) * (q{j} - s{j} * s{j} / n)), 6)
            ELSE 0.0 END AS corr
FROM s"""
                )
    sql["corr_matrix"] = (
        "WITH s AS (SELECT "
        + ", ".join(corr_sums)
        + " FROM lineitem)\n"
        + "\nUNION ALL\n".join(corr_pairs_sql)
    )

    sql["benford_price"] = """WITH d AS (
  SELECT substr(abs(round(o_totalprice * 100)::BIGINT)::VARCHAR, 1, 1)::BIGINT
         AS digit
  FROM orders),
c AS (SELECT digit, count(*)::BIGINT AS n FROM d GROUP BY digit),
tot AS (SELECT sum(n)::BIGINT AS t FROM c)
SELECT digit, n,
       round(tot.t::DOUBLE * log10(1.0 + 1.0 / digit::DOUBLE), 6) AS expected,
       floor((n::DOUBLE - tot.t::DOUBLE * log10(1.0 + 1.0 / digit::DOUBLE))
             * (n::DOUBLE - tot.t::DOUBLE * log10(1.0 + 1.0 / digit::DOUBLE))
             / (tot.t::DOUBLE * log10(1.0 + 1.0 / digit::DOUBLE))
             * 1000000.0)::BIGINT::DOUBLE / 1000000.0 AS chi2_part
FROM c CROSS JOIN tot"""

    sql["seasonality_strength"] = """WITH cells AS (
  SELECT event_type, date_trunc('hour', ts) AS h, count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2),
hc AS (SELECT event_type, extract(hour FROM h)::BIGINT AS hod, c FROM cells),
t AS (SELECT event_type, count(*)::BIGINT AS n, sum(c)::BIGINT AS sc,
             sum(c * c)::BIGINT AS sc2
      FROM hc GROUP BY 1),
hs AS (SELECT event_type, hod, sum(c)::BIGINT AS shc, count(*)::BIGINT AS cnt
       FROM hc GROUP BY 1, 2),
sb AS (SELECT event_type,
              sum(floor(shc::DOUBLE * shc::DOUBLE / cnt::DOUBLE
                        * 1000000.0)::BIGINT)::BIGINT AS sbq
       FROM hs GROUP BY 1)
SELECT t.event_type, t.n AS n_hours,
       CASE WHEN sc2::DOUBLE - sc::DOUBLE * sc::DOUBLE / n::DOUBLE > 0
            THEN round((sbq::DOUBLE / 1000000.0
                        - sc::DOUBLE * sc::DOUBLE / n::DOUBLE)
                       / (sc2::DOUBLE - sc::DOUBLE * sc::DOUBLE / n::DOUBLE), 6)
            ELSE 0.0 END AS eta2
FROM t JOIN sb USING (event_type)"""

    sql["local_clustering"] = f"""WITH di AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS i FROM lineitem),
e AS (SELECT a.i AS a, b.i AS b FROM di a JOIN di b ON a.o = b.o AND a.i < b.i
      GROUP BY 1, 2 HAVING count(*) >= {KCORE_MIN_SUPPORT}),
tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM e e1 JOIN e e2 ON e2.a = e1.b
                  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
tn AS (SELECT node, count(*)::BIGINT AS t FROM (
         SELECT x AS node FROM tri
         UNION ALL SELECT y FROM tri
         UNION ALL SELECT z FROM tri) q
       GROUP BY node),
deg AS (SELECT node, count(*)::BIGINT AS d FROM (
          SELECT a AS node FROM e UNION ALL SELECT b FROM e) q
        GROUP BY node)
SELECT deg.node, deg.d AS degree, coalesce(tn.t, 0)::BIGINT AS n_tri,
       CASE WHEN deg.d >= 2
            THEN round(2.0 * coalesce(tn.t, 0)::DOUBLE
                       / (deg.d::DOUBLE * (deg.d - 1)::DOUBLE), 6)
            ELSE 0.0 END AS lcc
FROM deg LEFT JOIN tn USING (node)"""

    sql["gini_revenue"] = """WITH rev AS (
  SELECT o_custkey, sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS cents
  FROM orders GROUP BY 1),
rk AS (SELECT cents, row_number() OVER (ORDER BY cents, o_custkey) AS i
       FROM rev),
s AS (SELECT count(*)::BIGINT AS n, sum(cents) AS sx, sum(i * cents) AS si
      FROM rk)
SELECT n,
       round(2.0 * si::DOUBLE / (n::DOUBLE * sx::DOUBLE)
             - (n + 1)::DOUBLE / n::DOUBLE, 6) AS gini
FROM s"""

    sql["fano_burstiness"] = """WITH c AS (
  SELECT event_type, date_trunc('hour', ts) AS h, count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2),
s AS (SELECT event_type, count(*)::BIGINT AS n, sum(c)::BIGINT AS sc,
             sum(c * c)::BIGINT AS sc2
      FROM c GROUP BY 1)
SELECT event_type, n AS n_buckets,
       CASE WHEN sc::DOUBLE / n::DOUBLE > 0
            THEN round((sc2::DOUBLE / n::DOUBLE
                        - (sc::DOUBLE / n::DOUBLE) * (sc::DOUBLE / n::DOUBLE))
                       / (sc::DOUBLE / n::DOUBLE), 6)
            ELSE 0.0 END AS fano
FROM s"""

    sql["ab_test_z"] = f"""WITH u AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS conv
  FROM events GROUP BY user_id),
t AS (SELECT (md5_number_upper('{AB_SALT}' || user_id::VARCHAR) % 2)::BIGINT AS arm,
             conv
      FROM u),
s AS (SELECT
  sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
  sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b,
  sum(CASE WHEN arm = 0 THEN conv ELSE 0 END)::BIGINT AS c_a,
  sum(CASE WHEN arm = 1 THEN conv ELSE 0 END)::BIGINT AS c_b
  FROM t)
SELECT n_a, n_b, c_a AS conv_a, c_b AS conv_b,
  CASE WHEN sqrt(((c_a + c_b)::DOUBLE / (n_a + n_b)::DOUBLE)
                 * (1.0 - (c_a + c_b)::DOUBLE / (n_a + n_b)::DOUBLE)
                 * (1.0 / n_a::DOUBLE + 1.0 / n_b::DOUBLE)) > 0
       THEN round((c_a::DOUBLE / n_a::DOUBLE - c_b::DOUBLE / n_b::DOUBLE)
            / sqrt(((c_a + c_b)::DOUBLE / (n_a + n_b)::DOUBLE)
                   * (1.0 - (c_a + c_b)::DOUBLE / (n_a + n_b)::DOUBLE)
                   * (1.0 / n_a::DOUBLE + 1.0 / n_b::DOUBLE)), 6)
       ELSE 0.0 END AS z
FROM s"""

    sql["sliding_distinct_users"] = """WITH b AS (
  SELECT DISTINCT user_id, date_trunc('hour', ts) AS h FROM events),
bounds AS (SELECT min(h) AS lo, max(h) AS hi FROM b),
grid AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS g
         FROM bounds)
SELECT grid.g AS window, count(DISTINCT b.user_id)::BIGINT AS n_users
FROM grid LEFT JOIN b
  ON b.h > grid.g - INTERVAL 24 HOUR AND b.h <= grid.g
GROUP BY grid.g"""

    sql["pricing_summary"] = """WITH b AS (
  SELECT l_returnflag, l_linestatus,
         round(l_quantity)::BIGINT AS q,
         round(l_extendedprice * 100)::BIGINT AS pc,
         round(l_discount * 100)::BIGINT AS dp,
         round(l_tax * 100)::BIGINT AS tp
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-06-30 00:00:00'),
s AS (
  SELECT l_returnflag, l_linestatus,
         count(*)::BIGINT AS n, sum(q)::BIGINT AS sq,
         sum(pc)::BIGINT AS spc,
         sum(pc * (100 - dp))::BIGINT AS sdp,
         sum(pc * (100 - dp) * (100 + tp))::BIGINT AS sch,
         sum(dp)::BIGINT AS sdisc
  FROM b GROUP BY 1, 2)
SELECT l_returnflag, l_linestatus,
       sq AS sum_qty,
       round(spc::DOUBLE / 100, 6) AS sum_base_price,
       round(sdp::DOUBLE / 10000, 6) AS sum_disc_price,
       round(sch::DOUBLE / 1000000, 6) AS sum_charge,
       round(sq::DOUBLE / n, 6) AS avg_qty,
       round(spc::DOUBLE / 100 / n, 6) AS avg_price,
       round(sdisc::DOUBLE / 100 / n, 6) AS avg_disc,
       n AS count_order
FROM s"""

    # cell contributions floor-quantized at 1e-6 and integer-summed
    # (lang_kl convention) — float-addition-order-free on both sides
    sql["chi2_lang_source"] = """WITH cells AS (
  SELECT lang, source, count(*)::BIGINT AS o FROM documents GROUP BY 1, 2),
r AS (SELECT lang, sum(o)::BIGINT AS rt FROM cells GROUP BY lang),
c AS (SELECT source, sum(o)::BIGINT AS ct FROM cells GROUP BY source),
tot AS (SELECT sum(o)::BIGINT AS n FROM cells)
SELECT tot.n,
       ((SELECT count(*) FROM r) - 1)::BIGINT
       * ((SELECT count(*) FROM c) - 1)::BIGINT AS dof,
       (sum(floor((cells.o::DOUBLE - (r.rt::DOUBLE * c.ct / tot.n))
                  * (cells.o::DOUBLE - (r.rt::DOUBLE * c.ct / tot.n))
                  / (r.rt::DOUBLE * c.ct / tot.n)
                  * 1000000.0)::BIGINT))::DOUBLE / 1000000.0 AS chi2
FROM cells JOIN r USING (lang) JOIN c USING (source) CROSS JOIN tot
GROUP BY tot.n"""

    sql["mcnemar_gates"] = f"""{toks}
, lab AS (
  SELECT (d.n_chars >= {KAPPA_CHARS_MIN}) AS a,
         (len(t.tokens) >= {KAPPA_TOKENS_MIN}) AS b
  FROM documents d JOIN toks t USING (doc_id)),
cnt AS (
  SELECT count(*) FILTER (a AND NOT b)::BIGINT AS n10,
         count(*) FILTER (NOT a AND b)::BIGINT AS n01
  FROM lab)
SELECT n10, n01,
       round(CASE WHEN n10 + n01 > 0
                  THEN (n10 - n01) * (n10 - n01)
                       / CAST(n10 + n01 AS DOUBLE)
                  ELSE 0.0 END, 6) AS chi2
FROM cnt"""

    sql["cusum_daily_value"] = """WITH d AS (
  SELECT epoch_us(ts) // 86400000000 AS day,
         CAST(round(value*100, 0) AS BIGINT) AS cents
  FROM events),
g AS (SELECT day, sum(cents)::BIGINT AS s, count(*)::BIGINT AS n
      FROM d GROUP BY day),
q AS (SELECT day,
             floor((s / CAST(n AS DOUBLE)) * 1000000.0)::BIGINT AS qmean
      FROM g),
t AS (SELECT count(*)::BIGINT AS dd, sum(qmean)::BIGINT AS tt FROM q),
c AS (SELECT q.day,
             t.dd * (sum(q.qmean) OVER (ORDER BY q.day))::BIGINT
               - (row_number() OVER (ORDER BY q.day))::BIGINT * t.tt AS cc,
             t.dd
      FROM q, t)
SELECT dd AS n_days, day AS peak_day,
       round(abs(cc) / (dd * 1000000.0), 6) AS peak_abs_cusum
FROM c
ORDER BY round(abs(cc) / (dd * 1000000.0), 6) DESC, day ASC
LIMIT 1"""

    sql["logrank_conversion"] = """WITH mx AS (
  SELECT max(epoch_us(ts)) AS tmax FROM events),
fv AS (SELECT user_id, min(epoch_us(ts)) AS t0 FROM events
       WHERE event_type = 'view' GROUP BY user_id),
fp AS (SELECT e.user_id, min(epoch_us(e.ts)) AS tp
       FROM events e JOIN fv ON fv.user_id = e.user_id
       WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= fv.t0
       GROUP BY e.user_id),
subj AS (SELECT fv.user_id,
                (md5_number_upper(fv.user_id::VARCHAR || ':lr') % 2)::BIGINT
                  AS arm,
                CASE WHEN fp.user_id IS NOT NULL THEN fp.tp - fv.t0
                     ELSE mx.tmax - fv.t0 END AS dur,
                (fp.user_id IS NOT NULL) AS ev
         FROM fv LEFT JOIN fp USING (user_id) CROSS JOIN mx),
evt AS (SELECT dur AS tau,
               count(*)::BIGINT AS d,
               count(*) FILTER (arm = 0)::BIGINT AS d0
        FROM subj WHERE ev GROUP BY dur),
w AS (SELECT e2.tau, e2.d, e2.d0,
             (SELECT count(*)::BIGINT FROM subj s WHERE s.dur >= e2.tau) AS n,
             (SELECT count(*)::BIGINT FROM subj s
              WHERE s.dur >= e2.tau AND s.arm = 0) AS n0
      FROM evt e2),
acc AS (SELECT sum(d0)::BIGINT AS o1,
               sum(floor(d * (n0 / CAST(n AS DOUBLE))
                         * 1000000000.0)::BIGINT)::BIGINT AS eq,
               sum(CASE WHEN n > 1
                        THEN floor(d * (n0 / CAST(n AS DOUBLE))
                                   * (1.0 - n0 / CAST(n AS DOUBLE))
                                   * ((n - d) / (n - 1.0))
                                   * 1000000000.0)::BIGINT
                        ELSE 0 END)::BIGINT AS vq
        FROM w),
tot AS (SELECT count(*) FILTER (arm = 0)::BIGINT AS n_arm0,
               count(*) FILTER (arm = 1)::BIGINT AS n_arm1
        FROM subj)
SELECT tot.n_arm0, tot.n_arm1,
       round(CASE WHEN acc.vq > 0
                  THEN (acc.o1 - acc.eq / 1000000000.0)
                       / sqrt(acc.vq / 1000000000.0)
                  ELSE 0.0 END, 6) AS z
FROM tot, acc"""

    km_hs = ", ".join(f"({h})" for h in KM_HORIZONS_US)
    sql["km_view_to_purchase"] = f"""WITH mx AS (
  SELECT max(epoch_us(ts)) AS tmax FROM events),
fv AS (SELECT user_id, min(epoch_us(ts)) AS t0 FROM events
       WHERE event_type = 'view' GROUP BY user_id),
fp AS (SELECT e.user_id, min(epoch_us(e.ts)) AS tp
       FROM events e JOIN fv ON fv.user_id = e.user_id
       WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= fv.t0
       GROUP BY e.user_id),
subj AS (SELECT fv.user_id,
                CASE WHEN fp.user_id IS NOT NULL THEN fp.tp - fv.t0
                     ELSE mx.tmax - fv.t0 END AS dur,
                (fp.user_id IS NOT NULL) AS ev
         FROM fv LEFT JOIN fp USING (user_id) CROSS JOIN mx),
evt AS (SELECT dur AS tau, count(*)::BIGINT AS dj FROM subj
        WHERE ev GROUP BY dur),
w AS (SELECT e2.tau, e2.dj,
             (SELECT count(*)::BIGINT FROM subj s
              WHERE s.dur >= e2.tau) AS nj
      FROM evt e2)
SELECT hs.h::BIGINT AS horizon_us,
       round(exp(coalesce(
         (SELECT sum(CASE WHEN w.dj >= w.nj THEN {_KM_NEG_INF_Q}
                          ELSE floor(ln(1.0 - w.dj / CAST(w.nj AS DOUBLE))
                                     * 1000000000.0)::BIGINT END)
          FROM w WHERE w.tau <= hs.h), 0) / 1000000000.0), 6) AS s
FROM (VALUES {km_hs}) AS hs(h)"""

    sql["degree_hill_tail"] = f"""WITH di AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS i FROM lineitem),
e AS (SELECT a.i AS a, b.i AS b FROM di a JOIN di b ON a.o = b.o AND a.i < b.i
      GROUP BY 1, 2 HAVING count(*) >= {KCORE_MIN_SUPPORT}),
deg AS (SELECT node, count(*)::BIGINT AS d
        FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e) z
        GROUP BY node),
rk AS (SELECT node, d,
              row_number() OVER (ORDER BY d DESC, node ASC) AS rn FROM deg),
nn AS (SELECT count(*)::BIGINT AS n FROM deg),
kk AS (SELECT LEAST({HILL_K}, (SELECT n FROM nn) - 1)::BIGINT AS k),
ref AS (SELECT d::DOUBLE AS r FROM rk, kk WHERE rn = kk.k + 1),
q AS (SELECT sum(floor(ln(rk.d::DOUBLE / ref.r)
                       * 1000000000.0)::BIGINT)::BIGINT AS quant
      FROM rk, kk, ref WHERE rn <= kk.k)
SELECT nn.n AS n_nodes, kk.k,
       round(CASE WHEN q.quant > 0
                  THEN kk.k / (q.quant / 1000000000.0)
                  ELSE 0.0 END, 6) AS alpha
FROM nn, kk, q"""

    sql["source_pair_jsd"] = f"""{toks}
, u AS (SELECT d.source, unnest(tk.tokens) AS t
        FROM toks tk JOIN documents d USING (doc_id))
, c AS (SELECT source, t, count(*)::BIGINT AS c FROM u GROUP BY 1, 2)
, ns AS (SELECT source, sum(c)::BIGINT AS n FROM c GROUP BY source)
, pairs AS (SELECT a.source AS sa, a.n AS na, b.source AS sb, b.n AS nb
            FROM ns a JOIN ns b ON a.source < b.source)
, j AS (SELECT p.sa, p.sb, p.na, p.nb, c.t,
               sum(CASE WHEN c.source = p.sa THEN c.c ELSE 0 END)::BIGINT AS ca,
               sum(CASE WHEN c.source = p.sb THEN c.c ELSE 0 END)::BIGINT AS cb
        FROM pairs p JOIN c ON c.source IN (p.sa, p.sb)
        GROUP BY 1, 2, 3, 4, 5)
SELECT sa AS source_a, sb AS source_b,
       round(((sum(floor((
           (CASE WHEN ca > 0
                 THEN (ca::DOUBLE / na)
                      * log2((ca::DOUBLE / na)
                             / (((ca::DOUBLE / na) + (cb::DOUBLE / nb)) / 2.0))
                 ELSE 0.0 END)
         + (CASE WHEN cb > 0
                 THEN (cb::DOUBLE / nb)
                      * log2((cb::DOUBLE / nb)
                             / (((ca::DOUBLE / na) + (cb::DOUBLE / nb)) / 2.0))
                 ELSE 0.0 END)
       ) * 1000000.0)::BIGINT))::DOUBLE / 1000000.0) / 2.0, 6) AS jsd_bits
FROM j GROUP BY sa, sb"""

    sql["bounce_rate"] = f"""WITH o AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_HOURS} HOURS
              THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
), g AS (SELECT user_id, sid, count(*)::BIGINT AS ne FROM s GROUP BY 1, 2)
SELECT count(*)::BIGINT AS n_sessions,
       (count(*) FILTER (ne = 1))::BIGINT AS n_bounces,
       round((count(*) FILTER (ne = 1)) / count(*)::DOUBLE, 6)
         AS bounce_rate
FROM g"""

    sql["tpch_q6"] = """WITH f AS (
  SELECT l_extendedprice AS ep, l_discount AS d
  FROM lineitem
  WHERE year(l_shipdate) = 1996
    AND CAST(round(l_discount*100, 0) AS BIGINT) BETWEEN 5 AND 7
    AND CAST(round(l_quantity, 0) AS BIGINT) < 24)
SELECT count(*)::BIGINT AS n_lines,
       round(sum(CAST(round(ep * d * 10000, 0) AS BIGINT))::BIGINT
             / 10000.0, 6) AS revenue
FROM f"""

    sql["tpch_q14"] = """WITH f AS (
  SELECT l_partkey,
         CAST(round(l_extendedprice*(1 - l_discount)*10000, 0)
              AS BIGINT) AS x
  FROM lineitem
  WHERE year(l_shipdate) = 1996 AND month(l_shipdate) = 6),
j AS (SELECT f.x, (p.p_type = 'PROMO') AS promo
      FROM f JOIN part p ON p.p_partkey = f.l_partkey)
SELECT count(*)::BIGINT AS n_lines,
       round(100.0 * sum(CASE WHEN promo THEN x ELSE 0 END)::BIGINT
             / CAST(sum(x)::BIGINT AS DOUBLE), 6) AS promo_pct
FROM j"""

    sql["tpch_q3v"] = """WITH f AS (
  SELECT l.l_orderkey, o.o_orderdate,
         CAST(round(l.l_extendedprice*(1 - l.l_discount)*10000, 0)
              AS BIGINT) AS x
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE c.c_mktsegment = 'BUILDING'
    AND o.o_orderdate < TIMESTAMP '1996-07-01'
    AND l.l_shipdate > TIMESTAMP '1996-07-01'),
g AS (SELECT l_orderkey, o_orderdate, sum(x)::BIGINT AS cents
      FROM f GROUP BY 1, 2)
SELECT l_orderkey, round(cents / 10000.0, 6) AS revenue, o_orderdate
FROM g ORDER BY cents DESC, l_orderkey LIMIT 10"""

    sql["tpch_q5v"] = """WITH asia AS (
  SELECT n_nationkey, n_name FROM nation n
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'ASIA'),
f AS (
  SELECT s.s_nationkey AS nat,
         CAST(round(l.l_extendedprice*(1 - l.l_discount)*10000, 0)
              AS BIGINT) AS x
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  WHERE year(o.o_orderdate) = 1996
    AND c.c_nationkey = s.s_nationkey
    AND s.s_nationkey IN (SELECT n_nationkey FROM asia)),
g AS (SELECT nat, sum(x)::BIGINT AS cents FROM f GROUP BY nat)
SELECT a.n_name, round(g.cents / 10000.0, 6) AS revenue
FROM g JOIN asia a ON a.n_nationkey = g.nat
ORDER BY g.cents DESC, a.n_name"""

    sql["tpch_q10v"] = """WITH f AS (
  SELECT o.o_custkey AS cust,
         CAST(round(l.l_extendedprice*(1 - l.l_discount)*10000, 0)
              AS BIGINT) AS x
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE l.l_returnflag = 'R'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate < TIMESTAMP '1996-04-01'),
g AS (SELECT cust, sum(x)::BIGINT AS cents FROM f GROUP BY cust),
t AS (SELECT cust, cents FROM g ORDER BY cents DESC, cust LIMIT 20)
SELECT c.c_custkey, c.c_name, round(t.cents / 10000.0, 6) AS revenue,
       c.c_acctbal, n.n_name
FROM t JOIN customer c ON c.c_custkey = t.cust
JOIN nation n ON n.n_nationkey = c.c_nationkey"""

    sql["tpch_q7v"] = """WITH f AS (
  SELECT s.s_nationkey AS sn, c.c_nationkey AS cn,
         year(l.l_shipdate) AS y,
         CAST(round(l.l_extendedprice*(1 - l.l_discount)*10000, 0)
              AS BIGINT) AS x
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE s.s_nationkey <> c.c_nationkey
    AND year(l.l_shipdate) BETWEEN 1995 AND 1996)
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       y::BIGINT AS l_year,
       round(sum(x)::BIGINT / 10000.0, 6) AS revenue
FROM f JOIN nation ns ON ns.n_nationkey = f.sn
JOIN nation nc ON nc.n_nationkey = f.cn
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""

    sql["tpch_q18v"] = f"""WITH q AS (
  SELECT l_orderkey,
         sum(CAST(round(l_quantity*100, 0) AS BIGINT))::BIGINT AS qc
  FROM lineitem GROUP BY l_orderkey HAVING qc > {TPCH_Q18_QTY * 100}),
t AS (
  SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
         o.o_totalprice, q.qc / 100.0 AS total_qty
  FROM q JOIN orders o ON o.o_orderkey = q.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 100)
SELECT * FROM t"""

    sql["tpch_q22v"] = """WITH pos AS (
  SELECT CAST(round(c_acctbal*100, 0) AS BIGINT) AS cents FROM customer
  WHERE CAST(round(c_acctbal*100, 0) AS BIGINT) > 0),
tot AS (SELECT count(*)::BIGINT AS n, sum(cents)::BIGINT AS s FROM pos)
SELECT count(*)::BIGINT AS numcust,
       coalesce(sum(CAST(round(c.c_acctbal*100, 0) AS BIGINT))::BIGINT, 0)
         / 100.0 AS totacctbal
FROM customer c, tot
WHERE CAST(round(c.c_acctbal*100, 0) AS BIGINT) * tot.n > tot.s
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"""

    sql["tpch_q8v"] = """WITH asia AS (
  SELECT n_nationkey FROM nation n
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'ASIA'),
tgt AS (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_2'),
f AS (
  SELECT year(o.o_orderdate)::BIGINT AS o_year,
         CAST(round(l.l_extendedprice*(1 - l.l_discount)*10000, 0)
              AS BIGINT) AS x,
         CASE WHEN s.s_nationkey = (SELECT n_nationkey FROM tgt)
              THEN 1 ELSE 0 END AS is_t
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE year(o.o_orderdate) IN (1995, 1996)
    AND c.c_nationkey IN (SELECT n_nationkey FROM asia)
    AND p.p_type = 'PROMO')
SELECT o_year,
       round(sum(x * is_t)::BIGINT / sum(x)::BIGINT, 6) AS mkt_share
FROM f GROUP BY o_year HAVING sum(x) > 0 ORDER BY o_year"""

    sql["tpch_q15v"] = """WITH f AS (
  SELECT l_suppkey AS sk,
         CAST(round(l_extendedprice*(1 - l_discount)*10000, 0)
              AS BIGINT) AS x
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'),
g AS (SELECT sk, sum(x)::BIGINT AS cents FROM f GROUP BY sk),
mx AS (SELECT max(cents) AS m FROM g)
SELECT g.sk AS s_suppkey, s.s_name,
       round(g.cents / 10000.0, 6) AS total_revenue
FROM g JOIN supplier s ON s.s_suppkey = g.sk
WHERE g.cents = (SELECT m FROM mx) ORDER BY g.sk"""

    sql["tpch_q17v"] = """WITH pb AS (
  SELECT p_partkey FROM part WHERE p_brand = 'Brand#23'),
f AS (
  SELECT l.l_partkey AS pk,
         CAST(round(l.l_quantity, 0) AS BIGINT) AS q,
         CAST(round(l.l_extendedprice*10000, 0) AS BIGINT) AS x
  FROM lineitem l JOIN pb ON pb.p_partkey = l.l_partkey),
st AS (
  SELECT pk, sum(q)::BIGINT AS sq, count(*)::BIGINT AS n FROM f GROUP BY pk),
kept AS (
  SELECT f.x FROM f JOIN st ON st.pk = f.pk WHERE 5 * f.q * st.n < st.sq)
SELECT round((coalesce(sum(x), 0)::BIGINT / 10000.0) / 7.0, 6) AS avg_yearly
FROM kept"""

    _q19_preds = " OR ".join(
        f"(p.p_brand = '{b}' AND p.p_size BETWEEN {sl} AND {sh} "
        f"AND CAST(round(l.l_quantity, 0) AS BIGINT) BETWEEN {ql} AND {qh})"
        for b, sl, sh, ql, qh in Q19_BANDS
    )
    sql["tpch_q19v"] = f"""WITH f AS (
  SELECT CAST(round(l.l_extendedprice*(1 - l.l_discount)*10000, 0)
              AS BIGINT) AS x
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE {_q19_preds})
SELECT round(coalesce(sum(x), 0)::BIGINT / 10000.0, 6) AS revenue FROM f"""

    sql["tpch_q21v"] = f"""WITH f AS (
  SELECT l.l_orderkey AS ok, l.l_suppkey AS sk,
         max(CASE WHEN l.l_shipdate >
                       o.o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY
                  THEN 1 ELSE 0 END) AS late
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
  GROUP BY 1, 2),
g AS (
  SELECT ok, count(*)::BIGINT AS n_supp, sum(late)::BIGINT AS n_late
  FROM f GROUP BY ok),
w AS (
  SELECT f.sk FROM f JOIN g USING (ok)
  WHERE g.n_supp >= 2 AND g.n_late = 1 AND f.late = 1),
c AS (SELECT sk, count(*)::BIGINT AS numwait FROM w GROUP BY sk)
SELECT s.s_name, c.numwait FROM c JOIN supplier s ON s.s_suppkey = c.sk
ORDER BY c.numwait DESC, s.s_name"""

    sql["tpch_q13v"] = """WITH c_orders AS (
  SELECT c.c_custkey, count(o.o_custkey)::BIGINT AS c_count
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey)
SELECT c_count, count(*)::BIGINT AS custdist
FROM c_orders GROUP BY c_count ORDER BY custdist DESC, c_count DESC"""

    sql["tpch_q4v"] = """SELECT o_orderpriority,
       count(*)::BIGINT AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
GROUP BY 1 ORDER BY 1"""

    gopher_toks = _toks_cte()
    sql["gopher_signals"] = f"""{gopher_toks},
base AS (
  SELECT doc_id,
         (len(text) - len(replace(text, '#', '')))::BIGINT AS n_hash,
         ((len(text) - len(replace(text, '...', ''))) // 3)::BIGINT
           AS n_ellipsis,
         string_split(text, chr(10)) AS lines
  FROM documents),
bl AS (
  SELECT doc_id, n_hash, n_ellipsis,
         len(lines)::BIGINT AS n_lines,
         len(list_filter(lines,
             l -> starts_with(l, '-') OR starts_with(l, '*')))::BIGINT
           AS n_bullets
  FROM base),
tl AS (
  SELECT doc_id,
         CASE WHEN len(tokens) = 0 THEN 0.0
              ELSE round(
                list_sum(list_transform(tokens, t -> len(t)))::DOUBLE
                / len(tokens), 6)
         END AS mean_token_len
  FROM toks)
SELECT bl.doc_id, bl.n_hash, bl.n_ellipsis,
       round(bl.n_bullets::DOUBLE / bl.n_lines, 6) AS bullet_line_frac,
       tl.mean_token_len
FROM bl JOIN tl ON tl.doc_id = bl.doc_id"""

    from .extras.scrub import (
        EMAIL_PATTERN,
        EMAIL_TOKEN,
        HEX_SECRET_PATTERN,
        IP_TOKEN,
        IPV4_PATTERN,
        SECRET_TOKEN,
    )

    sql["pii_scrub"] = f"""WITH s1 AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{EMAIL_PATTERN}'))::BIGINT AS n_emails,
         regexp_replace(text, '{EMAIL_PATTERN}', '{EMAIL_TOKEN}', 'g') AS t1
  FROM documents),
s2 AS (
  SELECT doc_id, n_emails,
         len(regexp_extract_all(t1, '{IPV4_PATTERN}'))::BIGINT AS n_ips,
         regexp_replace(t1, '{IPV4_PATTERN}', '{IP_TOKEN}', 'g') AS t2
  FROM s1),
s3 AS (
  SELECT doc_id, n_emails, n_ips,
         len(regexp_extract_all(t2, '{HEX_SECRET_PATTERN}'))::BIGINT
           AS n_secrets,
         regexp_replace(t2, '{HEX_SECRET_PATTERN}', '{SECRET_TOKEN}', 'g')
           AS t3
  FROM s2)
SELECT doc_id, n_emails, n_ips, n_secrets, md5(t3) AS scrubbed_md5
FROM s3"""

    rep_toks = _toks_cte()
    sql["curated_rewrite"] = f"""{rep_toks},
win AS (
  SELECT doc_id FROM (
    SELECT doc_id,
           row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
    FROM documents) z WHERE rn = 1),
ln AS (
  SELECT doc_id,
         len(string_split(text, chr(10)))::BIGINT AS n_lines,
         len(list_distinct(string_split(text, chr(10))))::BIGINT AS n_dist
  FROM documents),
bg AS (
  SELECT doc_id,
         CASE WHEN len(tokens) < 2 THEN []::VARCHAR[]
              ELSE list_transform(range(1, len(tokens)),
                                  i -> tokens[i] || ' ' || tokens[i + 1])
         END AS bigrams
  FROM toks),
bc AS (
  SELECT doc_id, b, count(*)::BIGINT AS c
  FROM (SELECT doc_id, unnest(bigrams) AS b FROM bg) GROUP BY doc_id, b),
ba AS (SELECT doc_id, max(c) AS top, sum(c)::BIGINT AS nb FROM bc GROUP BY doc_id),
surv AS (
  SELECT d.doc_id, d.text
  FROM documents d
  JOIN win ON win.doc_id = d.doc_id
  JOIN ln ON ln.doc_id = d.doc_id
  JOIN toks tk ON tk.doc_id = d.doc_id
  LEFT JOIN ba ON ba.doc_id = d.doc_id
  WHERE (ln.n_lines - ln.n_dist)::DOUBLE / ln.n_lines
          <= {REP_MAX_DUP_LINE_FRAC}
    AND (ba.nb IS NULL OR ba.top::DOUBLE / ba.nb <= {REP_MAX_TOP_BIGRAM_SHARE})
    AND len(tk.tokens) >= {CURATE_MIN_TOKENS}),
c1 AS (SELECT doc_id,
         regexp_replace(text, '{EMAIL_PATTERN}', '{EMAIL_TOKEN}', 'g') AS t1
       FROM surv),
c2 AS (SELECT doc_id,
         regexp_replace(t1, '{IPV4_PATTERN}', '{IP_TOKEN}', 'g') AS t2
       FROM c1),
c3 AS (SELECT doc_id,
         regexp_replace(t2, '{HEX_SECRET_PATTERN}', '{SECRET_TOKEN}', 'g') AS t3
       FROM c2)
SELECT doc_id, md5(t3) AS scrubbed_md5 FROM c3"""

    sql["repetition_signals"] = f"""{rep_toks},
ln AS (
  SELECT doc_id,
         len(string_split(text, chr(10)))::BIGINT AS n_lines,
         len(list_distinct(string_split(text, chr(10))))::BIGINT AS n_dist
  FROM documents),
bg AS (
  SELECT doc_id,
         CASE WHEN len(tokens) < 2 THEN []::VARCHAR[]
              ELSE list_transform(range(1, len(tokens)),
                                  i -> tokens[i] || ' ' || tokens[i + 1])
         END AS bigrams
  FROM toks),
bc AS (
  SELECT doc_id, b, count(*)::BIGINT AS c
  FROM (SELECT doc_id, unnest(bigrams) AS b FROM bg) GROUP BY doc_id, b),
ba AS (
  SELECT doc_id, max(c) AS top, sum(c)::BIGINT AS nb
  FROM bc GROUP BY doc_id)
SELECT ln.doc_id,
       ln.n_lines,
       round((ln.n_lines - ln.n_dist)::DOUBLE / ln.n_lines, 6)
         AS dup_line_frac,
       coalesce(ba.nb, 0)::BIGINT AS n_bigrams,
       coalesce(round(ba.top::DOUBLE / ba.nb, 6), 0.0) AS top_bigram_share
FROM ln LEFT JOIN ba ON ba.doc_id = ln.doc_id"""

    sql["repetition_gate"] = f"""{rep_toks},
ln AS (
  SELECT doc_id,
         len(string_split(text, chr(10)))::BIGINT AS n_lines,
         len(list_distinct(string_split(text, chr(10))))::BIGINT AS n_dist
  FROM documents),
bg AS (
  SELECT doc_id,
         CASE WHEN len(tokens) < 2 THEN []::VARCHAR[]
              ELSE list_transform(range(1, len(tokens)),
                                  i -> tokens[i] || ' ' || tokens[i + 1])
         END AS bigrams
  FROM toks),
bc AS (
  SELECT doc_id, b, count(*)::BIGINT AS c
  FROM (SELECT doc_id, unnest(bigrams) AS b FROM bg) GROUP BY doc_id, b),
ba AS (
  SELECT doc_id, max(c) AS top, sum(c)::BIGINT AS nb
  FROM bc GROUP BY doc_id)
SELECT ln.doc_id, ln.n_lines, coalesce(ba.nb, 0)::BIGINT AS n_bigrams
FROM ln LEFT JOIN ba ON ba.doc_id = ln.doc_id
WHERE (ln.n_lines - ln.n_dist)::DOUBLE / ln.n_lines
        <= {REP_MAX_DUP_LINE_FRAC}
  AND (ba.nb IS NULL
       OR ba.top::DOUBLE / ba.nb <= {REP_MAX_TOP_BIGRAM_SHARE})"""

    sql["fulfillment_latency"] = """WITH lp AS (
  SELECT l_orderkey, count(*)::BIGINT AS n,
         sum(epoch_us(l_shipdate) // 86400000000)::BIGINT AS sd
  FROM lineitem GROUP BY l_orderkey)
SELECT o.o_orderpriority AS priority,
       sum(lp.n)::BIGINT AS n_lines,
       round(sum(lp.sd
                 - (epoch_us(o.o_orderdate) // 86400000000) * lp.n)::BIGINT
             / CAST(sum(lp.n) AS DOUBLE), 6) AS mean_days
FROM orders o JOIN lp ON lp.l_orderkey = o.o_orderkey
GROUP BY 1"""

    sql["revenue_mom_growth"] = """WITH g AS (
  SELECT (year(l_shipdate)*100 + month(l_shipdate))::BIGINT AS month,
         sum(CAST(round(l_extendedprice*(1 - l_discount)*10000, 0)
                  AS BIGINT))::BIGINT AS s
  FROM lineitem GROUP BY 1),
w AS (SELECT month, s, lag(s) OVER (ORDER BY month) AS prev FROM g)
SELECT month, round(s / 10000.0, 6) AS revenue,
       round((s - prev) / CAST(prev AS DOUBLE), 6) AS growth
FROM w WHERE prev IS NOT NULL"""

    sql["dup_cluster_sizes"] = f"""WITH cl AS (
  SELECT * FROM ({_minhash_clusters_sql()}) z)
SELECT cluster_size, count(*)::BIGINT AS n_clusters
FROM (SELECT cluster_id, count(*)::BIGINT AS cluster_size
      FROM cl GROUP BY cluster_id) g
GROUP BY cluster_size"""

    sql["weighted_median_price"] = """WITH e AS (
  SELECT CAST(round(l_extendedprice*100, 0) AS BIGINT) AS c,
         CAST(round(l_quantity, 0) AS BIGINT) AS q
  FROM lineitem),
g AS (SELECT c, sum(q)::BIGINT AS w FROM e GROUP BY c),
t AS (SELECT sum(w)::BIGINT AS total FROM g),
r AS (SELECT c, (sum(w) OVER (ORDER BY c))::BIGINT AS cum FROM g)
SELECT t.total AS total_qty,
       (SELECT min(c) FROM r WHERE cum * 2 >= t.total) / 100.0
         AS median_price
FROM t"""

    sql["rfm_segments"] = f"""WITH pc AS (
  SELECT o_custkey,
         max(epoch_us(o_orderdate) // 86400000000) AS last_day,
         count(*)::BIGINT AS n,
         sum(CAST(round(o_totalprice*100, 0) AS BIGINT))::BIGINT AS s
  FROM orders GROUP BY o_custkey),
h AS (SELECT max(last_day) - {RFM_RECENT_DAYS} AS horizon FROM pc),
seg AS (SELECT (pc.last_day >= h.horizon)::BIGINT AS recent,
               (pc.n >= {RFM_FREQ_MIN})::BIGINT AS frequent,
               (pc.s >= {RFM_MONEY_CENTS})::BIGINT AS big
        FROM pc, h),
grid AS (SELECT r.range::BIGINT AS recent, f.range::BIGINT AS frequent,
                b.range::BIGINT AS big_spender
         FROM range(2) r, range(2) f, range(2) b)
SELECT g.recent, g.frequent, g.big_spender,
       coalesce((SELECT count(*) FROM seg
                 WHERE seg.recent = g.recent
                   AND seg.frequent = g.frequent
                   AND seg.big = g.big_spender), 0)::BIGINT AS n_customers
FROM grid g"""

    sql["pareto_share"] = """WITH pc AS (
  SELECT o_custkey,
         sum(CAST(round(o_totalprice*100, 0) AS BIGINT))::BIGINT AS s
  FROM orders GROUP BY o_custkey),
rk AS (SELECT s, row_number() OVER (ORDER BY s DESC, o_custkey ASC) AS rn
       FROM pc),
t AS (SELECT count(*)::BIGINT AS n, sum(s)::BIGINT AS total FROM pc)
SELECT t.n AS n_customers, (t.n // 5)::BIGINT AS top_n,
       round(coalesce((SELECT sum(s) FROM rk WHERE rn <= t.n // 5), 0)
             / CAST(t.total AS DOUBLE), 6) AS share
FROM t"""

    sql["theil_revenue"] = """WITH pc AS (
  SELECT o_custkey,
         sum(CAST(round(o_totalprice*100, 0) AS BIGINT))::BIGINT AS s
  FROM orders GROUP BY o_custkey),
t AS (SELECT count(*)::BIGINT AS n, sum(s)::BIGINT AS total FROM pc),
q AS (SELECT sum(floor((pc.s / (t.total / CAST(t.n AS DOUBLE)))
                       * ln(pc.s / (t.total / CAST(t.n AS DOUBLE)))
                       * 1000000000.0)::BIGINT)::BIGINT AS quant,
             any_value(t.n) AS n
      FROM pc CROSS JOIN t)
SELECT n AS n_customers,
       round((quant / 1000000000.0) / n, 6) AS theil
FROM q"""

    sql["effective_sources"] = """WITH c AS (
  SELECT source, count(*)::BIGINT AS n FROM documents GROUP BY source)
SELECT sum(n)::BIGINT AS n_docs,
       count(*)::BIGINT AS n_sources,
       round((sum(n)::BIGINT * sum(n)::BIGINT)
             / CAST(sum(n*n)::BIGINT AS DOUBLE), 6) AS effective
FROM c"""

    ks_vals = ", ".join(f"({k})" for k in COVERAGE_KS)
    sql["vocab_coverage"] = f"""{toks}
, tc AS (
  SELECT t AS term, count(*)::BIGINT AS c
  FROM (SELECT unnest(tokens) AS t FROM toks) z GROUP BY t),
ranked AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, term ASC) AS rn FROM tc),
tot AS (SELECT sum(c)::BIGINT AS n FROM tc)
SELECT ks.k::BIGINT AS k,
       round((SELECT sum(c) FROM ranked WHERE rn <= ks.k)
             / CAST(tot.n AS DOUBLE), 6) AS coverage
FROM (VALUES {ks_vals}) AS ks(k), tot"""

    sql["rolling_anomaly"] = f"""WITH ord AS (
  SELECT event_id, user_id,
         CAST(round(value*100, 0) AS BIGINT) AS vc,
         epoch_us(ts) AS t
  FROM events),
w AS (
  SELECT event_id, user_id, vc,
         sum(vc) OVER win AS s,
         sum(vc * vc) OVER win AS ss,
         count(*) OVER win AS wn
  FROM ord
  WINDOW win AS (PARTITION BY user_id ORDER BY t, event_id
                 ROWS BETWEEN {ANOM_WINDOW - 1} PRECEDING AND CURRENT ROW)),
f AS (
  SELECT event_id, user_id,
         CASE WHEN ({ANOM_WINDOW} * ss - s * s)
                   / CAST({ANOM_WINDOW * ANOM_WINDOW} AS DOUBLE) > 0
              THEN round((vc - s / CAST({ANOM_WINDOW} AS DOUBLE))
                   / sqrt(({ANOM_WINDOW} * ss - s * s)
                          / CAST({ANOM_WINDOW * ANOM_WINDOW} AS DOUBLE)), 6)
              ELSE 0.0 END AS z
  FROM w WHERE wn = {ANOM_WINDOW})
SELECT event_id, user_id, z,
       (abs(z) > {ANOM_Z})::BIGINT AS is_anomaly
FROM f"""

    sql["quality_gate_kappa"] = f"""{toks}
, lab AS (
  SELECT (d.n_chars >= {KAPPA_CHARS_MIN}) AS a,
         (len(t.tokens) >= {KAPPA_TOKENS_MIN}) AS b
  FROM documents d JOIN toks t USING (doc_id)),
cnt AS (
  SELECT count(*) FILTER (a AND b)::BIGINT AS n11,
         count(*) FILTER (a AND NOT b)::BIGINT AS n10,
         count(*) FILTER (NOT a AND b)::BIGINT AS n01,
         count(*) FILTER (NOT a AND NOT b)::BIGINT AS n00
  FROM lab),
f AS (SELECT n11 + n10 + n01 + n00 AS n,
             (n11 + n00) / CAST(n11 + n10 + n01 + n00 AS DOUBLE) AS po,
             (n11 + n10) / CAST(n11 + n10 + n01 + n00 AS DOUBLE) AS pa,
             (n11 + n01) / CAST(n11 + n10 + n01 + n00 AS DOUBLE) AS pb
      FROM cnt)
SELECT n, round(po, 6) AS po,
       round((po - (pa * pb + (1.0 - pa) * (1.0 - pb)))
             / (1.0 - (pa * pb + (1.0 - pa) * (1.0 - pb))), 6) AS kappa
FROM f"""

    sql["cramers_v"] = """WITH cells AS (
  SELECT lang, source, count(*)::BIGINT AS o FROM documents GROUP BY 1, 2),
r AS (SELECT lang, sum(o)::BIGINT AS rt FROM cells GROUP BY lang),
c AS (SELECT source, sum(o)::BIGINT AS ct FROM cells GROUP BY source),
tot AS (SELECT sum(o)::BIGINT AS n FROM cells),
k AS (SELECT LEAST((SELECT count(*) FROM r) - 1,
                   (SELECT count(*) FROM c) - 1)::BIGINT AS k),
chi AS (
  SELECT tot.n,
         (sum(floor((cells.o::DOUBLE - (r.rt::DOUBLE * c.ct / tot.n))
                    * (cells.o::DOUBLE - (r.rt::DOUBLE * c.ct / tot.n))
                    / (r.rt::DOUBLE * c.ct / tot.n)
                    * 1000000.0)::BIGINT))::DOUBLE / 1000000.0 AS chi2
  FROM cells JOIN r USING (lang) JOIN c USING (source) CROSS JOIN tot
  GROUP BY tot.n)
SELECT chi.n, k.k,
       round(CASE WHEN k.k > 0
                  THEN sqrt(chi.chi2 / (chi.n * k.k)) ELSE 0.0 END, 6) AS v
FROM chi CROSS JOIN k"""

    sql["hourly_filled"] = """WITH b AS (
  SELECT date_trunc('hour', ts) AS h, event_type FROM events),
bounds AS (SELECT min(h) AS lo, max(h) AS hi FROM b),
grid AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS window
         FROM bounds),
types AS (SELECT DISTINCT event_type FROM b),
c AS (SELECT h, event_type, count(*)::BIGINT AS n FROM b GROUP BY h, event_type)
SELECT g.window, t.event_type, coalesce(c.n, 0)::BIGINT AS n
FROM grid g CROSS JOIN types t
LEFT JOIN c ON c.h = g.window AND c.event_type = t.event_type"""

    sql["last_click_locf"] = """SELECT event_id, user_id,
       epoch_us(last_ts)::BIGINT AS last_mark_us
FROM (
  SELECT event_id, user_id,
         max(CASE WHEN event_type = 'click' THEN ts END) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING) AS last_ts
  FROM events)
WHERE last_ts IS NOT NULL"""

    sql["revenue_cube"] = """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
       coalesce(l_linestatus, 'ALL') AS l_linestatus,
       count(*)::BIGINT AS n,
       round(sum(round(l_extendedprice * 100)) / 100, 6) AS total
FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)"""

    sql["user_type_profile"] = """SELECT user_id,
       count(*)::BIGINT AS n_types,
       string_agg(event_type, '|' ORDER BY event_type) AS type_profile
FROM (SELECT DISTINCT user_id, event_type FROM events)
GROUP BY user_id"""

    # doubled average tie ranks 2r = 2*cum_below + c + 1 are integers;
    # BIGINT sums (HUGEINT accumulate) cast to DOUBLE in the exact order
    # grouped_spearman replicates
    sql["spearman_qty_discount"] = """WITH b AS (
  SELECT l_returnflag AS g, round(l_quantity)::BIGINT AS x,
         round(l_discount * 100)::BIGINT AS y FROM lineitem),
j AS (SELECT g, x, y, count(*)::BIGINT AS n FROM b GROUP BY g, x, y),
cx AS (SELECT g, x, sum(n)::BIGINT AS c FROM j GROUP BY g, x),
rx AS (SELECT g, x,
       (2 * (sum(c) OVER (PARTITION BY g ORDER BY x
                          ROWS UNBOUNDED PRECEDING) - c) + c + 1)::BIGINT AS r2
       FROM cx),
cy AS (SELECT g, y, sum(n)::BIGINT AS c FROM j GROUP BY g, y),
ry AS (SELECT g, y,
       (2 * (sum(c) OVER (PARTITION BY g ORDER BY y
                          ROWS UNBOUNDED PRECEDING) - c) + c + 1)::BIGINT AS r2
       FROM cy),
s AS (
  SELECT j.g, sum(j.n)::DOUBLE AS n,
         sum(j.n * rx.r2)::DOUBLE AS sx,
         sum(j.n * ry.r2)::DOUBLE AS sy,
         sum(j.n * rx.r2 * ry.r2)::DOUBLE AS sxy,
         sum(j.n * rx.r2 * rx.r2)::DOUBLE AS sxx,
         sum(j.n * ry.r2 * ry.r2)::DOUBLE AS syy
  FROM j JOIN rx ON j.g = rx.g AND j.x = rx.x
         JOIN ry ON j.g = ry.g AND j.y = ry.y
  GROUP BY j.g)
SELECT g AS l_returnflag, n::BIGINT AS n,
       CASE WHEN (sxx - sx * sx / n) * (syy - sy * sy / n) > 0
            THEN round((sxy - sx * sy / n)
                 / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)), 6)
            ELSE 0.0 END AS spearman
FROM s"""

    sql["event_sample"] = f"""SELECT event_id FROM events
ORDER BY md5_number_upper(event_id::VARCHAR), event_id LIMIT {KSAMPLE_K}"""

    sql["inactive_customers"] = """SELECT c_custkey FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)"""

    sql["dup_spans"] = f"""{toks}
, sh AS (
  SELECT doc_id,
         CASE WHEN len(tokens) < {DUP_SPAN_K} THEN []::VARCHAR[]
              ELSE list_transform(range(1, len(tokens) - {DUP_SPAN_K - 2}),
                   i -> array_to_string(list_slice(tokens, i, i + {DUP_SPAN_K - 1}), ' '))
         END AS shingles
  FROM toks
)
SELECT shingle, count(DISTINCT doc_id)::BIGINT AS n_docs,
       count(*)::BIGINT AS n_occ, min(doc_id)::BIGINT AS keep_doc_id
FROM (SELECT doc_id, unnest(shingles) AS shingle FROM sh)
GROUP BY shingle HAVING count(DISTINCT doc_id) >= 2"""

    sql["distinct_users"] = """SELECT event_type,
       count(DISTINCT user_id)::BIGINT AS n_distinct
FROM events GROUP BY event_type"""

    # BM25: constants appear as the SAME literals in the same positions
    # as q_search_bm25_topk's python expression; fixed term order in the
    # score sum so both sides add in the same order
    bm25_exprs = []
    for t in SEARCH_TERMS:
        cnt = f"len(list_filter(tokens, x -> x = '{t}'))::DOUBLE"
        bm25_exprs.append(
            f"(SELECT idf FROM idfs WHERE term = '{t}') * (({cnt} * 2.2)"
            f" / ({cnt} + 1.2 * (0.25 + 0.75 * len(tokens)::DOUBLE / adl.a)))"
        )
    bm25_chain = bm25_exprs[0]
    for e in bm25_exprs[1:]:
        bm25_chain = f"({bm25_chain} + {e})"
    sql["search_bm25_topk"] = f"""{toks},
 idfs AS (
  SELECT term, log10((SELECT count(*) FROM documents)::DOUBLE / count(DISTINCT doc_id)) AS idf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM toks)
  WHERE term IN ({terms_in})
  GROUP BY term
),
 adl AS (SELECT sum(len(tokens))::DOUBLE / count(*) AS a FROM toks)
SELECT doc_id, round(score_raw, 6) AS score FROM (
  SELECT doc_id, {bm25_chain} AS score_raw
  FROM toks, adl
  WHERE len(tokens) > 0
    AND len(list_filter(tokens, x -> list_contains([{terms_in}], x))) > 0
  ORDER BY score_raw DESC, doc_id
  LIMIT 20
)"""

    sql["repetition_stats"] = f"""{toks}
, bg AS (
  SELECT doc_id, tokens,
         CASE WHEN len(tokens) >= 2
              THEN list_transform(range(1, len(tokens)),
                   i -> tokens[i] || ' ' || tokens[i + 1])
              ELSE []::VARCHAR[] END AS bgs
  FROM toks
)
SELECT doc_id,
       CASE WHEN len(tokens) > 0
            THEN round(1.0 - len(list_distinct(tokens))::DOUBLE / len(tokens), 6)
            ELSE 0.0 END AS dup_token_frac,
       CASE WHEN len(bgs) > 0
            THEN round(list_max(list_transform(list_distinct(bgs),
                 x -> len(list_filter(bgs, y -> y = x))))::DOUBLE / len(bgs), 6)
            ELSE 0.0 END AS top_bigram_frac
FROM bg"""

    sql["redact_props"] = f"""SELECT event_id,
       len(regexp_extract_all(props, '{REDACT_PATTERN}'))::BIGINT AS n_matches,
       sha256(regexp_replace(props, '{REDACT_PATTERN}', '#', 'g')) AS redacted_sha256
FROM events"""

    sql["props_sum_by_type"] = f"""SELECT event_type,
       count(v)::BIGINT AS n, sum(v)::BIGINT AS sum_v, max(v)::BIGINT AS max_v
FROM (
  SELECT event_type,
         CAST(NULLIF(regexp_extract(props, '"{PROPS_FIELD}":\\s*(-?\\d+)', 1), '') AS BIGINT) AS v
  FROM events
)
GROUP BY event_type"""

    mix_vals = ", ".join(f"('{g}', {w})" for g, w in MIX_WEIGHTS.items())
    sql["mixture_sample"] = f"""{toks}
, tot AS (SELECT lang, sum(len(tokens))::BIGINT AS t FROM toks GROUP BY lang),
  th AS (SELECT tot.lang,
                least(1000000,
                      ({MIX_BUDGET}::BIGINT * w.w * 1000000)
                      // (1000 * tot.t)) AS thresh
         FROM tot JOIN (VALUES {mix_vals}) w(lang, w) ON w.lang = tot.lang)
SELECT d.doc_id, d.lang, len(d.tokens)::BIGINT AS n_tokens
FROM toks d JOIN th ON th.lang = d.lang
WHERE md5_number_upper(d.doc_id::VARCHAR) % 1000000 < th.thresh
ORDER BY d.doc_id"""

    sql["term_pmi"] = f"""{toks}
, dt AS (SELECT doc_id, unnest(list_distinct(tokens)) AS t FROM toks),
  df AS (SELECT t, count(*)::BIGINT AS c FROM dt GROUP BY t),
  nn AS (SELECT count(*)::DOUBLE AS n FROM documents),
  pairs AS (
    SELECT a.t AS term_a, b.t AS term_b, count(*)::BIGINT AS n_docs
    FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.t < b.t
    GROUP BY 1, 2 HAVING count(*) >= 2
  )
SELECT p.term_a, p.term_b, p.n_docs,
       round(log10(nn.n * p.n_docs / (da.c * db.c)), 6) AS pmi
FROM pairs p
CROSS JOIN nn
JOIN df da ON da.t = p.term_a
JOIN df db ON db.t = p.term_b
ORDER BY term_a, term_b"""

    pivot_cols = ",\n       ".join(
        f"count(CASE WHEN event_type = '{c}' THEN 1 END)::BIGINT AS {c}"
        for c in PIVOT_TYPES
    )
    sql["event_type_pivot"] = f"""SELECT user_id,
       {pivot_cols}
FROM events GROUP BY user_id ORDER BY user_id"""

    sql["running_value"] = """SELECT event_id, user_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 6)
           AS running_value
FROM events ORDER BY event_id"""

    sql["priority_revenue"] = """SELECT o_orderpriority,
       count(*)::BIGINT AS n,
       round(sum(round(l_extendedprice * 100) * (100 - round(l_discount * 100)))
             / 10000, 6) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority"""

    sql["decontaminate"] = f"""{toks}
, sh AS (
  SELECT doc_id,
         CASE WHEN len(tokens) < {DECONTAM_K} THEN []::VARCHAR[]
              ELSE list_distinct(list_transform(range(1, len(tokens) - {DECONTAM_K - 2}),
                   i -> array_to_string(list_slice(tokens, i, i + {DECONTAM_K - 1}), ' ')))
         END AS shingles
  FROM toks
),
bsh AS (SELECT DISTINCT unnest(shingles) AS s FROM sh
        WHERE doc_id % {DECONTAM_BENCH_MOD} = 0),
dsh AS (SELECT doc_id, unnest(shingles) AS s FROM sh
        WHERE doc_id % {DECONTAM_BENCH_MOD} <> 0)
SELECT d.doc_id, count(*)::BIGINT AS n_overlap
FROM dsh d JOIN bsh b USING (s)
GROUP BY d.doc_id ORDER BY d.doc_id"""

    from .extras.decontam import BLOOM_K, BLOOM_M

    # bit positions: md5_number_upper(j || '#' || s) % M == python
    # md5(f"{j}#{s}")[:8] little-endian % M; a (doc,shingle) is a maybe-hit
    # iff all BLOOM_K positions land in the benchmark's distinct-position
    # set (count(*) = K after the inner join, since positions are distinct
    # per (s,j) and the bits side is deduplicated)
    sql["bloom_decontaminate"] = f"""{toks}
, sh AS (
  SELECT doc_id,
         CASE WHEN len(tokens) < {DECONTAM_K} THEN []::VARCHAR[]
              ELSE list_distinct(list_transform(range(1, len(tokens) - {DECONTAM_K - 2}),
                   i -> array_to_string(list_slice(tokens, i, i + {DECONTAM_K - 1}), ' ')))
         END AS shingles
  FROM toks
),
bits AS (
  SELECT DISTINCT (md5_number_upper(j::VARCHAR || '#' || s) % {BLOOM_M})::BIGINT AS pos
  FROM (SELECT DISTINCT unnest(shingles) AS s FROM sh
        WHERE doc_id % {DECONTAM_BENCH_MOD} = 0),
       range({BLOOM_K}) r(j)
),
dpos AS (
  SELECT doc_id, s, j,
         (md5_number_upper(j::VARCHAR || '#' || s) % {BLOOM_M})::BIGINT AS pos
  FROM (SELECT doc_id, unnest(shingles) AS s FROM sh
        WHERE doc_id % {DECONTAM_BENCH_MOD} <> 0),
       range({BLOOM_K}) r(j)
),
hits AS (
  SELECT doc_id, s FROM dpos JOIN bits USING (pos)
  GROUP BY doc_id, s HAVING count(*) = {BLOOM_K}
)
SELECT doc_id, count(*)::BIGINT AS n_maybe
FROM hits GROUP BY doc_id ORDER BY doc_id"""

    # semdedup: the fixed seeded centroids inline as DOUBLE[] literals
    # (repr() round-trips float64 exactly through DuckDB's parser); the
    # assignment replays argmax-by-(round6 cos desc, cid asc) as a
    # row_number window, then pairs join within cluster only
    from .extras.similarity import semdedup_centroids

    _cents = semdedup_centroids(SEMDEDUP_K, EMB_DIM)
    _cent_rows = ",\n  ".join(
        f"({i}, [{', '.join(repr(float(x)) for x in c)}]::DOUBLE[])"
        for i, c in enumerate(_cents)
    )
    sql["semdedup_pairs"] = f"""WITH c(cid, ce) AS (VALUES
  {_cent_rows}),
v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
asg AS (
  SELECT vec_id, e, cid FROM (
    SELECT v.vec_id, v.e, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
               ORDER BY round(list_cosine_similarity(v.e, c.ce), 6) DESC, c.cid) AS rn
    FROM v CROSS JOIN c)
  WHERE rn = 1
)
SELECT x.cid::BIGINT AS cid, x.vec_id AS a, y.vec_id AS b,
       round(list_cosine_similarity(x.e, y.e), 6) AS cos
FROM asg x JOIN asg y ON x.cid = y.cid AND x.vec_id < y.vec_id
WHERE round(list_cosine_similarity(x.e, y.e), 6) >= {SEMDEDUP_TAU}
ORDER BY a, b"""

    sql["cap_per_lang"] = f"""SELECT lang, doc_id FROM (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang
             ORDER BY md5_number_upper(doc_id::VARCHAR), doc_id) AS rn
  FROM documents)
WHERE rn <= {CAP_PER_LANG} ORDER BY lang, doc_id"""

    sql["token_budget_sample"] = f"""{toks}
, n AS (
  SELECT lang, doc_id, len(tokens)::BIGINT AS n_tokens,
         md5_number_upper(doc_id::VARCHAR) AS h
  FROM toks)
SELECT lang, doc_id, n_tokens FROM (
  SELECT lang, doc_id, n_tokens,
         sum(n_tokens) OVER (PARTITION BY lang ORDER BY h, doc_id) AS cum
  FROM n)
WHERE cum <= {TOKEN_BUDGET} ORDER BY lang, doc_id"""

    sql["bpe_pair_counts"] = f"""{toks}
, wf AS (
  SELECT t AS word, count(*)::BIGINT AS freq
  FROM (SELECT unnest(tokens) AS t FROM toks) GROUP BY t
),
pr AS (
  SELECT unnest(list_transform(range(1, length(word)),
                               i -> substr(word, i, 2))) AS pair,
         freq
  FROM wf
)
SELECT pair, sum(freq)::BIGINT AS cnt FROM pr GROUP BY pair ORDER BY pair"""

    bpe_chain = _bpe_merge_chain(BPE_MERGES, 50_000)
    sql["bpe_merges"] = f"""{toks}
{bpe_chain}
SELECT rank, l AS "left", r AS "right", cnt AS freq FROM merges ORDER BY rank"""

    sql["bpe_token_counts"] = f"""{toks}
{bpe_chain},
symct AS (
  SELECT word, len(string_split(trim(seq, '()'), ')('))::BIGINT AS n_sym
  FROM w{BPE_MERGES}
)
SELECT k.doc_id, coalesce(s.total, 0)::BIGINT AS n_bpe_tokens
FROM (SELECT doc_id FROM toks) k
LEFT JOIN (
  SELECT t.doc_id, sum(sy.n_sym) AS total
  FROM (SELECT doc_id, unnest(tokens) AS word FROM toks) t
  JOIN symct sy USING (word)
  GROUP BY t.doc_id
) s USING (doc_id)
ORDER BY doc_id"""

    sql["pack_offsets"] = f"""{toks}
, n AS (SELECT doc_id, len(tokens)::BIGINT AS n_tokens FROM toks)
SELECT doc_id, n_tokens,
       (sum(n_tokens) OVER w - n_tokens)::BIGINT AS start_offset,
       ((sum(n_tokens) OVER w - n_tokens) // {PACK_CAPACITY})::BIGINT AS pack_id,
       ((sum(n_tokens) OVER w - n_tokens) % {PACK_CAPACITY})::BIGINT AS pack_offset
FROM n WINDOW w AS (ORDER BY doc_id) ORDER BY doc_id"""

    sql["negative_samples"] = f"""WITH n AS (SELECT count(*)::BIGINT AS n FROM embeddings),
m AS (
  SELECT vec_id, j,
         (md5_number_upper(vec_id::VARCHAR || '#' || j::VARCHAR)
          % (n.n - 1))::BIGINT AS m
  FROM embeddings, n, range({NEG_K}) r(j)
)
SELECT vec_id, j, CASE WHEN m >= vec_id THEN m + 1 ELSE m END AS neg_id
FROM m ORDER BY vec_id, j"""

    from .extras.similarity import RP_SCALE, projection_matrix

    _proj = projection_matrix(EMB_DIM, RP_OUT_DIM)
    _pvals = ",\n  ".join(
        f"({d}, {o}, {float(_proj[d, o])!r})"
        for d in range(EMB_DIM)
        for o in range(RP_OUT_DIM)
    )
    sql["random_projection"] = f"""WITH p(d, o, w) AS (VALUES
  {_pvals})
SELECT vec_id, o::BIGINT AS dim,
       round(sum(floor(embedding[d + 1]::DOUBLE * w * {RP_SCALE}))
             / {RP_SCALE}.0, 6) AS y
FROM embeddings, p
GROUP BY vec_id, o ORDER BY vec_id, o"""

    sql["hll_users_by_type"] = """WITH h AS (
  SELECT event_type, md5_number_upper(user_id::VARCHAR) AS hv
  FROM (SELECT DISTINCT event_type, user_id FROM events)
),
r AS (SELECT event_type, (hv >> 52)::BIGINT AS bucket,
             CASE WHEN (hv & 4503599627370495) = 0 THEN 53
                  ELSE 53 - length(bin(hv & 4503599627370495)) END AS rho
      FROM h)
SELECT event_type, bucket, max(rho)::BIGINT AS rho
FROM r GROUP BY event_type, bucket ORDER BY event_type, bucket"""

    sql["pack_by_lang"] = f"""{toks}
, n AS (SELECT lang, doc_id, len(tokens)::BIGINT AS n_tokens FROM toks)
SELECT lang, doc_id, n_tokens,
       (sum(n_tokens) OVER w - n_tokens)::BIGINT AS start_offset,
       ((sum(n_tokens) OVER w - n_tokens) // {PACK_CAPACITY})::BIGINT AS pack_id,
       ((sum(n_tokens) OVER w - n_tokens) % {PACK_CAPACITY})::BIGINT AS pack_offset
FROM n WINDOW w AS (PARTITION BY lang ORDER BY doc_id)
ORDER BY lang, doc_id"""

    sql["revenue_by_region"] = """SELECT r.r_name,
       count(*)::BIGINT AS n,
       round(sum(round(o.o_totalprice * 100)) / 100, 6) AS total
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation na ON c.c_nationkey = na.n_nationkey
JOIN region r ON na.n_regionkey = r.r_regionkey
GROUP BY r.r_name"""

    # exact integer sufficient statistics (qty integral, discount in
    # cents); the float finalize expression mirrors extras/stats.
    # grouped_corr operation-for-operation (naive corr()/covar_samp()
    # would differ past 6dp from cancellation at these magnitudes)
    sql["corr_qty_discount"] = """WITH s AS (
  SELECT l_returnflag, count(*)::DOUBLE AS n,
         sum(x)::DOUBLE AS sx, sum(y)::DOUBLE AS sy,
         sum(x * y)::DOUBLE AS sxy,
         sum(x * x)::DOUBLE AS sxx, sum(y * y)::DOUBLE AS syy
  FROM (SELECT l_returnflag, round(l_quantity)::BIGINT AS x,
               round(l_discount * 100)::BIGINT AS y FROM lineitem)
  GROUP BY l_returnflag
)
SELECT l_returnflag, n::BIGINT AS n,
       CASE WHEN n > 1
            THEN round((sxy - sx * sy / n) / (n - 1) / 100, 6)
            ELSE 0.0 END AS covar,
       CASE WHEN (sxx - sx * sx / n) * (syy - sy * sy / n) > 0
            THEN round((sxy - sx * sy / n)
                 / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)), 6)
            ELSE 0.0 END AS corr
FROM s"""

    sql["mode_event_type"] = """SELECT user_id, event_type AS mode_event_type, n
FROM (
  SELECT user_id, event_type, count(*)::BIGINT AS n,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY count(*) DESC, event_type) AS rn
  FROM events GROUP BY user_id, event_type
) WHERE rn = 1 ORDER BY user_id"""

    # group moments from exact integer cent sums; the z expression
    # mirrors extras/stats.grouped_zscore operation-for-operation
    sql["zscore_price"] = """WITH s AS (
  SELECT p_brand, count(*)::DOUBLE AS n,
         sum(c)::DOUBLE AS s, sum(c * c)::DOUBLE AS ss
  FROM (SELECT p_brand, round(p_retailprice * 100)::BIGINT AS c FROM part)
  GROUP BY p_brand
)
SELECT p.p_partkey, p.p_brand,
       CASE WHEN (s.ss / s.n) / 10000
                 - ((s.s / s.n) / 100) * ((s.s / s.n) / 100) > 0
            THEN round((round(p.p_retailprice * 100) / 100 - (s.s / s.n) / 100)
                 / sqrt((s.ss / s.n) / 10000
                        - ((s.s / s.n) / 100) * ((s.s / s.n) / 100)), 6)
            ELSE 0.0 END AS z
FROM part p JOIN s USING (p_brand)"""

    # exact integer frame sums at 1e-6 (the testdata's own precision),
    # so the segment-tree window order cannot flip the 6dp compare
    sql["rolling_value_avg"] = f"""SELECT event_id, user_id,
       round((sum(round(value * 1000000)::BIGINT) OVER w)::DOUBLE
             / count(*) OVER w / 1000000, 6) AS rolling_avg
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN {ROLLING_FRAME - 1} PRECEDING AND CURRENT ROW)"""

    sql["event_gaps"] = """SELECT event_id, user_id,
       (epoch_us(ts) - epoch_us(lag(ts) OVER w))::BIGINT AS gap_us
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
QUALIFY lag(ts) OVER w IS NOT NULL"""

    sql["latest_event"] = """SELECT user_id, event_id, ts, value
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC) = 1"""

    from .extras.sketch import CMS_D, CMS_W

    sql["cms_tokens"] = f"""{toks}
SELECT j, (md5_number_upper(j::VARCHAR || ':' || t) % {CMS_W})::BIGINT AS idx,
       count(*)::BIGINT AS c
FROM (SELECT unnest(tokens) AS t FROM toks)
CROSS JOIN range(0, {CMS_D}) r(j)
GROUP BY 1, 2 ORDER BY 1, 2"""

    sql["customer_event_counts"] = """SELECT c_custkey,
       count(e.user_id)::BIGINT AS n_events
FROM customer c LEFT JOIN events e ON e.user_id = c.c_custkey
GROUP BY c_custkey ORDER BY c_custkey"""

    sql["value_pct_rank"] = """SELECT event_id, user_id,
       round(percent_rank() OVER (PARTITION BY user_id
                                  ORDER BY value, event_id), 6) AS pct_rank
FROM events"""

    # Efraimidis–Spirakis keys ln(u)/w with u = (md5_le64(id)+0.5)/2^64 —
    # the same doubles on both sides; selection gaps dwarf libm ln ulp
    sql["weighted_doc_sample"] = f"""{toks}
, w AS (SELECT doc_id, len(tokens)::BIGINT AS n_tokens FROM toks
        WHERE len(tokens) > 0)
SELECT doc_id, n_tokens FROM w
ORDER BY ln((md5_number_upper(doc_id::VARCHAR)::DOUBLE + 0.5)
            / 18446744073709551616.0) / n_tokens DESC, doc_id
LIMIT {WSAMPLE_K}"""

    # per-term −p·log2(p) floor-quantized at 1e-6 and summed as an exact
    # integer (the CENTROID_SCALE discipline) — invariant to summation
    # order and to last-ulp libm log2 differences
    sql["token_entropy"] = f"""{toks}
, tc AS (
  SELECT doc_id, t, count(*)::BIGINT AS c
  FROM (SELECT doc_id, unnest(tokens) AS t FROM toks) GROUP BY doc_id, t
),
 nt AS (SELECT doc_id, len(tokens)::BIGINT AS n FROM toks),
 e AS (
  SELECT tc.doc_id,
         sum(floor(-(tc.c::DOUBLE / nt.n) * log2(tc.c::DOUBLE / nt.n)
                   * 1000000))::BIGINT AS s
  FROM tc JOIN nt USING (doc_id) GROUP BY tc.doc_id
)
SELECT nt.doc_id, nt.n AS n_tokens,
       coalesce(e.s, 0)::DOUBLE / 1000000 AS entropy
FROM nt LEFT JOIN e USING (doc_id)"""

    sql["keyword_extract"] = f"""{toks}
, u AS (SELECT doc_id, unnest(tokens) AS term, len(tokens) AS dl
        FROM toks WHERE len(tokens) > 0)
, tf AS (SELECT doc_id, term, count(*) AS c, any_value(dl) AS dl
         FROM u GROUP BY doc_id, term)
, dfv AS (SELECT term, count(DISTINCT doc_id) AS df FROM u GROUP BY term)
, nn AS (SELECT count(*) AS n FROM documents)
, scored AS (
  SELECT tf.doc_id, tf.term,
         (tf.c::DOUBLE / tf.dl) * log10(nn.n::DOUBLE / dfv.df) AS s
  FROM tf JOIN dfv USING (term) CROSS JOIN nn)
, ranked AS (
  SELECT doc_id, term, s,
         row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, term) AS rank
  FROM scored)
SELECT doc_id, rank, term, ROUND(s, 6) AS score
FROM ranked WHERE rank <= {KEYWORDS_K} ORDER BY doc_id, rank"""

    sql["bigram_lm"] = f"""{toks}
, bgl AS (SELECT doc_id,
                 unnest(list_transform(range(1, len(tokens)),
                        i -> tokens[i] || ' ' || tokens[i+1])) AS big,
                 unnest(list_transform(range(1, len(tokens)),
                        i -> tokens[i])) AS w1
          FROM toks WHERE len(tokens) >= 2)
, dbg AS (SELECT doc_id, big, w1, count(*) AS c FROM bgl GROUP BY doc_id, big, w1)
, c2 AS (SELECT big, w1, sum(c)::BIGINT AS c2 FROM dbg GROUP BY big, w1)
, c1 AS (SELECT w1, sum(c)::BIGINT AS c1 FROM dbg GROUP BY w1)
, vv AS (SELECT count(*) AS v FROM c1)
, lp AS (SELECT c2.big,
                CAST(ROUND(log10((c2.c2 + 1)::DOUBLE / (c1.c1 + vv.v))
                           * 1000000.0) AS BIGINT) AS micro
         FROM c2 JOIN c1 USING (w1) CROSS JOIN vv)
, per AS (SELECT d.doc_id, SUM(d.c * lp.micro) AS sm, SUM(d.c) AS nb
          FROM dbg d JOIN lp USING (big) GROUP BY d.doc_id)
SELECT doc_id, nb::BIGINT AS n_bigrams,
       ROUND((sm / 1000000.0) / nb, 6) AS lm_score
FROM per ORDER BY doc_id"""

    s1, s2, s3 = FUNNEL_STAGES
    wh = FUNNEL_WINDOW_US // 3_600_000_000
    sql["funnel"] = f"""WITH u AS (SELECT DISTINCT user_id FROM events),
f1 AS (SELECT user_id, min(ts) AS t1 FROM events
       WHERE event_type = '{s1}' GROUP BY user_id),
f2 AS (SELECT e.user_id, f1.t1, min(e.ts) AS t2 FROM events e JOIN f1 USING (user_id)
       WHERE e.event_type = '{s2}' AND e.ts >= f1.t1
         AND e.ts <= f1.t1 + INTERVAL {wh} HOUR
       GROUP BY e.user_id, f1.t1),
f3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN f2 USING (user_id)
       WHERE e.event_type = '{s3}' AND e.ts >= f2.t2
         AND e.ts <= f2.t1 + INTERVAL {wh} HOUR
       GROUP BY e.user_id)
SELECT u.user_id,
       (CASE WHEN f3.user_id IS NOT NULL THEN 3
             WHEN f2.user_id IS NOT NULL THEN 2
             WHEN f1.user_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS funnel_stage
FROM u LEFT JOIN f1 ON u.user_id = f1.user_id
       LEFT JOIN f2 ON u.user_id = f2.user_id
       LEFT JOIN f3 ON u.user_id = f3.user_id"""

    # replicates extras/stats.quantile_cont expression-for-expression
    # (same FP order) at q=0.5, inner median rounded before deviations
    sql["mad_value"] = """WITH vals AS (
  SELECT event_type, list_sort(list(value)) AS arr, count(*)::BIGINT AS n
  FROM events GROUP BY event_type),
med AS (
  SELECT event_type, n, arr,
         round(arr[floor(0.5 * (n - 1))::BIGINT + 1]
                 * (1.0 - (0.5 * (n - 1) - floor(0.5 * (n - 1))))
               + arr[ceil(0.5 * (n - 1))::BIGINT + 1]
                 * (0.5 * (n - 1) - floor(0.5 * (n - 1))), 6) AS med
  FROM vals),
dev AS (
  SELECT event_type, n, med,
         list_sort(list_transform(arr, x -> abs(x - med))) AS darr
  FROM med)
SELECT event_type, n, med,
       round(darr[floor(0.5 * (n - 1))::BIGINT + 1]
               * (1.0 - (0.5 * (n - 1) - floor(0.5 * (n - 1))))
             + darr[ceil(0.5 * (n - 1))::BIGINT + 1]
               * (0.5 * (n - 1) - floor(0.5 * (n - 1))), 6) AS mad
FROM dev"""

    nb = DSIR_BUCKETS
    sql["dsir"] = f"""{toks}
, u AS (SELECT doc_id, lang, unnest(tokens) AS t FROM toks)
, bk AS (SELECT doc_id, lang, (md5_number_upper(t) % {nb})::BIGINT AS b FROM u)
, hist AS (SELECT b, count(*)::BIGINT AS c_all,
                  coalesce(count(*) FILTER (WHERE lang = '{DSIR_TARGET_LANG}'), 0)::BIGINT AS c_tgt
           FROM bk GROUP BY b)
, tot AS (SELECT sum(c_all)::BIGINT AS n_all, sum(c_tgt)::BIGINT AS n_tgt FROM hist)
, lr AS (SELECT b,
         CAST(ROUND(log10(((c_tgt + 1)::DOUBLE / (tot.n_tgt + {nb}))
                    / ((c_all + 1)::DOUBLE / (tot.n_all + {nb}))) * 1000000.0)
              AS BIGINT) AS micro
         FROM hist CROSS JOIN tot)
, per AS (SELECT bk.doc_id, sum(lr.micro)::BIGINT AS sm
          FROM bk JOIN lr ON bk.b = lr.b GROUP BY bk.doc_id)
, nt AS (SELECT doc_id, len(tokens)::BIGINT AS n FROM toks)
SELECT nt.doc_id, nt.n AS n_tokens,
       ROUND(coalesce(per.sm, 0) / 1000000.0, 6) AS dsir_score
FROM nt LEFT JOIN per USING (doc_id)"""

    size, stride = CHUNK_SIZE, CHUNK_SIZE - CHUNK_OVERLAP
    sql["chunk_docs"] = f"""WITH ex AS (
  SELECT doc_id, text, n_chars,
         unnest(range(0, CASE WHEN n_chars <= {size} THEN 1
                  ELSE (n_chars - {size} + {stride - 1}) // {stride} + 1 END))
           AS chunk_idx
  FROM documents)
SELECT doc_id, chunk_idx, chunk_idx * {stride} AS start_char,
       least({size}, n_chars - chunk_idx * {stride})::BIGINT AS chunk_len,
       substr(text, chunk_idx * {stride} + 1, {size}) AS chunk_text
FROM ex"""

    # FastSS deletion-neighborhood blocking mirrored exactly: candidate
    # = shared del<=1 variant, verified with exact levenshtein == 1.
    # Vocabulary = documents.text ∪ part.p_name/p_type ∪
    # events.event_type with the shared token filter (the doc vocab
    # alone has no distance-1 pairs — vacuous-oracle guard).
    stop = _stoplist_sql()
    fuzzy_tok = "unnest(regexp_extract_all(lower({c}), '[a-z]+'))"
    sql["fuzzy_pairs"] = f"""WITH sw AS (SELECT unnest({stop}) AS w),
raw_src AS (
  SELECT {fuzzy_tok.format(c='text')} AS t FROM documents
  UNION ALL
  SELECT {fuzzy_tok.format(c='p_name')} FROM part
  UNION ALL
  SELECT {fuzzy_tok.format(c='p_type')} FROM part
  UNION ALL
  SELECT {fuzzy_tok.format(c='event_type')} FROM events
)
, src AS (
  SELECT t FROM raw_src
  WHERE length(t) BETWEEN 2 AND 45 AND t NOT IN (SELECT w FROM sw)
)
, u AS (SELECT DISTINCT t FROM src)
, v AS (SELECT t, unnest(list_prepend(t,
           list_transform(range(1, length(t) + 1),
                          i -> substr(t, 1, i - 1) || substr(t, i + 1, length(t)))))
           AS var
        FROM u)
SELECT DISTINCT a.t AS tok_a, b.t AS tok_b
FROM v a JOIN v b ON a.var = b.var AND a.t < b.t
WHERE levenshtein(a.t, b.t) = 1"""

    profile_selects = []
    for c in PROFILE_COLS:
        profile_selects.append(
            f"""SELECT '{c}' AS col_name, count(*)::BIGINT AS n,
       (count(*) - count({c}))::BIGINT AS n_null,
       count(DISTINCT {c})::BIGINT AS n_distinct,
       coalesce(min({c})::VARCHAR, '') AS min_v,
       coalesce(max({c})::VARCHAR, '') AS max_v
FROM events"""
        )
    sql["profile_events"] = "\nUNION ALL\n".join(profile_selects)

    # mirrors extras/vecquant.int8_quantize expression-for-expression:
    # float32 -> DOUBLE widening (exact), amax = max|x| (no arithmetic),
    # scale = amax/127.0 and q = x/scale single IEEE divisions,
    # half-away-from-zero rounding == DuckDB ROUND
    sql["embed_int8"] = """WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings),
s AS (SELECT vec_id, v,
             coalesce(list_max(list_transform(v, x -> abs(x))), 0.0) AS amax
      FROM e),
ex AS (SELECT vec_id, amax / 127.0 AS scale,
              unnest(v) AS x,
              unnest(range(len(v)))::BIGINT AS i
       FROM s)
SELECT vec_id, i,
       (CASE WHEN scale = 0.0 THEN 0
             ELSE ROUND(x / scale, 0) END)::TINYINT AS code,
       scale
FROM ex"""

    sql["lexical_diversity"] = f"""{toks}
, u AS (SELECT doc_id, unnest(tokens) AS t FROM toks)
, c AS (SELECT doc_id, t, count(*)::BIGINT AS c FROM u GROUP BY doc_id, t)
, agg AS (SELECT doc_id, sum(c)::BIGINT AS n_tokens, count(*)::BIGINT AS n_types,
                 coalesce(sum(CASE WHEN c = 1 THEN 1 END), 0)::BIGINT AS n_hapax
          FROM c GROUP BY doc_id)
SELECT toks.doc_id,
       coalesce(agg.n_tokens, 0) AS n_tokens,
       coalesce(agg.n_types, 0) AS n_types,
       coalesce(agg.n_hapax, 0) AS n_hapax,
       CASE WHEN coalesce(agg.n_tokens, 0) = 0 THEN 0.0
            ELSE ROUND(agg.n_types::DOUBLE / agg.n_tokens, 6) END AS ttr
FROM toks LEFT JOIN agg USING (doc_id)"""

    sql["retention"] = """WITH f AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cw FROM events GROUP BY user_id),
a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS aw FROM events),
cs AS (SELECT cw, count(*)::BIGINT AS n_cohort FROM f GROUP BY cw),
r AS (SELECT f.cw,
             ((epoch_us(a.aw) - epoch_us(f.cw)) // 604800000000)::BIGINT AS k,
             count(*)::BIGINT AS n_active
      FROM a JOIN f USING (user_id) GROUP BY f.cw, k)
SELECT r.cw::TIMESTAMP AS cohort_week, r.k AS week_offset, r.n_active,
       cs.n_cohort, ROUND(r.n_active::DOUBLE / cs.n_cohort, 6) AS retention
FROM r JOIN cs USING (cw)"""

    # mirrors extras/novelty.ngram_novelty: distinct k-shingles per doc
    # (docs under k tokens get none), winner = min doc_id per shingle,
    # novelty = one mirrored IEEE division rounded half-away at 6dp
    k = NGRAM_K
    sql["ngram_novelty"] = f"""{toks}
, sh AS (SELECT doc_id,
         CASE WHEN len(tokens) < {k} THEN []::VARCHAR[]
              ELSE list_distinct(list_transform(range(1, len(tokens) - {k - 2}),
                   i -> array_to_string(list_slice(tokens, i, i + {k - 1}), ' ')))
         END AS shingles
  FROM toks)
, p AS (SELECT doc_id, unnest(shingles) AS s FROM sh)
, w AS (SELECT s, min(doc_id) AS winner FROM p GROUP BY s)
, agg AS (SELECT p.doc_id, count(*)::BIGINT AS n_ngrams,
                 coalesce(sum(CASE WHEN w.winner = p.doc_id THEN 1 END), 0)::BIGINT AS n_novel
          FROM p JOIN w USING (s) GROUP BY p.doc_id)
SELECT sh.doc_id,
       coalesce(agg.n_ngrams, 0) AS n_ngrams,
       coalesce(agg.n_novel, 0) AS n_novel,
       CASE WHEN coalesce(agg.n_ngrams, 0) = 0 THEN 0.0
            ELSE ROUND(agg.n_novel::DOUBLE / agg.n_ngrams, 6) END AS novelty
FROM sh LEFT JOIN agg USING (doc_id)"""

    # mirrors extras/divergence.lang_unigram_kl term-for-term: exact
    # integer counts, p_l / p_g single IEEE divisions, per-term
    # contribution floor-quantized at 1e-6 and summed as an integer
    sql["lang_kl"] = f"""{toks}
, u AS (SELECT lang, unnest(tokens) AS t FROM toks)
, c AS (SELECT lang, t, count(*)::BIGINT AS c FROM u GROUP BY lang, t)
, g AS (SELECT t, sum(c)::BIGINT AS cg FROM c GROUP BY t)
, nl AS (SELECT lang, sum(c)::BIGINT AS nl FROM c GROUP BY lang)
, tot AS (SELECT sum(c)::BIGINT AS n FROM c)
SELECT c.lang, nl.nl AS n_tokens,
       (sum(floor((c.c::DOUBLE / nl.nl)
                  * log2((c.c::DOUBLE / nl.nl) / (g.cg::DOUBLE / tot.n))
                  * 1000000.0)::BIGINT))::DOUBLE / 1000000.0 AS kl_bits
FROM c JOIN g USING (t) JOIN nl USING (lang) CROSS JOIN tot
GROUP BY c.lang, nl.nl"""

    # mirrors extras/markov.event_type_transitions: LEAD over the same
    # (ts, event_id) order, integer counts, one mirrored division
    sql["event_transitions"] = """WITH nx AS (
  SELECT event_type AS prev_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events),
c AS (SELECT prev_type, next_type, count(*)::BIGINT AS n
      FROM nx WHERE next_type IS NOT NULL GROUP BY 1, 2)
SELECT prev_type, next_type, n,
       ROUND(n::DOUBLE / (sum(n) OVER (PARTITION BY prev_type))::DOUBLE, 6) AS p
FROM c"""

    # outlier screen over the mad_value quantile law: med/mad replicated
    # with the same interpolation expression, then two mirrored IEEE ops
    sql["mad_outliers"] = """WITH vals AS (
  SELECT event_type, list_sort(list(value)) AS arr, count(*)::BIGINT AS n
  FROM events GROUP BY event_type),
med AS (
  SELECT event_type, n, arr,
         round(arr[floor(0.5 * (n - 1))::BIGINT + 1]
                 * (1.0 - (0.5 * (n - 1) - floor(0.5 * (n - 1))))
               + arr[ceil(0.5 * (n - 1))::BIGINT + 1]
                 * (0.5 * (n - 1) - floor(0.5 * (n - 1))), 6) AS med
  FROM vals),
dev AS (
  SELECT event_type, n, med,
         list_sort(list_transform(arr, x -> abs(x - med))) AS darr
  FROM med),
m AS (
  SELECT event_type, med,
         round(darr[floor(0.5 * (n - 1))::BIGINT + 1]
                 * (1.0 - (0.5 * (n - 1) - floor(0.5 * (n - 1))))
               + darr[ceil(0.5 * (n - 1))::BIGINT + 1]
                 * (0.5 * (n - 1) - floor(0.5 * (n - 1))), 6) AS mad
  FROM dev)
SELECT e.event_id, e.event_type, e.value
FROM events e JOIN m USING (event_type)
WHERE abs(e.value - m.med) > 3.0 * m.mad"""

    # threshold = quantile_cont's interpolation expression over the
    # sorted token counts, 6dp-rounded before the strict > compare
    sql["quality_filter"] = f"""{toks}
, c AS (SELECT doc_id, len(tokens)::BIGINT AS n_tokens FROM toks)
, arr AS (SELECT list_sort(list(n_tokens)) AS a, count(*)::BIGINT AS n FROM c)
, thr AS (SELECT round(a[floor(0.1 * (n - 1))::BIGINT + 1]
                   * (1.0 - (0.1 * (n - 1) - floor(0.1 * (n - 1))))
                 + a[ceil(0.1 * (n - 1))::BIGINT + 1]
                   * (0.1 * (n - 1) - floor(0.1 * (n - 1))), 6) AS t
          FROM arr)
SELECT c.doc_id, c.n_tokens FROM c CROSS JOIN thr
WHERE c.n_tokens::DOUBLE > thr.t"""

    stop3 = _stoplist_sql()
    # row-form + hash anti-join (see _toks_cte rationale); docs with zero
    # kept tokens still count in n_docs via the separate per-source count
    sql["source_doc_cap"] = f"""SELECT doc_id, source, source_rank FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS source_rank
  FROM documents) t
WHERE source_rank <= {SOURCE_DOC_CAP_K}"""

    sql["source_quality"] = f"""WITH sw AS (SELECT unnest({stop3}) AS w),
r AS (
  SELECT source, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS t
  FROM documents),
tk AS (
  SELECT source, count(*)::BIGINT AS n_tokens FROM r
  WHERE length(t) BETWEEN 2 AND 45 AND t NOT IN (SELECT w FROM sw)
  GROUP BY source),
c AS (
  SELECT d.source, count(*)::BIGINT AS n_docs,
         coalesce(any_value(tk.n_tokens), 0)::BIGINT AS n_tokens
  FROM documents d LEFT JOIN tk ON d.source = tk.source
  GROUP BY d.source),
tot AS (SELECT sum(n_docs)::BIGINT AS t FROM c)
SELECT c.source, c.n_docs, c.n_tokens,
       ROUND(c.n_tokens::DOUBLE / c.n_docs, 6) AS mean_tokens,
       ROUND(c.n_docs::DOUBLE / tot.t, 6) AS doc_share
FROM c CROSS JOIN tot"""

    # integer-µs day truncation, exact distinct counts; value sums follow
    # the events_hourly/running_value precedent (2dp values sum exactly)
    sql["user_features"] = """SELECT user_id,
       count(*)::BIGINT AS n_events,
       count(DISTINCT date_trunc('day', ts))::BIGINT AS n_active_days,
       count(DISTINCT event_type)::BIGINT AS n_types,
       round(sum(round(value * 100)) / 100, 6) AS value_sum,
       round((sum(round(value * 100)) / 100) / count(*), 6) AS value_mean,
       min(ts) AS first_ts, max(ts) AS last_ts
FROM events GROUP BY user_id"""

    sql["degree_stats"] = """WITH e AS (
  SELECT DISTINCT 2 * l_orderkey AS s, 2 * l_partkey + 1 AS t FROM lineitem),
outd AS (SELECT s AS node_id, count(*)::BIGINT AS out_deg FROM e GROUP BY s),
ind AS (SELECT t AS node_id, count(*)::BIGINT AS in_deg FROM e GROUP BY t)
SELECT node_id, coalesce(out_deg, 0)::BIGINT AS out_deg,
       coalesce(in_deg, 0)::BIGINT AS in_deg
FROM outd FULL OUTER JOIN ind USING (node_id)"""

    # per-lang interpolated threshold, same quantile_cont expression as
    # quality_filter but PARTITIONED; strict > on the rounded threshold
    sql["lang_quality_gate"] = f"""{toks}
, c AS (SELECT doc_id, lang, len(tokens)::BIGINT AS n_tokens FROM toks)
, arr AS (SELECT lang, list_sort(list(n_tokens)) AS a, count(*)::BIGINT AS n
          FROM c GROUP BY lang)
, thr AS (SELECT lang,
                 round(a[floor(0.1 * (n - 1))::BIGINT + 1]
                     * (1.0 - (0.1 * (n - 1) - floor(0.1 * (n - 1))))
                   + a[ceil(0.1 * (n - 1))::BIGINT + 1]
                     * (0.1 * (n - 1) - floor(0.1 * (n - 1))), 6) AS t
          FROM arr)
SELECT c.doc_id, c.lang, c.n_tokens
FROM c JOIN thr USING (lang)
WHERE c.n_tokens::DOUBLE > thr.t"""

    sql["conversion_lag"] = f"""WITH f AS (
  SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id),
c AS (SELECT user_id, min(ts) AS convert_ts FROM events
      WHERE event_type = '{CONVERT_TYPE}' GROUP BY user_id)
SELECT f.user_id, f.first_ts, c.convert_ts,
       (epoch_us(c.convert_ts) - epoch_us(f.first_ts))::BIGINT AS lag_us
FROM f JOIN c USING (user_id)"""

    sql["basket_sizes"] = """WITH di AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS i FROM lineitem),
sz AS (SELECT o, count(*)::BIGINT AS n_items FROM di GROUP BY o)
SELECT n_items, count(*)::BIGINT AS n_orders FROM sz GROUP BY n_items"""

    # first-active-day attribution; cumulative via window sum over the
    # O(days) histogram — all integer counts
    sql["cumulative_users"] = """WITH f AS (
  SELECT user_id, min(date_trunc('day', ts)) AS day FROM events
  GROUP BY user_id),
h AS (SELECT day, count(*)::BIGINT AS n_new FROM f GROUP BY day)
SELECT day::TIMESTAMP AS day, n_new,
       (sum(n_new) OVER (ORDER BY day))::BIGINT AS n_cumulative
FROM h"""

    # distinct (order, item), pair support via self-join, lift as ONE
    # mirrored division of exact integer products
    sql["copurchase"] = """WITH di AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS i FROM lineitem),
n AS (SELECT count(DISTINCT o)::BIGINT AS n_total FROM di),
m AS (SELECT i, count(*)::BIGINT AS n_i FROM di GROUP BY i),
pr AS (SELECT a.i AS item_a, b.i AS item_b, count(*)::BIGINT AS n_ab
       FROM di a JOIN di b ON a.o = b.o AND a.i < b.i
       GROUP BY 1, 2
       HAVING count(*) >= 2)
SELECT pr.item_a, pr.item_b, pr.n_ab, ma.n_i AS n_a, mb.n_i AS n_b,
       ROUND((pr.n_ab * n.n_total)::DOUBLE / (ma.n_i * mb.n_i), 6) AS lift
FROM pr JOIN m ma ON ma.i = pr.item_a
        JOIN m mb ON mb.i = pr.item_b
        CROSS JOIN n"""

    # iterated peel via recursive CTE: each iteration's working table is
    # the surviving edge set; both endpoint-degree subqueries evaluate
    # against it, so removal is simultaneous — the kernel's semantics.
    # Rows carry an iteration counter; the fixpoint propagates unchanged
    # to it = MAX_ROUNDS, which the final select picks (an empty core
    # ends the recursion early and yields zero rows).
    sql["kcore"] = f"""WITH RECURSIVE di AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS i FROM lineitem),
e AS (SELECT a.i AS a, b.i AS b FROM di a JOIN di b ON a.o = b.o AND a.i < b.i
      GROUP BY 1, 2 HAVING count(*) >= {KCORE_MIN_SUPPORT}),
peel(a, b, it) AS (
  SELECT a, b, 0 FROM e
  UNION ALL
  SELECT p.a, p.b, p.it + 1 FROM peel p
  WHERE p.it < {KCORE_SQL_MAX_ROUNDS}
    AND p.a IN (SELECT n FROM (SELECT a AS n FROM peel
                               UNION ALL SELECT b FROM peel) q
                GROUP BY n HAVING count(*) >= {KCORE_K})
    AND p.b IN (SELECT n FROM (SELECT a AS n FROM peel
                               UNION ALL SELECT b FROM peel) q2
                GROUP BY n HAVING count(*) >= {KCORE_K})
),
core AS (SELECT a, b FROM peel WHERE it = {KCORE_SQL_MAX_ROUNDS})
SELECT n AS node, count(*)::BIGINT AS deg
FROM (SELECT a AS n FROM core UNION ALL SELECT b FROM core) u
GROUP BY n"""

    # synchronous LPA unrolled: each round is one grouped count of
    # (node, neighbor-label) pairs over the symmetrized edges, mode
    # picked by row_number ordered (count DESC, label ASC) — the
    # kernel's exact tie-break; every node has >= 1 neighbor so all
    # update each round
    lpa_head = f"""WITH di AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS i FROM lineitem),
e AS (SELECT a.i AS a, b.i AS b FROM di a JOIN di b ON a.o = b.o AND a.i < b.i
      GROUP BY 1, 2 HAVING count(*) >= {KCORE_MIN_SUPPORT}),
sym AS MATERIALIZED (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
l0 AS MATERIALIZED (SELECT DISTINCT u AS node, u AS label FROM sym)"""
    lpa_parts = [lpa_head]
    for i in range(1, LPA_FIXED_ITERS + 1):
        lpa_parts.append(
            f""",
l{i} AS MATERIALIZED (
  SELECT node, label FROM (
    SELECT node, label,
           row_number() OVER (PARTITION BY node
                              ORDER BY c DESC, label) AS rn
    FROM (SELECT s.v AS node, l.label, count(*)::BIGINT AS c
          FROM sym s JOIN l{i - 1} l ON l.node = s.u GROUP BY 1, 2))
  WHERE rn = 1)"""
        )
    lpa_parts.append(f"\nSELECT node, label FROM l{LPA_FIXED_ITERS}")
    sql["lpa_communities"] = "".join(lpa_parts)

    # breadth-first walk as a recursive CTE over the symmetrized edge
    # set; UNION dedups (node, dist) pairs so each is expanded once,
    # min(dist) at the end collapses longer walks — BFS hop distances
    sql["bfs_hops"] = f"""WITH RECURSIVE di AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS i FROM lineitem),
e AS (SELECT a.i AS a, b.i AS b FROM di a JOIN di b ON a.o = b.o AND a.i < b.i
      GROUP BY 1, 2 HAVING count(*) >= {KCORE_MIN_SUPPORT}),
sym AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
walk(node, dist) AS (
  SELECT (SELECT min(a) FROM e), 0
  UNION
  SELECT s.v, w.dist + 1 FROM walk w JOIN sym s ON s.u = w.node
  WHERE w.dist < {BFS_MAX_DIST_SQL}
)
SELECT node, min(dist)::BIGINT AS dist FROM walk GROUP BY node"""

    sql["fk_orphans"] = """
SELECT 'lineitem->part' AS relation, count(*)::BIGINT AS n_rows,
       (count(*) FILTER (p.p_partkey IS NULL))::BIGINT AS n_orphans
FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
UNION ALL
SELECT 'lineitem->supplier', count(*)::BIGINT,
       (count(*) FILTER (s.s_suppkey IS NULL))::BIGINT
FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
UNION ALL
SELECT 'lineitem->orders', count(*)::BIGINT,
       (count(*) FILTER (o.o_orderkey IS NULL))::BIGINT
FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
UNION ALL
SELECT 'orders->customer', count(*)::BIGINT,
       (count(*) FILTER (c.c_custkey IS NULL))::BIGINT
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey"""

    sql["expfit_ks_gaps"] = """WITH ord AS (
  SELECT user_id, epoch_us(ts) AS t, event_id FROM events),
gp AS (SELECT t - lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS g
       FROM ord),
gg AS (SELECT g, count(*)::BIGINT AS n FROM gp WHERE g IS NOT NULL GROUP BY g),
t1 AS (SELECT sum(n)::BIGINT AS n, sum(g * n)::BIGINT AS total FROM gg),
w AS (SELECT g, n AS cnt, sum(n) OVER (ORDER BY g) AS ca FROM gg)
SELECT t1.n,
       round((t1.n / CAST(t1.total AS DOUBLE)) * 3600.0 * 1e6, 6)
         AS lambda_per_hour,
       round((SELECT max(GREATEST(
                ca / CAST(t1.n AS DOUBLE)
                  - (1.0 - exp(-(t1.n / CAST(t1.total AS DOUBLE)) * g)),
                (1.0 - exp(-(t1.n / CAST(t1.total AS DOUBLE)) * g))
                  - (ca - cnt) / CAST(t1.n AS DOUBLE)))
              FROM w), 6) AS d_stat
FROM t1"""

    sql["ks_two_sample"] = """WITH e AS (
  SELECT CAST(round(value*100, 0) AS BIGINT) AS c,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS isp
  FROM events WHERE event_type IN ('purchase', 'view')),
g AS (SELECT c, sum(isp)::BIGINT AS na, sum(1 - isp)::BIGINT AS nb
      FROM e GROUP BY c),
w AS (SELECT sum(na) OVER (ORDER BY c) AS ca,
             sum(nb) OVER (ORDER BY c) AS cb
      FROM g),
t AS (SELECT (SELECT sum(na)::BIGINT FROM g) AS n1,
             (SELECT sum(nb)::BIGINT FROM g) AS n2)
SELECT n1, n2,
       round((SELECT max(abs(ca / CAST(n1 AS DOUBLE)
                             - cb / CAST(n2 AS DOUBLE))) FROM w), 6) AS d_stat
FROM t"""

    sql["mannwhitney_value"] = """WITH e AS (
  SELECT CAST(round(value*100, 0) AS BIGINT) AS c,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS isp
  FROM events WHERE event_type IN ('purchase', 'view')),
g AS (SELECT c, sum(isp)::BIGINT AS na, sum(1 - isp)::BIGINT AS nb
      FROM e GROUP BY c),
w AS (SELECT c, na, nb, na + nb AS cnt,
             coalesce(sum(na + nb) OVER (ORDER BY c
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
      FROM g),
t AS (SELECT sum(na)::BIGINT AS n1, sum(nb)::BIGINT AS n2,
             sum(na * (2*cumb + cnt + 1))::BIGINT AS r1x2,
             sum(cnt*cnt*cnt - cnt)::BIGINT AS tie
      FROM w)
SELECT n1, n2,
       round((r1x2 - n1*(n1 + 1)) / 2.0, 6) AS u1,
       round(((r1x2 - n1*(n1 + 1)) / 2.0 - n1*n2 / 2.0)
             / sqrt((n1*n2 / 12.0)
                    * ((n1 + n2 + 1)
                       - tie / ((n1 + n2) * (n1 + n2 - 1.0)))), 6) AS z
FROM t"""

    sql["quota_sample"] = f"""SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5_number_upper(doc_id::VARCHAR)
         ) AS rn
  FROM documents) z
WHERE rn <= {QUOTA_PER_LANG}"""

    sql["asof_nearest_view"] = """WITH v AS (
  SELECT user_id, epoch_us(ts) AS t, event_id FROM events
  WHERE event_type = 'view'),
p AS (
  SELECT user_id, epoch_us(ts) AS t, event_id FROM events
  WHERE event_type = 'purchase'),
cand AS (
  SELECT p.event_id, v.event_id AS view_id, v.t - p.t AS dt_us,
         row_number() OVER (
           PARTITION BY p.event_id
           ORDER BY abs(v.t - p.t),
                    CASE WHEN v.t - p.t > 0 THEN 1 ELSE 0 END,
                    v.event_id
         ) AS rn
  FROM p JOIN v USING (user_id))
SELECT event_id, view_id, dt_us FROM cand WHERE rn = 1"""

    sql["embed_cov16"] = f"""WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings),
s AS (SELECT vec_id, v,
             coalesce(list_max(list_transform(v, x -> abs(x))), 0.0) AS amax
      FROM e),
ex AS (SELECT vec_id, amax / 127.0 AS scale,
              unnest(v) AS x,
              unnest(range(len(v)))::BIGINT AS i
       FROM s),
c AS (SELECT vec_id, i,
             (CASE WHEN scale = 0.0 THEN 0
                   ELSE ROUND(x / scale, 0) END)::BIGINT AS q
      FROM ex WHERE i < {COV_DIMS})
SELECT a.i AS di, b.i AS dj,
       round((sum(a.q * b.q)::DOUBLE
              - (sum(a.q) * sum(b.q))::DOUBLE / count(*))
             / count(*), 6) AS cov
FROM c a JOIN c b ON a.vec_id = b.vec_id AND a.i <= b.i
GROUP BY a.i, b.i"""

    sql["purged_cv_folds"] = f"""WITH b AS (
  SELECT epoch_us(min(ts)) AS lo, epoch_us(max(ts)) AS hi FROM events),
s AS (SELECT lo, hi - lo + 1 AS span FROM b),
f AS (SELECT range AS fold FROM range({CV_FOLDS}))
SELECT e.event_id, f.fold,
       CASE WHEN epoch_us(e.ts) >= s.lo + f.fold * s.span // {CV_FOLDS}
                 AND epoch_us(e.ts) < s.lo + (f.fold + 1) * s.span // {CV_FOLDS}
            THEN 'test'
            WHEN epoch_us(e.ts) >= s.lo + (f.fold + 1) * s.span // {CV_FOLDS}
                 AND epoch_us(e.ts) < s.lo + (f.fold + 1) * s.span // {CV_FOLDS}
                     + s.span * {CV_EMBARGO_PCT} // 100
            THEN 'purged'
            ELSE 'train' END AS role
FROM events e, s CROSS JOIN f"""

    sql["seq3_patterns"] = """WITH t AS (
  SELECT event_type AS t1,
         lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t2,
         lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t3
  FROM events)
SELECT t1, t2, t3, count(*)::BIGINT AS support
FROM t WHERE t3 IS NOT NULL GROUP BY 1, 2, 3"""

    sql["sssp"] = f"""WITH RECURSIVE di AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS i FROM lineitem),
e AS (SELECT a.i AS a, b.i AS b, (1 + 8 // count(*))::BIGINT AS w
      FROM di a JOIN di b ON a.o = b.o AND a.i < b.i
      GROUP BY 1, 2 HAVING count(*) >= {KCORE_MIN_SUPPORT}),
sym AS (SELECT a AS u, b AS v, w FROM e UNION ALL SELECT b, a, w FROM e),
walk(node, dist) AS (
  SELECT (SELECT min(a) FROM e), 0
  UNION
  SELECT s.v, w2.dist + s.w FROM walk w2 JOIN sym s ON s.u = w2.node
  WHERE w2.dist + s.w <= {SSSP_MAX_COST}
)
SELECT node, min(dist)::BIGINT AS dist FROM walk GROUP BY node"""

    # the same md5 content hashes and modular drop/edit rules as
    # q_corpus_diff; FULL OUTER JOIN is the classification mirror
    sql["corpus_diff"] = f"""WITH old AS (
  SELECT doc_id, md5(text) AS h FROM documents
  WHERE doc_id % {DIFF_OLD_MOD} <> 0),
nw AS (
  SELECT doc_id,
         CASE WHEN doc_id % {DIFF_EDIT_MOD} = 0 THEN md5(text || '.v2')
              ELSE md5(text) END AS h
  FROM documents WHERE doc_id % {DIFF_NEW_MOD} <> 0)
SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            WHEN o.h <> n.h THEN 'changed'
            ELSE 'unchanged' END AS status
FROM old o FULL OUTER JOIN nw n ON o.doc_id = n.doc_id"""

    # exact-integer tf dots and squared norms over the df-capped term
    # space; the cosine expression (BIGINT product -> DOUBLE -> sqrt ->
    # divide) is mirrored op-for-op by extras/apss.py finish()
    def _cosine_pairs_sql(threshold: float) -> str:
        return f"""{toks},
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
       FROM (SELECT doc_id, unnest(tokens) AS term FROM toks) GROUP BY 1, 2),
kept AS (SELECT term FROM tf GROUP BY term
         HAVING count(*) <= {APSS_MAX_DF_FRAC} * (SELECT count(*) FROM documents)),
ftf AS (SELECT tf.* FROM tf JOIN kept USING (term)),
nrm AS (SELECT doc_id, sum(tf * tf)::BIGINT AS norm2 FROM ftf GROUP BY doc_id),
dt AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              sum(a.tf * b.tf)::BIGINT AS dot
       FROM ftf a JOIN ftf b ON a.term = b.term AND a.doc_id < b.doc_id
       GROUP BY 1, 2)
SELECT doc_a, doc_b, dot, na.norm2 AS norm2_a, nb.norm2 AS norm2_b,
       round(dot::DOUBLE / sqrt((na.norm2 * nb.norm2)::DOUBLE), 6) AS cosine
FROM dt JOIN nrm na ON na.doc_id = dt.doc_a
        JOIN nrm nb ON nb.doc_id = dt.doc_b
WHERE dot::DOUBLE / sqrt((na.norm2 * nb.norm2)::DOUBLE) >= {threshold}"""

    sql["cosine_pairs"] = _cosine_pairs_sql(APSS_THRESHOLD)

    sql["knn_graph"] = f"""WITH pr AS ({_cosine_pairs_sql(KNN_EPS)}),
sym AS (SELECT doc_a AS src, doc_b AS dst, cosine FROM pr
        UNION ALL SELECT doc_b, doc_a, cosine FROM pr),
rk AS (SELECT src, dst, cosine,
              row_number() OVER (PARTITION BY src
                                 ORDER BY cosine DESC, dst) AS rank
       FROM sym)
SELECT src, dst, rank::BIGINT AS rank, cosine FROM rk WHERE rank <= {KNN_K}"""

    # canonical co-purchase edges (a < b); triangles counted once each
    # as x < y < z wedges probed against the edge set — the SQL mirror
    # of the compact-forward enumeration
    sql["triangles"] = """WITH di AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS i FROM lineitem),
e AS (SELECT DISTINCT a.i AS a, b.i AS b
      FROM di a JOIN di b ON a.o = b.o AND a.i < b.i)
SELECT (SELECT count(*) FROM e)::BIGINT AS n_edges,
       (SELECT count(*) FROM e e1
          JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
          JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b)::BIGINT AS n_triangles"""

    # integer days x, integer cents y: all five sufficient statistics
    # are exact integers (HUGEINT sums == Python ints); the final
    # slope/intercept expression is mirrored op-for-op, CASE-guarded on
    # zero x-variance
    sql["value_trend"] = """WITH q AS (
  SELECT event_type,
         (epoch_us(ts) // 86400000000)::BIGINT AS x,
         round(value * 100)::BIGINT AS y
  FROM events),
s AS (SELECT event_type, count(*)::BIGINT AS n,
             sum(x)::HUGEINT AS sx, sum(y)::HUGEINT AS sy,
             sum(x * y)::HUGEINT AS sxy, sum(x * x)::HUGEINT AS sxx
      FROM q GROUP BY event_type),
f AS (SELECT event_type, n,
             n::DOUBLE AS nf, sx::DOUBLE AS sxf, sy::DOUBLE AS syf,
             sxy::DOUBLE AS sxyf, sxx::DOUBLE AS sxxf
      FROM s),
g AS (SELECT event_type, n, nf, sxf, syf,
             nf * sxxf - sxf * sxf AS den,
             (nf * sxyf - sxf * syf) AS num
      FROM f)
SELECT event_type, n,
       CASE WHEN den > 0.0 THEN round((num / den) / 100.0, 6)
            ELSE 0.0 END AS slope,
       CASE WHEN den > 0.0
            THEN round(((syf - (num / den) * sxf) / nf) / 100.0, 6)
            ELSE 0.0 END AS intercept
FROM g"""

    # same LEAD counts as event_transitions; each term −p·log2(p)
    # floor-quantized at 1e-6 and summed as an exact integer
    sql["transition_entropy"] = """WITH nx AS (
  SELECT event_type AS prev_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events),
c AS (SELECT prev_type, next_type, count(*)::BIGINT AS n
      FROM nx WHERE next_type IS NOT NULL GROUP BY 1, 2),
t AS (SELECT prev_type, sum(n)::BIGINT AS tot FROM c GROUP BY prev_type)
SELECT c.prev_type, t.tot AS n_total,
       (sum(floor((-(c.n::DOUBLE / t.tot) * log2(c.n::DOUBLE / t.tot))
                  * 1000000.0)::BIGINT))::DOUBLE / 1000000.0 AS entropy
FROM c JOIN t USING (prev_type)
GROUP BY c.prev_type, t.tot"""

    # distinct (source, shingle) sets, inner-join pairs (zero-overlap
    # pairs omitted on BOTH sides), one mirrored jaccard division
    sql["source_overlap"] = f"""{toks}
, dt AS (
  SELECT d.source, t.tokens FROM toks t JOIN documents d USING (doc_id)),
sh AS (SELECT source,
       CASE WHEN len(tokens) < {NGRAM_K} THEN []::VARCHAR[]
            ELSE list_distinct(list_transform(range(1, len(tokens) - {NGRAM_K - 2}),
                 i -> array_to_string(list_slice(tokens, i, i + {NGRAM_K - 1}), ' ')))
       END AS shingles
  FROM dt),
p AS (SELECT DISTINCT source, s
      FROM (SELECT source, unnest(shingles) AS s FROM sh)),
tot AS (SELECT source, count(*)::BIGINT AS n FROM p GROUP BY source),
pr AS (SELECT a.source AS src_a, b.source AS src_b, count(*)::BIGINT AS n_shared
       FROM p a JOIN p b ON a.s = b.s AND a.source < b.source
       GROUP BY 1, 2)
SELECT pr.src_a, pr.src_b, pr.n_shared, ta.n AS n_a, tb.n AS n_b,
       ROUND(pr.n_shared::DOUBLE / (ta.n + tb.n - pr.n_shared), 6) AS jaccard
FROM pr JOIN tot ta ON ta.source = pr.src_a
        JOIN tot tb ON tb.source = pr.src_b"""

    # TPC-H Q3 analog; ORDER BY the exact 1e-4-dollar integer revenue so
    # the top-10 cut is deterministic (priority_revenue quantization law)
    sql["top_unshipped_orders"] = f"""SELECT o_orderkey, o_orderdate,
       round(sum(round(l_extendedprice * 100) * (100 - round(l_discount * 100)))
             / 10000, 6) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = '{Q3_SEGMENT}'
  AND o_orderdate < TIMESTAMP '{Q3_CUTOFF}'
  AND l_shipdate > TIMESTAMP '{Q3_CUTOFF}'
GROUP BY o_orderkey, o_orderdate
ORDER BY sum(round(l_extendedprice * 100) * (100 - round(l_discount * 100))) DESC,
         o_orderdate, o_orderkey
LIMIT 10"""

    # md5-parity halves (hash_split law), label_centroids quantization,
    # per-dim products floor-quantized into integer sums, one mirrored
    # cosine expression
    sql["embedding_drift"] = f"""WITH sp AS (
  SELECT (md5_number_upper(vec_id::VARCHAR) % 2)::BIGINT AS split, embedding
  FROM embeddings),
c AS (SELECT split, i AS dim, count(*)::BIGINT AS n,
             round(sum(floor(embedding[i + 1]::DOUBLE * {CENTROID_SCALE}))
                   / {CENTROID_SCALE}.0 / count(*), 6) AS v
      FROM sp, range(0, {EMB_DIM}) t(i)
      GROUP BY split, i),
p AS (SELECT a.v AS av, b.v AS bv, a.n AS na, b.n AS nb
      FROM c a JOIN c b ON a.dim = b.dim AND a.split = 0 AND b.split = 1),
s AS (SELECT any_value(na)::BIGINT AS n_a, any_value(nb)::BIGINT AS n_b,
             sum(floor(av * bv * 1000000.0))::BIGINT AS dq,
             sum(floor(av * av * 1000000.0))::BIGINT AS naq,
             sum(floor(bv * bv * 1000000.0))::BIGINT AS nbq
      FROM p)
SELECT n_a, n_b,
       round((dq::DOUBLE / 1000000.0)
             / (sqrt(naq::DOUBLE / 1000000.0) * sqrt(nbq::DOUBLE / 1000000.0)),
             6) AS cosine
FROM s"""

    # unordered positional pairs; least/greatest on ASCII-only tokens ==
    # Python byte-order min/max
    sql["skipgram_counts"] = f"""{toks}
, pos AS (SELECT doc_id, unnest(tokens) AS t,
                 unnest(range(len(tokens))) AS p
          FROM toks)
SELECT least(a.t, b.t) AS tok_a, greatest(a.t, b.t) AS tok_b,
       count(*)::BIGINT AS n
FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.p > a.p AND b.p <= a.p + 2
GROUP BY 1, 2"""

    sql["top_terms_per_lang"] = f"""{toks}
, u AS (SELECT lang, unnest(tokens) AS t FROM toks)
, c AS (SELECT lang, t, count(*)::BIGINT AS c FROM u GROUP BY lang, t)
SELECT lang, t AS token, c, rn FROM (
  SELECT lang, t, c,
         row_number() OVER (PARTITION BY lang ORDER BY c DESC, t ASC) AS rn
  FROM c
) WHERE rn <= 10"""

    # mirrors extras/zipf.zipf_fit term-for-term: rank 1-based by
    # (count DESC, token ASC) — though the quantized terms depend only on
    # (rank, count), so the tie order cannot matter — ln/floor-1e6
    # integer sums, then the OLS expression on the de-quantized sums
    sql["zipf_fit"] = f"""{toks}
, u AS (SELECT unnest(tokens) AS t FROM toks)
, c AS (SELECT t, count(*)::BIGINT AS c FROM u GROUP BY t)
, r AS (SELECT c, row_number() OVER (ORDER BY c DESC, t ASC) AS rank FROM c)
, q AS (SELECT floor(ln(rank) * 1000000.0)::BIGINT AS qx,
               floor(ln(c) * 1000000.0)::BIGINT AS qy,
               floor(ln(rank) * ln(c) * 1000000.0)::BIGINT AS qxy,
               floor(ln(rank) * ln(rank) * 1000000.0)::BIGINT AS qxx
        FROM r)
, s AS (SELECT count(*)::BIGINT AS v,
               (sum(qx)::BIGINT)::DOUBLE / 1000000.0 AS sx,
               (sum(qy)::BIGINT)::DOUBLE / 1000000.0 AS sy,
               (sum(qxy)::BIGINT)::DOUBLE / 1000000.0 AS sxy,
               (sum(qxx)::BIGINT)::DOUBLE / 1000000.0 AS sxx
        FROM q)
, f AS (SELECT v, sx, sy,
               (v::DOUBLE * sxy - sx * sy) / (v::DOUBLE * sxx - sx * sx)
                   AS slope_raw
        FROM s)
SELECT v AS n_terms, round(slope_raw, 6) AS slope,
       round((sy - slope_raw * sx) / v::DOUBLE, 6) AS intercept
FROM f"""

    # RRF over the two search oracles' own SQL; ranks re-derived from the
    # ROUNDED scores with doc_id tiebreak on BOTH sides (deterministic),
    # contributions added tfidf-first (fixed FP order)
    sql["rrf_fusion"] = f"""WITH t1 AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
  FROM ({sql["search_tfidf_topk"]}) x),
t2 AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
  FROM ({sql["search_bm25_topk"]}) y),
u AS (SELECT doc_id FROM t1 UNION SELECT doc_id FROM t2)
SELECT u.doc_id,
       coalesce(t1.r, 0)::BIGINT AS rank_tfidf,
       coalesce(t2.r, 0)::BIGINT AS rank_bm25,
       round((CASE WHEN t1.r IS NULL THEN 0.0 ELSE 1.0 / (60.0 + t1.r) END)
           + (CASE WHEN t2.r IS NULL THEN 0.0 ELSE 1.0 / (60.0 + t2.r) END),
             6) AS rrf
FROM u LEFT JOIN t1 USING (doc_id) LEFT JOIN t2 USING (doc_id)"""

    # grouped_zscore law at scale 1 (counts are already integers); the
    # strict > runs on the 6dp-ROUNDED z so the keep set cannot flip
    sql["hourly_burst"] = """WITH h AS (
  SELECT date_trunc('hour', ts) AS window, event_type, count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2),
s AS (SELECT event_type, count(*)::DOUBLE AS cnt,
             sum(n)::DOUBLE AS s, sum(n * n)::DOUBLE AS ss
      FROM h GROUP BY event_type)
SELECT h.window, h.event_type,
       round((h.n - s.s / s.cnt)
             / sqrt(s.ss / s.cnt - (s.s / s.cnt) * (s.s / s.cnt)), 6) AS z
FROM h JOIN s USING (event_type)
WHERE s.ss / s.cnt - (s.s / s.cnt) * (s.s / s.cnt) > 0
  AND round((h.n - s.s / s.cnt)
            / sqrt(s.ss / s.cnt - (s.s / s.cnt) * (s.s / s.cnt)), 6) > 2.0"""

    # banded simhash pairs over the simhash entry's own fingerprint SQL:
    # identical 16-bit banding, xor+popcount verify — bit-equal by
    # construction, recall exact by pigeonhole (3 flips < 4 bands)
    sql["simhash_pairs"] = f"""WITH s AS (SELECT * FROM ({sql["simhash"]}) z),
f AS (SELECT doc_id,
             CASE WHEN simhash < 0
                  THEN (simhash::HUGEINT + 18446744073709551616::HUGEINT)::UBIGINT
                  ELSE simhash::UBIGINT END AS u
      FROM s),
b AS (SELECT doc_id, u, j, ((u >> (16 * j)) & 65535::UBIGINT) AS bv
      FROM f CROSS JOIN range(0, 4) g(j)),
cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b, x.u AS ua, y.u AS ub
         FROM b x JOIN b y ON x.j = y.j AND x.bv = y.bv AND x.doc_id < y.doc_id)
SELECT a, b, bit_count(xor(ua, ub))::BIGINT AS hamming
FROM cand WHERE bit_count(xor(ua, ub)) <= 3"""

    # winner-per-cluster over the EXACT minhash cluster replication
    # (subquery reuse of _minhash_clusters_sql); token law == toks CTE
    sql["cluster_winners"] = f"""WITH cl AS (SELECT * FROM ({_minhash_clusters_sql()}) z),
cnt AS (
  SELECT doc_id, len(tokens)::BIGINT AS n_tokens
  FROM ({toks} SELECT doc_id, tokens FROM toks) z2),
sel AS (SELECT cl.cluster_id, cl.doc_id, cnt.n_tokens,
               row_number() OVER (PARTITION BY cl.cluster_id
                                  ORDER BY cnt.n_tokens DESC, cl.doc_id ASC) AS rn,
               count(*) OVER (PARTITION BY cl.cluster_id)::BIGINT AS n_docs
        FROM cl JOIN cnt USING (doc_id))
SELECT cluster_id, doc_id AS winner_doc_id, n_tokens AS winner_tokens, n_docs
FROM sel WHERE rn = 1"""

    # trailing-32 EWMA, alpha = 1/2: the closed form with exact dyadic
    # coefficients — every term and partial sum is exactly representable
    # (17-bit cents x 2^-k, k <= 31), so ANY summation order equals the
    # Ray scan bit-for-bit; /100.0 is the same single rounding both sides
    sql["ewma_user_value"] = """WITH ord AS (
  SELECT user_id,
         CAST(round(value*100, 0) AS BIGINT) AS vc,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events),
win AS (
  SELECT user_id, vc,
         rn - (n - LEAST(n, 32)) AS r,
         LEAST(n, 32) AS m
  FROM ord WHERE rn > n - 32)
SELECT user_id,
       (SUM(vc / CAST(1::BIGINT << (CASE WHEN r = 1 THEN m - 1
                                         ELSE m - r + 1 END) AS DOUBLE))
        / 100.0) AS ewma_value
FROM win GROUP BY user_id"""

    sql["scd2_intervals"] = """WITH ord AS (
  SELECT user_id,
         CAST(round(value*100, 0) AS BIGINT) AS vc,
         epoch_us(ts) AS tus, event_id
  FROM events),
w AS (
  SELECT *, lag(vc) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS pv
  FROM ord),
ch AS (SELECT * FROM w WHERE pv IS NULL OR vc != pv)
SELECT user_id, vc AS v_cents, tus AS valid_from_us,
       coalesce(lead(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id),
                9223372036854775807) AS valid_to_us
FROM ch"""

    bands_vals = ", ".join(f"({b}, {lo}, {hi})" for b, lo, hi in VALUE_BANDS)
    sql["interval_band_join"] = f"""WITH b(band_id, lo, hi) AS (VALUES {bands_vals}),
e AS (SELECT event_type, CAST(round(value*100, 0) AS BIGINT) AS cents
      FROM events)
SELECT b.band_id::BIGINT AS band_id, e.event_type, count(*)::BIGINT AS n,
       (sum(e.cents) / 100.0) AS sum_value
FROM e JOIN b ON e.cents >= b.lo*100 AND e.cents < b.hi*100
GROUP BY b.band_id, e.event_type"""

    from .extras.bootstrap import cdf_sql_weight_expr

    wt_expr = cdf_sql_weight_expr("uu")
    sql["poisson_bootstrap"] = f"""WITH rs AS (SELECT range AS r FROM range({BOOTSTRAP_R})),
base AS (
  SELECT l_orderkey*8 + l_linenumber AS rid,
         CAST(round(l_extendedprice*(1 - l_discount)*10000, 0) AS BIGINT) AS x
  FROM lineitem),
u AS (
  SELECT r, x,
         (CASE WHEN r % 2 = 0
               THEN md5_number_upper(rid::VARCHAR || ':' || (r // 2)::VARCHAR) % 4294967296
               ELSE md5_number_upper(rid::VARCHAR || ':' || (r // 2)::VARCHAR) // 4294967296
          END) / 4294967296.0 AS uu
  FROM base CROSS JOIN rs),
w AS (SELECT r, x, {wt_expr} AS wt FROM u)
SELECT r, (SUM(wt*x) / 10000.0) / SUM(wt) AS mean_value
FROM w GROUP BY r"""

    sql["churn_training_table"] = f"""WITH b AS (
  SELECT epoch_us(min(ts)) AS lo, epoch_us(max(ts)) AS hi FROM events),
c AS (SELECT lo + (hi - lo) * {CHURN_CUTOFF_PCT} // 100 AS cutoff FROM b),
e AS (SELECT user_id, epoch_us(ts) AS t, event_type,
             CAST(round(value*100, 0) AS BIGINT) AS cents
      FROM events),
f AS (SELECT user_id, c.cutoff,
             count(*) FILTER (t <= c.cutoff)::BIGINT AS n_events,
             count(*) FILTER (t <= c.cutoff AND event_type = 'purchase')::BIGINT
               AS n_purchases,
             coalesce(sum(cents) FILTER (t <= c.cutoff), 0)::BIGINT AS sc,
             max(t) FILTER (t <= c.cutoff) AS last_t,
             max(CASE WHEN t > c.cutoff THEN 1 ELSE 0 END)::BIGINT AS after
      FROM e, c GROUP BY user_id, c.cutoff)
SELECT user_id, n_events, n_purchases, (sc / 100.0) AS sum_value,
       (cutoff - last_t) AS recency_us, (1 - after) AS churned
FROM f WHERE n_events > 0"""

    sql["calibration_bins"] = f"""WITH e AS (
  SELECT GREATEST(LEAST(CAST(round(value*100, 0) AS BIGINT),
                        {CALIB_SCALE_CENTS}), 0) AS cents,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events),
b AS (SELECT LEAST(cents * {CALIB_BINS} // {CALIB_SCALE_CENTS},
                   {CALIB_BINS - 1}) AS bin, cents, y FROM e)
SELECT bin, count(*)::BIGINT AS n,
       round((sum(cents) / {CALIB_SCALE_CENTS}.0) / count(*), 6) AS mean_pred,
       round(sum(y) / count(*)::DOUBLE, 6) AS rate
FROM b GROUP BY bin"""

    sql["hashed_features"] = f"""{toks}
SELECT doc_id, (md5_number_upper(t) % {HASH_DIMS})::BIGINT AS dim,
       count(*)::BIGINT AS n
FROM (SELECT doc_id, unnest(tokens) AS t FROM toks) z
GROUP BY doc_id, dim"""

    sql["psi_value_drift"] = f"""WITH mm AS (
  SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS mid FROM events),
binned AS (
  SELECT GREATEST(LEAST(CAST(round(value*100, 0) AS BIGINT) * {PSI_BINS} // {PSI_CENTS_MAX},
               {PSI_BINS - 1}), 0) AS bin,
         (epoch_us(ts) <= mm.mid) AS first_half
  FROM events, mm),
bins AS (SELECT range AS bin FROM range({PSI_BINS})),
cnt AS (
  SELECT b.bin,
         count(*) FILTER (first_half)::BIGINT AS n_first,
         count(*) FILTER (NOT first_half)::BIGINT AS n_second
  FROM bins b LEFT JOIN binned e ON e.bin = b.bin
  GROUP BY b.bin),
tot AS (SELECT sum(n_first)::BIGINT AS tf, sum(n_second)::BIGINT AS ts2 FROM cnt)
SELECT bin, n_first, n_second,
       round(((n_first + 1.0) / (tf + {PSI_BINS})
              - (n_second + 1.0) / (ts2 + {PSI_BINS}))
             * ln(((n_first + 1.0) / (tf + {PSI_BINS}))
                  / ((n_second + 1.0) / (ts2 + {PSI_BINS}))), 6) AS contrib
FROM cnt, tot"""

    sk_qs = ", ".join(f"({q}::DOUBLE)" for q in SKETCH_QS)
    sql["sketch_quantiles"] = f"""WITH h AS (
  SELECT l_extendedprice AS v,
         md5_number_upper((l_orderkey*8 + l_linenumber)::VARCHAR) AS hh
  FROM lineitem),
samp AS (SELECT v FROM h ORDER BY hh LIMIT {SKETCH_Q_K}),
vals AS (SELECT list_sort(list(v)) AS arr, count(*)::BIGINT AS n FROM samp),
pos AS (SELECT q, arr, q * (n - 1) AS p
        FROM vals CROSS JOIN (VALUES {sk_qs}) AS qs(q))
SELECT q,
       round(arr[floor(p)::BIGINT + 1] * (1.0 - (p - floor(p)))
             + arr[ceil(p)::BIGINT + 1] * (p - floor(p)), 6) AS value
FROM pos"""

    sql["kmv_user_overlap"] = f"""WITH hu AS (
  SELECT DISTINCT event_type, md5_number_upper(user_id::VARCHAR) AS h
  FROM events),
rk AS (SELECT event_type, h,
              row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
       FROM hu),
s AS (SELECT event_type, h FROM rk WHERE rn <= {KMV_K}),
types AS (SELECT DISTINCT event_type FROM s),
pairs AS (SELECT a.event_type AS ta, b.event_type AS tb
          FROM types a JOIN types b ON a.event_type < b.event_type),
un AS (SELECT p.ta, p.tb, s.h
       FROM pairs p JOIN s ON s.event_type IN (p.ta, p.tb)
       GROUP BY 1, 2, 3),
unr AS (SELECT ta, tb, h,
               row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS rn,
               count(*) OVER (PARTITION BY ta, tb) AS nu
        FROM un),
u AS (SELECT ta, tb, h, nu FROM unr WHERE rn <= {KMV_K}),
agg AS (SELECT ta, tb, max(h) AS theta, count(*)::BIGINT AS m,
               any_value(nu) AS nu
        FROM u GROUP BY ta, tb),
inter AS (SELECT u.ta, u.tb, count(*)::BIGINT AS n_inter
          FROM u
          JOIN s sa ON sa.event_type = u.ta AND sa.h = u.h
          JOIN s sb ON sb.event_type = u.tb AND sb.h = u.h
          GROUP BY u.ta, u.tb)
SELECT agg.ta AS type_a, agg.tb AS type_b,
       round((coalesce(inter.n_inter, 0) / agg.m::DOUBLE)
             * (CASE WHEN agg.nu < {KMV_K} THEN agg.m::DOUBLE
                     ELSE ({KMV_K} - 1)
                          / (agg.theta::DOUBLE / 18446744073709551616.0)
                END), 6) AS est_common_users
FROM agg LEFT JOIN inter ON inter.ta = agg.ta AND inter.tb = agg.tb"""

    sql["ldiversity_risk"] = f"""SELECT lang,
       n_chars // {LDIV_CHARS_BUCKET} AS size_bucket,
       count(DISTINCT source)::BIGINT AS n_sources,
       (count(DISTINCT source) < {LDIV_L})::BIGINT AS at_risk
FROM documents
GROUP BY 1, 2"""

    return sql
