"""CLI driver — the ``ray job submit`` entrypoint of the north rule.

Examples::

    # full build over a corpus parquet (repo,path,commit,lang,content)
    ray job submit -- python -m seekr_ray.cli build \
        --input /data/corpus --index-dir /data/index \
        --links /data/links --term-partitions 4096

    # resume after a failure: completed partitions are skipped
    ray job submit -- python -m seekr_ray.cli build --input ... --index-dir ...

    # serve queries / inspect
    python -m seekr_ray.cli query --index-dir /data/index --q "parse AND buffer"
    python -m seekr_ray.cli suggest --index-dir /data/index --prefix par

This module is the only place (besides bench.py and tests) that owns the
Ray session.
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = dict(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def cmd_build(args) -> int:
    import ray
    import ray.data as rd

    from .build import build_index
    from .config import IndexConfig

    _init_ray(args.num_cpus)
    cfg = IndexConfig(
        num_term_partitions=args.term_partitions,
        num_id_partitions=args.id_partitions,
        hot_df_threshold=args.hot_df_threshold,
        postings_per_chunk=args.postings_per_chunk,
        shuffle_strategy=args.shuffle_strategy,
    )
    docs = rd.read_parquet(args.input)
    links = None
    if not args.links and args.extract_links:
        from .stages.links import extract_links

        links = extract_links(rd.read_parquet(args.input))
    metrics = build_index(
        docs,
        args.index_dir,
        cfg,
        key_cols=None if args.id_col else args.key_cols.split(","),
        id_col=args.id_col,
        content_col=args.content_col,
        links_ds=links,
        links_path=args.links or None,
        resume=not args.no_resume,
        input_path=args.input,
    )
    print(json.dumps(metrics, indent=1, sort_keys=True))
    ray.shutdown()
    return 0


def cmd_query(args) -> int:
    from .query.engine import QueryEngine

    engine = QueryEngine(args.index_dir)
    mode = getattr(args, "mode", "auto")
    if getattr(args, "scorer", "tfidf") != "bm25" and mode != "auto":
        raise SystemExit(
            "--mode applies to --scorer bm25 (the tfidf path serves the "
            "reference faithful semantics with snippets/pagination)"
        )
    if getattr(args, "scorer", "tfidf") == "bm25":
        hits = engine.bm25_topk(
            args.q, k=(args.page + 1) * args.size, mode=mode
        )
        page = hits[args.page * args.size : (args.page + 1) * args.size]
        out = {
            "results": [{"doc_id": d, "score": s} for d, s in page],
            # true match count, like the tfidf path — NOT len(hits),
            # which is capped at the retrieval depth (page+1)*size
            "total_count": engine.total_hits(args.q),
            "scorer": "bm25",
        }
    else:
        out = engine.search(args.q, page=args.page, size=args.size)
    print(json.dumps(out, indent=1, default=str))
    return 0


def cmd_ingest(args) -> int:
    from .stages.ingest import ingest_corpus

    _init_ray(args.num_cpus)
    column_map = {}
    for pair in args.rename.split(","):
        if pair:
            src, dst = pair.split("=", 1)
            column_map[src] = dst
    metrics = ingest_corpus(
        args.input,
        args.out_dir,
        fmt=args.format,
        column_map=column_map,
        resume=not args.no_resume,
    )
    print(json.dumps(metrics, indent=1, sort_keys=True))
    import ray

    ray.shutdown()
    return 0


def cmd_extend(args) -> int:
    import ray
    import ray.data as rd

    from .stages.extend import extend_index

    _init_ray(args.num_cpus)
    metrics = extend_index(
        rd.read_parquet(args.input),
        args.index_dir,
        key_cols=args.key_cols.split(","),
        content_col=args.content_col,
    )
    print(json.dumps(metrics, indent=1, sort_keys=True))
    ray.shutdown()
    return 0


def cmd_merge(args) -> int:
    import ray

    from .stages.merge import merge_indexes

    _init_ray(args.num_cpus)
    metrics = merge_indexes(
        args.index_a,
        args.index_b,
        args.out_dir,
        key_cols=args.key_cols.split(","),
        links_path=args.links or None,
        resume=not args.no_resume,
    )
    print(json.dumps(metrics, indent=1, sort_keys=True))
    ray.shutdown()
    return 0


def cmd_compact(args) -> int:
    import ray

    from .stages.extend import compact_index

    _init_ray(args.num_cpus)
    print(json.dumps(compact_index(args.index_dir), indent=1, sort_keys=True))
    ray.shutdown()
    return 0


def cmd_pagerank(args) -> int:
    import ray

    from .build import refresh_pagerank

    _init_ray(args.num_cpus)
    print(
        json.dumps(
            refresh_pagerank(args.index_dir, links_path=args.links),
            indent=1,
            sort_keys=True,
        )
    )
    ray.shutdown()
    return 0


def cmd_suggest(args) -> int:
    from .query.engine import QueryEngine

    engine = QueryEngine(args.index_dir)
    print(json.dumps(engine.suggest(args.prefix)))
    return 0


def cmd_correct(args) -> int:
    from .query.engine import QueryEngine

    engine = QueryEngine(args.index_dir)
    print(json.dumps(engine.suggest_correction(args.q)))
    return 0


def cmd_serve(args) -> int:
    from .query.http_api import serve

    serve(args.index_dir, host=args.host, port=args.port)
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="seekr_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build the inverted index")
    b.add_argument("--input", required=True, help="corpus parquet path/dir")
    b.add_argument("--index-dir", required=True)
    b.add_argument("--links", default=None, help="links parquet (optional)")
    b.add_argument(
        "--extract-links",
        action="store_true",
        help="derive links from code imports when --links is absent",
    )
    b.add_argument("--key-cols", default="repo,path,commit")
    b.add_argument("--id-col", default=None)
    b.add_argument("--content-col", default="content")
    b.add_argument("--term-partitions", type=int, default=64)
    b.add_argument("--id-partitions", type=int, default=64)
    b.add_argument("--hot-df-threshold", type=int, default=100_000)
    b.add_argument("--postings-per-chunk", type=int, default=4096)
    b.add_argument(
        "--shuffle-strategy",
        choices=["partitioned_write", "salted_groupby"],
        default="partitioned_write",
    )
    b.add_argument("--num-cpus", type=int, default=None)
    b.add_argument("--no-resume", action="store_true")
    b.set_defaults(fn=cmd_build)

    g = sub.add_parser(
        "ingest",
        help="normalize a CSV/JSONL/parquet source into the canonical "
        "corpus parquet dir (streaming, no driver materialization)",
    )
    g.add_argument("--input", required=True, help="source path/dir")
    g.add_argument("--out-dir", required=True)
    g.add_argument(
        "--format", default="auto", choices=["auto", "csv", "jsonl", "parquet"]
    )
    g.add_argument(
        "--rename",
        default="",
        help="comma-separated src=dst column renames (e.g. body=content)",
    )
    g.add_argument("--num-cpus", type=int, default=None)
    g.add_argument("--no-resume", action="store_true")
    g.set_defaults(fn=cmd_ingest)

    e = sub.add_parser(
        "extend",
        help="add documents to an existing index (addDocuments analog: "
        "delta segments + global idf rewrite)",
    )
    e.add_argument("--input", required=True, help="new-docs parquet path/dir")
    e.add_argument("--index-dir", required=True)
    e.add_argument("--key-cols", default="repo,path,commit")
    e.add_argument("--content-col", default="content")
    e.add_argument("--num-cpus", type=int, default=None)
    e.set_defaults(fn=cmd_extend)

    m = sub.add_parser(
        "merge",
        help="merge two independently built indexes into a new one — "
        "shard-parallel build topology; identical to a unified build "
        "over the concatenated corpora, without re-tokenizing",
    )
    m.add_argument("--index-a", required=True)
    m.add_argument("--index-b", required=True)
    m.add_argument("--out-dir", required=True)
    m.add_argument("--key-cols", default="repo,path,commit")
    m.add_argument(
        "--links", default=None,
        help="union-graph links parquet for the PageRank recompute "
        "(subgraph ranks are not mergeable; omit to serve rank 0.0)",
    )
    m.add_argument("--num-cpus", type=int, default=None)
    m.add_argument("--no-resume", action="store_true")
    m.set_defaults(fn=cmd_merge)

    c = sub.add_parser(
        "compact",
        help="fold delta segment files back into one base file per "
        "partition (LSM compaction after extend)",
    )
    c.add_argument("--index-dir", required=True)
    c.add_argument("--num-cpus", type=int, default=None)
    c.set_defaults(fn=cmd_compact)

    pr = sub.add_parser(
        "pagerank",
        help="recompute PageRank over the current docs table (run after "
        "extend with a link table covering the union graph)",
    )
    pr.add_argument("--index-dir", required=True)
    pr.add_argument("--links", required=True, help="links parquet path")
    pr.add_argument("--num-cpus", type=int, default=None)
    pr.set_defaults(fn=cmd_pagerank)

    q = sub.add_parser("query", help="run a search query")
    q.add_argument("--index-dir", required=True)
    q.add_argument("--q", required=True)
    q.add_argument("--page", type=int, default=0)
    q.add_argument("--size", type=int, default=10)
    q.add_argument(
        "--scorer",
        choices=["tfidf", "bm25"],
        default="tfidf",
        help="tfidf = reference formula (0.7 tf·idf + 0.3 pagerank); "
        "bm25 = k1=1.2/b=0.75 with the same pagerank blend "
        "(plain free-text queries only)",
    )
    q.add_argument(
        "--mode",
        choices=["auto", "wand", "bmw", "bmw_cold"],
        default="auto",
        help="top-k evaluation strategy for --scorer bm25: auto = "
        "vectorized TAAT, wand = plain WAND, bmw = block-max WAND, "
        "bmw_cold = chunk-lazy BMW over persisted chunk metadata "
        "(all rank-identical; cold/bmw fall back to auto on "
        "non-pruning workloads)",
    )
    q.set_defaults(fn=cmd_query)

    s = sub.add_parser("suggest", help="prefix suggestions")
    s.add_argument("--index-dir", required=True)
    s.add_argument("--prefix", required=True)
    s.set_defaults(fn=cmd_suggest)

    co = sub.add_parser(
        "correct", help="did-you-mean spelling corrections for a query"
    )
    co.add_argument("--index-dir", required=True)
    co.add_argument("--q", required=True)
    co.set_defaults(fn=cmd_correct)

    v = sub.add_parser(
        "serve", help="REST API (/api/search, /api/suggestions)"
    )
    v.add_argument("--index-dir", required=True)
    v.add_argument("--host", default="127.0.0.1")
    v.add_argument("--port", type=int, default=8080)
    v.set_defaults(fn=cmd_serve)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
