"""Build / query configuration for the Ray-Data-native index engine."""

from __future__ import annotations

from dataclasses import dataclass, field, asdict


@dataclass
class IndexConfig:
    """Knobs for the inverted-index build (SURVEY.md §7).

    Defaults are sized for the sandbox test scale; the scale notes say what
    each knob becomes on a real multi-node cluster over ~10^12 files.
    """

    # term-partition count P: segments + term_stats are written as one file
    # per hash(term) % P partition (the resume/checkpoint unit, SURVEY.md
    # §4 "Checkpoint / resume").  Scale: tens of thousands, so one partition
    # is a few hundred MB.
    num_term_partitions: int = 16

    # doc-id space partitions for deterministic id assignment
    # (doc_id = pid << 40 | row-rank-within-pid; see stages/doc_table.py)
    num_id_partitions: int = 32

    # postings per compressed chunk row — the block-max WAND granularity
    # and the bound that keeps any single Arrow row small even for terms
    # that appear in half the corpus (SURVEY.md §7.5.6).
    postings_per_chunk: int = 4096

    # a term with df above this is "hot" and its posting build is salted
    # into ceil(df / hot_df_threshold) sub-groups keyed by doc_id ranges
    # (SURVEY.md §4 skew control).  Scale: ~1-5M rows per group.
    hot_df_threshold: int = 100_000

    # tokenizer actor pool sizing
    tokenize_batch_size: int = 128
    tokenize_concurrency: int | tuple[int, int] | None = None

    store_positions: bool = True

    # how postings reach their term partition (see stages/segments.py):
    # "partitioned_write" — tokenize hive-partitions its output by
    #   hash(term) % P at write time; each partition then builds segment +
    #   stats in one local task (no object-store all-to-all; the default
    #   and the scaling path);
    # "salted_groupby" — round-1 path: flat postings intermediate, stats
    #   groupby, hot-term salting, groupby(term_part) shuffle.  Kept for
    #   corpora with known df ~ N terms where write-time partitioning
    #   would concentrate a partition.
    shuffle_strategy: str = "partitioned_write"

    # scoring blend (Ranker.java:18-19)
    tfidf_weight: float = 0.7
    pagerank_weight: float = 0.3

    # phrase gap (QueryIndex.java:355)
    max_phrase_gap: int = 3

    # PageRank (PageRank.java:14-15)
    pagerank_damping: float = 0.85
    pagerank_epsilon: float = 1e-5
    # graphs with at most this many edges (and docs, for the resolve fast
    # path) iterate as numpy on the driver; larger graphs run the
    # distributed join+groupby power iteration (graph/pagerank.py)
    pagerank_driver_edge_limit: int = 2_000_000

    def to_dict(self) -> dict:
        return asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "IndexConfig":
        known = {f for f in cls.__dataclass_fields__}
        return cls(**{k: v for k, v in d.items() if k in known})


# doc_id layout: high bits = id partition, low 40 bits = rank within it
DOC_ID_PARTITION_SHIFT = 40
