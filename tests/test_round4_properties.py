"""Property-based checks for the round-4 kernels: band-pair emission
forms, the per-source keep-k combiner, and scrub-vs-RE2 equivalence on
arbitrary ASCII text."""

import re

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from seekr_ray.extras.dedup import _make_band_pairs, _min_label_numpy
from seekr_ray.extras.scrub import (
    EMAIL_PATTERN,
    HEX_SECRET_PATTERN,
    IPV4_PATTERN,
    scrub_text,
)


@st.composite
def _band_rows(draw):
    n = draw(st.integers(1, 120))
    bands = draw(
        st.lists(st.integers(0, 3), min_size=n, max_size=n)
    )
    hashes = draw(
        st.lists(st.integers(0, 6), min_size=n, max_size=n)
    )
    ids = draw(
        st.lists(st.integers(0, 40), min_size=n, max_size=n)
    )
    return pa.table(
        {
            "band": pa.array(bands, pa.int32()),
            "band_hash": pa.array(hashes, pa.int64()),
            "doc_id": pa.array(ids, pa.int64()),
        }
    )


@given(_band_rows())
@settings(max_examples=120, deadline=None)
def test_links_equal_components_property(group):
    """Spanning-link emission must give the SAME connected components
    as the full clique emission over any band-row multiset."""
    pairs = _make_band_pairs("pairs", None)(group)
    links = _make_band_pairs("links", None)(group)

    def comps(tbl):
        if tbl.num_rows == 0:
            return {}
        nodes, labels = _min_label_numpy(
            tbl["a"].to_numpy(zero_copy_only=False),
            tbl["b"].to_numpy(zero_copy_only=False),
        )
        return dict(zip(nodes.tolist(), labels.tolist()))

    assert comps(pairs) == comps(links)
    # pairs form: every bucket of m distinct ids contributes m(m-1)/2
    assert links.num_rows <= pairs.num_rows


@given(_band_rows(), st.integers(1, 5))
@settings(max_examples=60, deadline=None)
def test_max_bucket_cap_property(group, cap):
    """Capped emission = uncapped emission minus every bucket whose
    distinct-doc count exceeds the cap (both forms)."""
    for emit in ("pairs", "links"):
        capped = _make_band_pairs(emit, cap)(group)
        full = _make_band_pairs(emit, None)(group)
        assert capped.num_rows <= full.num_rows
        # rebuild the expectation per (band, hash) bucket
        df = group.to_pandas()
        exp = 0
        for (_, _), sub in df.groupby(["band", "band_hash"]):
            m = sub["doc_id"].nunique()
            if m <= 1 or m > cap:
                continue
            exp += (m - 1) if emit == "links" else m * (m - 1) // 2
        assert capped.num_rows == exp


@st.composite
def _rowsets(draw):
    n = draw(st.integers(1, 200))
    ids = draw(
        st.lists(
            st.integers(0, 10_000), min_size=n, max_size=n, unique=True
        )
    )
    srcs = draw(st.lists(st.integers(0, 6), min_size=n, max_size=n))
    return ids, [f"s{x}" for x in srcs]


@given(_rowsets(), st.integers(1, 8), st.integers(1, 5))
@settings(max_examples=40, deadline=None)
def test_source_doc_cap_property(rows, k, blocks):
    """Two-phase keep-k == brute-force k lowest doc_ids per source, for
    any block layout."""
    import ray.data as rd

    from seekr_ray.extras.curate import source_doc_cap

    ids, srcs = rows
    ds = rd.from_items(
        [{"doc_id": d, "source": s} for d, s in zip(ids, srcs)],
        override_num_blocks=blocks,
    )
    got = (
        source_doc_cap(ds, k=k)
        .to_pandas()
        .sort_values(["source", "source_rank"])
        .reset_index(drop=True)
    )
    df = pd.DataFrame({"doc_id": ids, "source": srcs})
    want = []
    for s, sub in df.groupby("source"):
        kept = sorted(sub["doc_id"])[:k]
        want.extend((d, s, r + 1) for r, d in enumerate(kept))
    want.sort(key=lambda t: (t[1], t[2]))
    assert list(map(tuple, got[["doc_id", "source", "source_rank"]].values)) == want


_TEXT_ALPHABET = st.sampled_from(
    list("abcdef0123456789 .@-+_%\n#*xyzXYZ")
)


@given(st.lists(st.text(_TEXT_ALPHABET, max_size=60), max_size=8))
@settings(max_examples=80, deadline=None)
def test_scrub_matches_re2_property(texts):
    """Python-side scrub == DuckDB RE2 replay on arbitrary text over an
    adversarial alphabet (emails/IPs/hex fragments/boundaries)."""
    con = duckdb.connect()
    con.register("d", pd.DataFrame({"t": texts or [""]}))
    rows = con.execute(
        f"""SELECT regexp_replace(regexp_replace(regexp_replace(t,
              '{EMAIL_PATTERN}', '<EMAIL>', 'g'),
              '{IPV4_PATTERN}', '<IP>', 'g'),
              '{HEX_SECRET_PATTERN}', '<SECRET>', 'g')
        FROM d"""
    ).fetchall()
    for text, (sql_scrubbed,) in zip(texts or [""], rows):
        assert scrub_text(text)[0] == sql_scrubbed, repr(text)
