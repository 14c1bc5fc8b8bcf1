"""rrf_fusion / hourly_burst composition sanity (bit-parity vs DuckDB
is covered by the contract audit; these check the internal laws)."""

import pyarrow as pa
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")

SF = "/root/testdata/sf0.001"


def test_rrf_fusion_law():
    from seekr_ray.entry_queries import (
        q_rrf_fusion,
        q_search_bm25_topk,
        q_search_tfidf_topk,
    )

    out = q_rrf_fusion(SF).to_pandas().set_index("doc_id")
    n1 = q_search_tfidf_topk(SF).num_rows
    n2 = q_search_bm25_topk(SF).num_rows
    assert len(out) >= max(n1, n2)
    # every row's rrf equals the stated rank contributions
    for doc, row in out.iterrows():
        expect = 0.0
        if row["rank_tfidf"]:
            expect += 1.0 / (60.0 + row["rank_tfidf"])
        if row["rank_bm25"]:
            expect += 1.0 / (60.0 + row["rank_bm25"])
        assert abs(row["rrf"] - expect) < 1e-6
    # ranks are a permutation of 1..n within each list
    got1 = sorted(r for r in out["rank_tfidf"] if r)
    assert got1 == list(range(1, n1 + 1))
    got2 = sorted(r for r in out["rank_bm25"] if r)
    assert got2 == list(range(1, n2 + 1))


def test_hourly_burst_threshold():
    from seekr_ray.entry_queries import q_hourly_burst

    out = pa.concat_tables(
        q_hourly_burst(SF).iter_batches(batch_format="pyarrow")
    ).to_pandas()
    assert (out["z"] > 2.0).all()
    assert set(out.columns) == {"window", "event_type", "z"}
