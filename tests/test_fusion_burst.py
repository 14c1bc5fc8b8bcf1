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


def test_source_overlap_law():
    """Hand-built two-source overlap: shared trigram counted once,
    jaccard = inter / union of distinct shingle sets."""
    import ray.data as rd

    from seekr_ray.extras.overlap import source_overlap_matrix

    tbl = pa.table(
        {
            "source": pa.array(["s1", "s1", "s2", "s3"]),
            "text": pa.array(
                [
                    "alpha beta gamma delta",  # s1: {abg, bgd}
                    "alpha beta gamma",  # s1 dup shingle abg (distinct!)
                    "alpha beta gamma zeta",  # s2: {abg, bgz}
                    "omega psi chi",  # s3: {opc} -- no overlap
                ]
            ),
        }
    )
    out = (
        source_overlap_matrix(rd.from_arrow(tbl).repartition(2), k=3)
        .to_pandas()
        .set_index(["src_a", "src_b"])
    )
    row = out.loc[("s1", "s2")]
    assert row["n_shared"] == 1 and row["n_a"] == 2 and row["n_b"] == 2
    assert row["jaccard"] == round(1 / 3, 6)
    assert ("s1", "s3") not in out.index  # zero-overlap pairs omitted
