"""Mann-Whitney U entry: hand-computed tie case + block invariance."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write_events(tmp_path, rows):
    # (event_type, value); ts/user/event ids are irrelevant to the test
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array(
                np.arange(len(rows), dtype=np.int64).astype("datetime64[us]")
            ),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "value": pa.array([r[1] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))
    return str(d)

def test_mwu_hand_tied_case(ray_session, tmp_path):
    from seekr_ray.entry_queries import q_mannwhitney_value

    # A = purchases {1, 1}, B = views {1, 2} (cents 100, 200)
    sf = _write_events(
        tmp_path,
        [
            ("purchase", 1.0),
            ("purchase", 1.0),
            ("view", 1.0),
            ("view", 2.0),
        ],
    )
    out = q_mannwhitney_value(sf)
    row = out.to_pylist()[0]
    # ranks of the three tied 1.0s average to 2; R1 = 4 -> U1 = 1
    # sigma = sqrt((4/12)*(5 - 24/12)) = 1, mu = 2 -> z = -1
    assert row["n1"] == 2 and row["n2"] == 2
    assert row["u1"] == 1.0
    assert row["z"] == -1.0


def test_mwu_all_separated(ray_session, tmp_path):
    from seekr_ray.entry_queries import q_mannwhitney_value

    sf = _write_events(
        tmp_path,
        [("purchase", 1.0), ("purchase", 2.0), ("view", 3.0), ("view", 4.0)],
    )
    row = q_mannwhitney_value(sf).to_pylist()[0]
    assert row["u1"] == 0.0  # every purchase below every view
    assert abs(row["z"] - (-2.0) / (20.0 / 12.0) ** 0.5) < 1e-6
