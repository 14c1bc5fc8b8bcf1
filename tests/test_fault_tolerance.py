"""Task-failure resilience: Ray Data retries failed map_batches tasks
(the lineage-based recovery a 256-node run lives on; application
exceptions opt in per-op via retry_exceptions), and the pipeline
result after a transient per-worker crash is bit-identical to an
undisturbed run.  The injected fault crashes the FIRST attempt of each
task once (marker files under a tmp dir shared by retries), which
exercises the retry path deterministically without killing workers."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _flaky_fn(marker_dir: str):
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        # one crash per distinct first-row id, then clean on retry
        key = str(batch["id"][0].as_py())
        marker = os.path.join(marker_dir, f"crashed_{key}")
        if not os.path.exists(marker):
            with open(marker, "w") as f:
                f.write("x")
            raise RuntimeError("injected transient failure")
        return pa.table(
            {
                "id": batch["id"],
                "y": pc.multiply(batch["x"], 2),
            }
        )

    return fn


def test_map_batches_survives_transient_task_failures(ray_session, tmp_path):
    import ray.data as rd

    df = pd.DataFrame(
        {
            "id": np.arange(4000, dtype=np.int64),
            "x": np.arange(4000, dtype=np.int64) % 97,
        }
    )
    ds = rd.from_pandas(df).repartition(8)
    got = (
        ds.map_batches(
            _flaky_fn(str(tmp_path)),
            batch_format="pyarrow",
            retry_exceptions=[RuntimeError],
            max_retries=3,
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    # every task crashed exactly once and was retried to completion
    markers = [p for p in os.listdir(tmp_path) if p.startswith("crashed_")]
    assert len(markers) >= 1
    assert got["y"].tolist() == (df["x"] * 2).tolist()


def test_groupby_pipeline_exact_after_injected_failures(ray_session, tmp_path):
    """The full partial-agg -> shuffle -> sum discipline under injected
    map-task crashes: the aggregate equals the clean run exactly."""
    import ray.data as rd

    rng = np.random.default_rng(23)
    df = pd.DataFrame(
        {
            "id": np.arange(6000, dtype=np.int64),
            "g": rng.integers(0, 11, size=6000),
            "v": rng.integers(0, 1000, size=6000),
        }
    )

    def run(marker_dir: str | None):
        ds = rd.from_pandas(df).repartition(6)

        def partial(batch: pa.Table) -> pa.Table:
            if marker_dir is not None:
                key = str(batch["id"][0].as_py())
                marker = os.path.join(marker_dir, f"m_{key}")
                if not os.path.exists(marker):
                    with open(marker, "w") as f:
                        f.write("x")
                    raise RuntimeError("injected")
            agg = batch.select(["g", "v"]).group_by(["g"]).aggregate(
                [("v", "sum")]
            )
            return agg.rename_columns(["g", "v_p"])

        return (
            ds.map_batches(
                partial,
                batch_format="pyarrow",
                retry_exceptions=[RuntimeError],
                max_retries=3,
            )
            .groupby("g")
            .sum("v_p")
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )

    clean = run(None)
    faulted = run(str(tmp_path))
    pd.testing.assert_frame_equal(clean, faulted)
    assert clean["sum(v_p)"].sum() == df["v"].sum()
