"""Perceptual-hash image near-dup tests."""

import numpy as np
import pyarrow as pa
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def test_ahash_noise_invariance_and_separation():
    from seekr_ray.extras.multimodal import ahash64

    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    noisy = np.clip(
        base.astype(np.int32) + rng.integers(-1, 2, size=base.shape), 0, 255
    ).astype(np.uint8)
    other = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    h_base, h_noisy, h_other = ahash64(base), ahash64(noisy), ahash64(other)
    assert bin(h_base ^ h_noisy).count("1") <= 3  # near-dup stays close
    assert bin(h_base ^ h_other).count("1") > 10  # independent stays far


def test_image_phash_pairs_vs_bruteforce():
    import ray.data as rd

    from seekr_ray.extras.multimodal import (
        ahash64,
        decode_ppm,
        image_phash_pairs,
        synthesize_image_table,
    )

    tbl = synthesize_image_table(40, dup_every=5)
    ds = rd.from_arrow(tbl).repartition(4)
    out = (
        pa.concat_tables(
            image_phash_pairs(ds, max_hamming=3).iter_batches(
                batch_format="pyarrow"
            )
        )
        .to_pandas()
        .sort_values(["a", "b"])
    )
    hashes = {
        mid: ahash64(decode_ppm(p))
        for mid, p in zip(
            tbl["media_id"].to_pylist(), tbl["payload"].to_pylist()
        )
    }
    expect = []
    ids = sorted(hashes)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            h = bin(hashes[ids[i]] ^ hashes[ids[j]]).count("1")
            if h <= 3:
                expect.append((ids[i], ids[j], h))
    got = list(zip(out["a"], out["b"], out["hamming"]))
    assert sorted(got) == sorted(expect)
    # the planted family (media_ids 0, 5, 10, ...) must collide
    family = {i for i in ids if i % 5 == 0}
    found = {a for a, b, _ in expect if b in family and a in family}
    assert len(found) > 0
