"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by actor-pool ``map_batches`` stages.

The image/audio decode libraries are not available in this environment, so
the *decode kernels* are stubbed (``DeterministicFakeDecoder`` — a seeded,
content-derived fake; ``decode_image``/``decode_audio`` raise
``NotImplementedError`` where a real libjpeg/ffmpeg call would go).  The
Ray-side plumbing — schema, small batch sizes for wide binary rows, actor
signature, output layout — is real and tested (tests/test_extras.py).

Scale notes baked into the defaults: binary payloads make rows wide, so
``batch_size`` stays small (64) and the stage is an actor pool whose
``__init__`` would hold the decoder context (model weights / codec
state).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),
    ]
)


def synthesize_media_table(n_rows: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus (binary payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    for i in range(n_rows):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(256, 2048)), dtype=np.uint8).tobytes()
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["width"].append(int(rng.integers(16, 512)) if kind != "audio" else 0)
        rows["height"].append(int(rng.integers(16, 512)) if kind != "audio" else 0)
        rows["sample_rate"].append(16000 if kind != "image" else 0)
    return pa.table(rows, schema=MEDIA_SCHEMA)


def decode_image(payload: bytes) -> np.ndarray:
    """Real decode would call PIL/libjpeg here."""
    raise NotImplementedError("image decode library not available in this container")


def decode_audio(payload: bytes) -> np.ndarray:
    """Real decode would call soundfile/ffmpeg here."""
    raise NotImplementedError("audio decode library not available in this container")


class DeterministicFakeDecoder:
    """Actor-pool stage: payload -> fixed-size feature vector.

    Stands in for decode + feature-extract (resize / frame-sample /
    mel-spectrogram); the fake feature is a content-derived hash embedding
    so outputs are deterministic and testable.  Swap ``_features`` for the
    real kernel without touching the Ray plumbing."""

    def __init__(self, feature_dim: int = 16):
        self.feature_dim = feature_dim

    def _features(self, payload: bytes) -> np.ndarray:
        h = hashlib.blake2b(payload, digest_size=self.feature_dim * 2).digest()
        arr = np.frombuffer(h, dtype=np.uint16).astype(np.float64)
        return arr / 65535.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            self._features(p) for p in batch["payload"].to_pylist()
        ]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "n_bytes": pa.array(
                    [len(p) for p in batch["payload"].to_pylist()], pa.int64()
                ),
                "features": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float64())
                ),
            }
        )


def extract_media_features(media_ds, feature_dim: int = 16, batch_size: int = 64):
    """media table -> (media_id, kind, n_bytes, features) via the stubbed
    decoder actor pool.  Small batch_size on purpose: payloads are wide."""
    return media_ds.map_batches(
        DeterministicFakeDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        fn_constructor_kwargs={"feature_dim": feature_dim},
        concurrency=(1, 4),
    )
