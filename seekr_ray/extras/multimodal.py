"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by actor-pool ``map_batches`` stages.

Round 2: all three decode kernels are REAL for the formats a
pure-python decoder can parse — binary PPM (P6) images, PCM16 WAV
audio, and PV01 animated-PPM video (demux walks frame headers only;
frame sampling decodes exactly the k sampled frames) — so
``multimodal_features`` measures actual decode + feature extraction,
not a hash fake.  Compressed formats (JPEG/FLAC/H.264/MP4) would need
libjpeg/ffmpeg, which this container does not ship: those payloads
raise ``NotImplementedError`` with the format named.  The Ray-side
plumbing — schema, small batch sizes for wide binary rows, actor pool
with per-actor state, output layout — is identical for all three.

Scale notes baked into the defaults: binary payloads make rows wide, so
``batch_size`` stays small (64) and the stage is an actor pool whose
``__init__`` holds the decoder state.
"""

from __future__ import annotations

import hashlib
import struct

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

FEATURE_DIM = 16


# ---------------------------------------------------------------------------
# real codecs (pure python/numpy)
# ---------------------------------------------------------------------------


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (P6)."""
    h, w, c = pixels.shape
    assert c == 3
    header = f"P6\n{w} {h}\n255\n".encode()
    return header + np.ascontiguousarray(pixels, dtype=np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) -> (h, w, 3) uint8.  Handles comments and
    arbitrary whitespace in the header per the netpbm spec."""
    if not payload.startswith(b"P6"):
        raise NotImplementedError(
            "only binary PPM (P6) images decode in this container; "
            "JPEG/PNG need libjpeg/libpng"
        )
    # header = magic, width, height, maxval tokens (comments start '#')
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i)
    return data.reshape(h, w, 3)


def _ppm_frame_extent(payload: bytes, off: int) -> int:
    """Byte length of the P6 frame starting at ``off`` (header parse
    only — pixel data is skipped, not decoded)."""
    if payload[off : off + 2] != b"P6":
        raise NotImplementedError("PV01 frame is not binary PPM")
    tokens: list[int] = []
    i = off + 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, _maxval = tokens
    return (i - off) + w * h * 3


def encode_ppmv(frames: list[np.ndarray], fps: float = 10.0) -> bytes:
    """Animated-PPM video container ("PV01"): magic, frame count, fps
    (millihertz), then concatenated self-describing P6 frames.  A real —
    if minimal — multi-frame format a pure-python demuxer can walk."""
    head = b"PV01" + struct.pack("<II", len(frames), int(round(fps * 1000)))
    return head + b"".join(encode_ppm(f) for f in frames)


def demux_ppmv(payload: bytes) -> tuple[int, float, list[tuple[int, int]]]:
    """(n_frames, fps, [(offset, length) per frame]) — walks frame
    HEADERS only; pixel payloads are never touched, so sampling k of N
    frames decodes exactly k frames."""
    if payload[:4] != b"PV01":
        raise NotImplementedError(
            "only the PV01 animated-PPM container demuxes in this "
            "container; MP4/H.264/WebM need ffmpeg"
        )
    n, fps_m = struct.unpack("<II", payload[4:12])
    spans: list[tuple[int, int]] = []
    off = 12
    for _ in range(n):
        ln = _ppm_frame_extent(payload, off)
        spans.append((off, ln))
        off += ln
    return n, fps_m / 1000.0, spans


def sample_ppmv_frames(payload: bytes, k: int) -> list[np.ndarray]:
    """Evenly-spaced k-frame sample, decoding only the sampled frames."""
    n, _fps, spans = demux_ppmv(payload)
    if n == 0:
        return []
    idx = np.unique(np.linspace(0, n - 1, num=min(k, n)).astype(np.int64))
    return [
        decode_ppm(payload[spans[i][0] : spans[i][0] + spans[i][1]])
        for i in idx
    ]


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono samples -> RIFF/WAVE PCM16 bytes."""
    pcm = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    n = len(pcm)
    hdr = b"RIFF" + struct.pack("<I", 36 + n) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    return hdr + fmt + b"data" + struct.pack("<I", n) + pcm


def decode_wav_pcm16(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 -> (int16 samples, sample_rate).  Walks RIFF
    chunks; rejects compressed codecs by audio format tag."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            "only RIFF/WAVE PCM decodes in this container; "
            "FLAC/MP3/OGG need their codec libraries"
        )
    i = 12
    rate = None
    samples = None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        (size,) = struct.unpack("<I", payload[i + 4 : i + 8])
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt_tag, channels, rate = struct.unpack("<HHI", body[:8])
            if fmt_tag != 1:
                raise NotImplementedError(f"WAV format tag {fmt_tag} (not PCM)")
            if channels != 1:
                raise NotImplementedError("only mono WAV supported")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        i += 8 + size + (size & 1)
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    return samples, rate


def decode_image(payload: bytes) -> np.ndarray:
    """Dispatch: P6 PPM decodes for real; compressed formats raise."""
    return decode_ppm(payload)


def decode_audio(payload: bytes) -> np.ndarray:
    """Dispatch: PCM16 WAV decodes for real; compressed codecs raise."""
    samples, _rate = decode_wav_pcm16(payload)
    return samples


# ---------------------------------------------------------------------------
# synthetic media corpus
# ---------------------------------------------------------------------------


def synthesize_media_table(n_rows: int, seed: int = 42) -> pa.Table:
    """Deterministic media corpus: REAL P6/WAV/PV01 payloads for
    image/audio/video rows — every modality decodes end-to-end."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    for i in range(n_rows):
        kind = kinds[i % 3]
        if kind == "image":
            w = int(rng.integers(8, 48))
            h = int(rng.integers(8, 48))
            pixels = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            payload = encode_ppm(pixels)
            sr = 0
        elif kind == "audio":
            sr = 16000
            n = int(rng.integers(256, 2048))
            t = np.arange(n) / sr
            freq = float(rng.integers(100, 2000))
            wave = 0.5 * np.sin(2 * np.pi * freq * t) + 0.05 * rng.standard_normal(n)
            payload = encode_wav_pcm16(
                np.clip(wave * 32767, -32768, 32767).astype(np.int16), sr
            )
            w = h = 0
        else:
            w = int(rng.integers(6, 20))
            h = int(rng.integers(6, 20))
            n_frames = int(rng.integers(4, 16))
            frames = [
                rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                for _ in range(n_frames)
            ]
            payload = encode_ppmv(frames, fps=float(rng.integers(5, 30)))
            sr = 0
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["width"].append(w)
        rows["height"].append(h)
        rows["sample_rate"].append(sr)
    return pa.table(rows, schema=MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# feature extraction stages
# ---------------------------------------------------------------------------


class DeterministicFakeDecoder:
    """Clearly-marked STUB decoder kept for callers that want pipeline
    tests without any decodable payloads: feature = content-derived hash
    embedding, deterministic and testable.  No production path uses it —
    image/audio/video all decode for real above."""

    def __init__(self, feature_dim: int = FEATURE_DIM):
        self.feature_dim = feature_dim

    def _features(self, payload: bytes) -> np.ndarray:
        h = hashlib.blake2b(payload, digest_size=self.feature_dim * 2).digest()
        arr = np.frombuffer(h, dtype=np.uint16).astype(np.float64)
        return arr / 65535.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._features(p) for p in batch["payload"].to_pylist()]
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


class MediaFeatureExtractor:
    """Actor-pool stage: payload -> FEATURE_DIM feature vector.

    * image: REAL P6 decode -> per-channel mean/std, luma stats, dims
    * audio: REAL WAV PCM16 decode -> rms, zero-crossing rate, band
      energies from a coarse DFT, duration
    * video: REAL PV01 demux -> evenly-sampled frame decode (k of N,
      headers-only walk for the rest) -> dims, luma stats, temporal
      motion energy.  Compressed containers (MP4/WebM) raise — they need
      ffmpeg, which this environment does not ship.

    Per-actor state (__init__): the DFT bin matrix — the "model load"
    analog that justifies the actor pool over plain tasks.
    """

    _N_FFT = 256

    def __init__(self, feature_dim: int = FEATURE_DIM):
        self.feature_dim = feature_dim
        k = np.arange(self._N_FFT)
        # 4 coarse frequency bins over a 256-sample window
        self._dft = np.exp(
            -2j * np.pi * np.outer([1, 4, 16, 64], k) / self._N_FFT
        )

    def _image_features(self, payload: bytes) -> np.ndarray:
        px = decode_ppm(payload).astype(np.float64)
        h, w, _ = px.shape
        luma = px @ np.array([0.299, 0.587, 0.114])
        f = np.zeros(self.feature_dim)
        f[0], f[1] = w, h
        f[2] = w / h
        f[3:6] = px.mean(axis=(0, 1)) / 255.0
        f[6:9] = px.std(axis=(0, 1)) / 255.0
        f[9] = luma.mean() / 255.0
        f[10] = luma.std() / 255.0
        f[11] = np.abs(np.diff(luma, axis=1)).mean() / 255.0  # edge energy
        return f

    def _audio_features(self, payload: bytes) -> np.ndarray:
        samples, rate = decode_wav_pcm16(payload)
        x = samples.astype(np.float64) / 32768.0
        f = np.zeros(self.feature_dim)
        f[0] = rate
        f[1] = len(x)
        f[2] = len(x) / rate
        f[3] = float(np.sqrt((x**2).mean())) if len(x) else 0.0
        if len(x) > 1:
            f[4] = float((np.signbit(x[1:]) != np.signbit(x[:-1])).mean())
        win = x[: self._N_FFT]
        if len(win) < self._N_FFT:
            win = np.pad(win, (0, self._N_FFT - len(win)))
        f[5:9] = np.abs(self._dft @ win) / self._N_FFT
        return f

    _VIDEO_SAMPLE_K = 4

    def _video_features(self, payload: bytes) -> np.ndarray:
        n, fps, _spans = demux_ppmv(payload)
        frames = sample_ppmv_frames(payload, self._VIDEO_SAMPLE_K)
        f = np.zeros(self.feature_dim)
        f[0], f[1] = n, fps
        if not frames:
            return f
        h, w, _ = frames[0].shape
        f[2], f[3] = w, h
        f[4] = n / fps if fps else 0.0
        lumas = [
            fr.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
            for fr in frames
        ]
        f[5] = float(np.mean([lu.mean() for lu in lumas])) / 255.0
        f[6] = float(np.mean([lu.std() for lu in lumas])) / 255.0
        if len(lumas) > 1:
            # temporal motion energy over the sampled frames
            f[7] = float(
                np.mean(
                    [
                        np.abs(b - a).mean()
                        for a, b in zip(lumas, lumas[1:])
                    ]
                )
            ) / 255.0
        f[8] = len(frames)
        return f

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        feats = []
        for kind, p in zip(kinds, payloads):
            if kind == "image":
                feats.append(self._image_features(p))
            elif kind == "audio":
                feats.append(self._audio_features(p))
            else:
                feats.append(self._video_features(p))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
                "features": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float64())
                ),
            }
        )


def extract_media_features(media_ds, feature_dim: int = FEATURE_DIM, batch_size: int = 64):
    """media table -> (media_id, kind, n_bytes, features) via the decoder
    actor pool.  Small batch_size on purpose: payloads are wide."""
    return media_ds.map_batches(
        MediaFeatureExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        fn_constructor_kwargs={"feature_dim": feature_dim},
        concurrency=(1, 4),
    )


# ---------------------------------------------------------------------------
# perceptual-hash image near-dup
# ---------------------------------------------------------------------------


def ahash64(pixels: np.ndarray) -> int:
    """64-bit average hash of an (h, w, 3) uint8 image: grayscale by
    integer channel mean, 8×8 block-mean downsample (deterministic
    floor-edge bins — no interpolation library), threshold at the 64-cell
    mean.  The classic aHash: robust to small noise/brightness jitter,
    cheap enough for a per-batch loop over thousands of images."""
    gray = pixels.astype(np.uint32).sum(axis=2) // 3
    h, w = gray.shape
    ye = (np.arange(9) * h) // 8
    xe = (np.arange(9) * w) // 8
    cells = np.empty((8, 8), np.float64)
    for i in range(8):
        for j in range(8):
            block = gray[ye[i] : max(ye[i + 1], ye[i] + 1),
                         xe[j] : max(xe[j + 1], xe[j] + 1)]
            cells[i, j] = block.mean()
    bits = (cells > cells.mean()).reshape(64)
    v = 0
    for i in range(64):
        if bits[i]:
            v |= 1 << i
    return v


class _AHasher:
    """Actor-pool stage: (media_id, payload) -> (media_id, phash int64).
    Non-P6 payloads are skipped (hash applies to decodable images)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, hashes = [], []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            if not payload or not payload.startswith(b"P6"):
                continue
            v = ahash64(decode_ppm(payload))
            ids.append(mid)
            hashes.append(v - (1 << 64) if v >= (1 << 63) else v)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "phash": pa.array(hashes, pa.int64()),
            }
        )


def image_phash_pairs(
    media_ds,
    *,
    max_hamming: int = 3,
    batch_size: int = 64,
):
    """Near-duplicate IMAGE pairs: aHash fingerprints from an actor-pool
    decode stage (small batches — binary rows are wide), then the same
    banded hamming-pair machinery as the simhash text path
    (extras/dedup.banded_hamming_pairs, pigeonhole-exact recall).
    Output: (a, b, hamming) over media_ids."""
    from .dedup import banded_hamming_pairs

    fps = media_ds.map_batches(
        _AHasher,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 4),
    )
    return banded_hamming_pairs(
        fps, max_hamming=max_hamming, id_col="media_id", hash_col="phash"
    )


def synthesize_image_table(
    n_rows: int, seed: int = 7, dup_every: int = 5
) -> pa.Table:
    """Deterministic image corpus WITH planted near-dup families: every
    ``dup_every``-th image is its family base with ±1 pixel noise (aHash
    is invariant to that), the rest are independent draws — so the
    near-dup pair set is non-vacuous by construction."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    rows = {"media_id": [], "kind": [], "payload": [],
            "width": [], "height": [], "sample_rate": []}
    for i in range(n_rows):
        if i % dup_every == 0:
            noise = rng.integers(-1, 2, size=base.shape)
            pixels = np.clip(
                base.astype(np.int32) + noise, 0, 255
            ).astype(np.uint8)
        else:
            pixels = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
        rows["media_id"].append(i)
        rows["kind"].append("image")
        rows["payload"].append(encode_ppm(pixels))
        rows["width"].append(32)
        rows["height"].append(32)
        rows["sample_rate"].append(0)
    return pa.table(rows, schema=MEDIA_SCHEMA)
