"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

Real pipelines decode images/audio/video; the decode libraries are not in
this container, so the DECODE KERNELS are stubbed (clearly marked) behind a
deterministic synthetic container format — but the Ray-side plumbing is
real: actor-pool ``map_batches`` stages with small batch sizes (binary
payloads are large → batch bytes, not row count, bound memory), typed Arrow
schemas in and out, and tested end-to-end.

Synthetic container format (``make_fake_media``):
    b"MM01" | kind(1B: I/A/V) | width(u16) | height(u16) | n_frames(u16)
    | payload bytes (pseudo-pixels, seeded)
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

MAGIC = b"MM01"
_HEADER = struct.Struct(">4sc3H")


def make_fake_media(kind: str, width: int, height: int, n_frames: int, seed: int) -> bytes:
    """Deterministic fake media blob (kind ∈ {'I','A','V'})."""
    rng = np.random.RandomState(seed)
    payload = rng.randint(0, 256, size=min(width * height, 4096), dtype=np.uint8)
    return _HEADER.pack(MAGIC, kind.encode(), width, height, n_frames) + payload.tobytes()


def parse_header(blob: bytes) -> tuple[str, int, int, int]:
    magic, kind, w, h, f = _HEADER.unpack_from(blob)
    if magic != MAGIC:
        raise ValueError("not a synthetic media blob")
    return kind.decode(), w, h, f


class ImageFeatureBatcher:
    """Actor-pool stage: binary image column → (width, height, mean_pixel).

    With a real decoder (PIL/opencv — not in this container) ``_decode``
    would produce an ndarray; the synthetic path parses the deterministic
    container instead. Import-gated so dropping a real decoder in changes
    nothing upstream.
    """

    def __init__(self, media_col: str = "media") -> None:
        self.media_col = media_col
        try:  # library absent in this container; gate, don't require
            import PIL.Image as _pil_image  # type: ignore

            self._pil = _pil_image
        except ImportError:
            self._pil = None

    def _decode(self, blob: bytes) -> tuple[int, int, float]:
        if blob[:4] == MAGIC:
            # Synthetic container — always decodable, PIL or not.
            kind, w, h, _ = parse_header(blob)
            if kind != "I":
                raise ValueError(f"expected image blob, got kind={kind}")
            pixels = np.frombuffer(blob[_HEADER.size :], dtype=np.uint8)
            return w, h, float(pixels.mean()) if pixels.size else 0.0
        if self._pil is not None:  # pragma: no cover - PIL absent here
            import io

            img = self._pil.open(io.BytesIO(blob))
            arr = np.asarray(img.convert("L"), dtype=np.float64)
            return img.width, img.height, float(arr.mean()) if arr.size else 0.0
        raise NotImplementedError(
            "real image decode needs PIL, which is absent in this environment"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, means = [], [], []
        for blob in batch.column(self.media_col).to_pylist():
            w, h, m = self._decode(blob)
            widths.append(w)
            heights.append(h)
            means.append(round(m, 4))
        return (
            batch.append_column("img_width", pa.array(widths, pa.int32()))
            .append_column("img_height", pa.array(heights, pa.int32()))
            .append_column("img_mean_pixel", pa.array(means, pa.float64()))
        )


class AudioFeatureBatcher:
    """Actor-pool stage: binary audio column → (n_samples, mean_amplitude,
    rms). Same import-gating contract as ImageFeatureBatcher: the synthetic
    container always decodes; real formats would need an audio lib (absent
    in this container), so non-container blobs raise NotImplementedError."""

    def __init__(self, media_col: str = "media") -> None:
        self.media_col = media_col
        try:  # library absent in this container; gate, don't require
            import soundfile as _soundfile  # type: ignore

            self._sf = _soundfile
        except ImportError:
            self._sf = None

    def _decode(self, blob: bytes) -> tuple[int, float, float]:
        if blob[:4] != MAGIC:
            if self._sf is not None:
                import io

                data, _rate = self._sf.read(io.BytesIO(blob))
                data = np.asarray(data, dtype=np.float64)
                if data.ndim > 1:  # downmix channels
                    data = data.mean(axis=1)
                if not data.size:
                    return 0, 0.0, 0.0
                return (
                    int(data.size),
                    float(np.abs(data).mean()),
                    float(np.sqrt((data**2).mean())),
                )
            raise NotImplementedError(
                "real audio decode needs an audio library, absent here"
            )
        kind, _, _, _ = parse_header(blob)
        if kind != "A":
            raise ValueError(f"expected audio blob, got kind={kind}")
        samples = np.frombuffer(blob[_HEADER.size :], dtype=np.uint8)
        if not samples.size:
            return 0, 0.0, 0.0
        centered = samples.astype(np.float64) - 128.0
        return (
            int(samples.size),
            float(np.abs(centered).mean()),
            float(np.sqrt((centered**2).mean())),
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ns, means, rmss = [], [], []
        for blob in batch.column(self.media_col).to_pylist():
            n, m, r = self._decode(blob)
            ns.append(n)
            means.append(round(m, 4))
            rmss.append(round(r, 4))
        return (
            batch.append_column("n_samples", pa.array(ns, pa.int64()))
            .append_column("mean_amplitude", pa.array(means, pa.float64()))
            .append_column("rms_amplitude", pa.array(rmss, pa.float64()))
        )


class FrameSampleBatcher:
    """Actor-pool stage: 'video' blobs → one row per sampled frame index
    (flat-map shape: output rows ≠ input rows). Stride sampling, stub
    'decode' emits the frame index + a deterministic frame checksum."""

    def __init__(self, media_col: str = "media", stride: int = 10) -> None:
        self.media_col = media_col
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        out_id, out_frame, out_sum = [], [], []
        for media_id, blob in zip(ids, batch.column(self.media_col).to_pylist()):
            kind, _, _, n_frames = parse_header(blob)
            if kind != "V":
                continue
            payload = np.frombuffer(blob[_HEADER.size :], dtype=np.uint8)
            for frame in range(0, n_frames, self.stride):
                out_id.append(media_id)
                out_frame.append(frame)
                # Stand-in for per-frame decode: deterministic slice checksum.
                sl = payload[frame % max(1, len(payload)) :: 7]
                out_sum.append(int(sl.sum()) if sl.size else 0)
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.int64()),
                "frame_index": pa.array(out_frame, pa.int32()),
                "frame_checksum": pa.array(out_sum, pa.int64()),
            }
        )
