"""Multimodal columns: opaque binary payloads + typed metadata, decoded
by actor-pool stages.

The Ray-side plumbing is REAL and tested: schema, small-batch actor
pool (large binary rows need small batches so batch x concurrency fits
worker heap — ray_guide "Memory-aware"), deterministic output layout.
The actual codec is STUBBED: the image/audio libraries are not in this
container, so when PIL / soundfile are unavailable each stage derives a
deterministic fake feature vector from the payload bytes (clearly
marked). Swap ``_decode_real`` in when the codec libs exist.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

FEATURE_DIM = 32

def multimodal_schema(kind: str = "image") -> pa.Schema:
    """Canonical layout for a multimodal table."""
    meta = {
        "image": [("width", pa.int32()), ("height", pa.int32()), ("format", pa.string())],
        "audio": [("sample_rate", pa.int32()), ("n_samples", pa.int64()), ("format", pa.string())],
    }[kind]
    return pa.schema(
        [("doc_id", pa.string()), ("payload", pa.binary())]
        + meta
        + [("source", pa.string())]
    )


def _fake_features(payloads: list[bytes | None], dim: int) -> np.ndarray:
    """Deterministic stand-in decode: feature vector from payload bytes.
    NOT a real decode — a fixed, testable fake (see module docstring)."""
    out = np.zeros((len(payloads), dim), dtype=np.float32)
    for i, p in enumerate(payloads):  # payload-bounded; batches are small
        if not p:
            continue
        arr = np.frombuffer(p, dtype=np.uint8)
        reps = -(-dim // max(1, len(arr)))
        out[i] = np.tile(arr, reps)[:dim].astype(np.float32) / 255.0
    return out


class ImageFeatureStage:
    """map_batches(ImageFeatureStage, concurrency=N, batch_size=SMALL,
    batch_format='pyarrow') — decode + resize + feature-extract.

    Real path requires PIL; otherwise the deterministic fake is used and
    ``decoder`` column records which ran."""

    def __init__(self, *, feature_dim: int = FEATURE_DIM, target_size=(32, 32)):
        self.feature_dim = feature_dim
        self.target_size = target_size
        try:
            from PIL import Image  # noqa: F401

            self._pil = True
        except ImportError:
            self._pil = False

    def _decode_real(self, payloads):
        from io import BytesIO

        from PIL import Image

        out = np.zeros((len(payloads), self.feature_dim), dtype=np.float32)
        for i, p in enumerate(payloads):
            img = Image.open(BytesIO(p)).convert("L").resize(self.target_size)
            v = np.asarray(img, dtype=np.float32).ravel() / 255.0
            out[i] = np.resize(v, self.feature_dim)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        feats = (
            self._decode_real(payloads)
            if self._pil
            else _fake_features(payloads, self.feature_dim)
        )
        return batch.append_column(
            "features", pa.array(list(feats))
        ).append_column(
            "decoder",
            pa.array(["pil" if self._pil else "stub"] * len(payloads), pa.string()),
        )


class AudioFeatureStage:
    """Frame-sample + feature-extract for audio payloads; real path
    requires soundfile, else the deterministic fake."""

    def __init__(self, *, feature_dim: int = FEATURE_DIM, frame_stride: int = 1024):
        self.feature_dim = feature_dim
        self.frame_stride = frame_stride
        try:
            import soundfile  # noqa: F401

            self._sf = True
        except ImportError:
            self._sf = False

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        if self._sf:
            raise NotImplementedError(
                "real audio decode path not exercised in this container"
            )
        feats = _fake_features(payloads, self.feature_dim)
        return batch.append_column(
            "features", pa.array(list(feats))
        ).append_column("decoder", pa.array(["stub"] * len(payloads), pa.string()))


def synthesize_image_batch(
    batch: pa.Table, id_col: str = "doc_id", *, algo: str = "blake2b"
) -> pa.Table:
    """Deterministic fake image table conforming to
    ``multimodal_schema('image')``: payload bytes and dimensions derive
    from an 8-byte hash of the id, so any worker produces identical
    rows. Stands in for a real binary column while exercising the REAL
    plumbing (schema, small batches, actor-pool decode). ``algo``:
    'blake2b' (default) or 'sha256' — the sha256 variant exists so a
    DuckDB oracle (which has sha256 but not blake2b) can recompute the
    payload byte content exactly."""
    import hashlib

    ids = batch[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    payloads, widths, heights = [], [], []
    for i in ids.to_pylist():
        if algo == "sha256":
            seed = hashlib.sha256(str(i).encode()).digest()[:8]
        else:
            seed = hashlib.blake2b(str(i).encode(), digest_size=8).digest()
        w = 16 + seed[0] % 48
        h = 16 + seed[1] % 48
        reps = -(-(w * h) // 8)
        payloads.append((seed * reps)[: w * h])
        widths.append(w)
        heights.append(h)
    src = (
        batch["source"]
        if "source" in batch.column_names
        else pa.array(["synthetic"] * len(payloads), pa.string())
    )
    return pa.table(
        {
            "doc_id": ids,
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "format": pa.array(["fake-gray8"] * len(payloads), pa.string()),
            "source": src,
        },
        schema=multimodal_schema("image"),
    )
