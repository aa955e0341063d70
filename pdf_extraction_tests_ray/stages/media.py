"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Media travel as ``binary`` columns with metadata; decode / feature-extract
/ resize / frame-sample run as actor-pool ``map_batches`` stages. The
actual codec work is STUBBED (image/audio libraries are not in this
container): ``DecodeMedia`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake decoder (seeded by the
payload hash) produces plausible shapes — the Ray-side plumbing (schema,
batch sizing for fat rows, actor signature, output layout) is real and
tested, and a real codec drops into ``_decode_real``.

Media table schema::

    media: doc_id:string, media_ref:string, media_type:string,
           payload:binary, meta:string (json)
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("media_type", pa.string()),  # 'image' | 'audio' | 'video'
        ("payload", pa.binary()),
        ("meta", pa.string()),
    ]
)

DECODED_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("media_type", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_frames", pa.int32()),
        ("feature", pa.list_(pa.float32())),  # pooled feature vector
    ]
)


def synth_media_table(doc_ids, refs, types, seed: int = 99) -> pa.Table:
    """Deterministic fake payloads for tests/bench (seeded by ref)."""
    payloads, metas = [], []
    for r, t in zip(refs, types):
        rng = np.random.default_rng(
            np.random.SeedSequence([seed, int.from_bytes(hashlib.md5(r.encode()).digest()[:4], "big")])
        )
        payloads.append(rng.integers(0, 256, size=int(rng.integers(256, 2048)), dtype=np.uint8).tobytes())
        metas.append(json.dumps({"codec": "fake", "type": t}))
    return pa.Table.from_arrays(
        [
            pa.array(list(doc_ids), pa.string()),
            pa.array(list(refs), pa.string()),
            pa.array(list(types), pa.string()),
            pa.array(payloads, pa.binary()),
            pa.array(metas, pa.string()),
        ],
        schema=MEDIA_SCHEMA,
    )


class DecodeMedia:
    """Actor-pool decode stage. Small ``batch_size`` is mandatory: payload
    rows are megabytes at real scale — batch bytes, not row count, bound
    worker heap (SURVEY.md §7.3.6)."""

    def __init__(self, fake: bool = False, feature_dim: int = 16):
        self.fake = fake
        self.feature_dim = feature_dim
        # real path would load codec handles here, once per actor:
        # self.cv2 = importlib.import_module("cv2")

    def _decode_real(self, payload: bytes, media_type: str):
        raise NotImplementedError(
            "real media decode requires image/audio libs not present in this "
            "environment; construct DecodeMedia(fake=True) for the plumbing path"
        )

    def _decode_fake(self, payload: bytes, media_type: str):
        h = hashlib.blake2b(payload, digest_size=16).digest()
        rng = np.random.default_rng(np.frombuffer(h, dtype=np.uint32))
        w = int(rng.integers(64, 1920))
        ht = int(rng.integers(64, 1080))
        frames = 1 if media_type == "image" else int(rng.integers(2, 64))
        feat = rng.standard_normal(self.feature_dim).astype(np.float32)
        return w, ht, frames, feat

    def __call__(self, batch: pa.Table) -> pa.Table:
        decode = self._decode_fake if self.fake else self._decode_real
        widths, heights, frames, feats = [], [], [], []
        for payload, mtype in zip(
            batch.column("payload").to_pylist(), batch.column("media_type").to_pylist()
        ):
            w, h, f, feat = decode(payload, mtype)
            widths.append(w)
            heights.append(h)
            frames.append(f)
            feats.append(feat)
        return pa.Table.from_arrays(
            [
                batch.column("doc_id"),
                batch.column("media_ref"),
                batch.column("media_type"),
                pa.array(widths, pa.int32()),
                pa.array(heights, pa.int32()),
                pa.array(frames, pa.int32()),
                pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
            ],
            schema=DECODED_SCHEMA,
        )


class ResizeImages:
    """Resize stage stub: recomputes target dims (aspect-preserving); the
    pixel work is the stubbed part."""

    def __init__(self, max_side: int = 512):
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        w = batch.column("width").to_numpy(zero_copy_only=False).astype(np.float64)
        h = batch.column("height").to_numpy(zero_copy_only=False).astype(np.float64)
        scale = np.minimum(1.0, self.max_side / np.maximum(w, h))
        return batch.append_column(
            "resized_width", pa.array((w * scale).round().astype(np.int32))
        ).append_column("resized_height", pa.array((h * scale).round().astype(np.int32)))


class SampleFrames:
    """Frame-sampling stage stub: deterministic uniform frame indices."""

    def __init__(self, n_samples: int = 8):
        self.n = n_samples

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx_lists = []
        for nf in batch.column("n_frames").to_pylist():
            if nf <= self.n:
                idx_lists.append(list(range(nf)))
            else:
                idx_lists.append(np.linspace(0, nf - 1, self.n).astype(int).tolist())
        return batch.append_column("frame_indices", pa.array(idx_lists, pa.list_(pa.int32())))


def decode_pipeline(media_ds, fake: bool = True, concurrency=(1, 4), batch_size: int = 16):
    """media table -> decoded features -> resize -> frame samples."""
    out = media_ds.map_batches(
        DecodeMedia,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    out = out.map_batches(
        ResizeImages, batch_format="pyarrow", batch_size=256, concurrency=concurrency
    )
    return out.map_batches(
        SampleFrames, batch_format="pyarrow", batch_size=256, concurrency=concurrency
    )
