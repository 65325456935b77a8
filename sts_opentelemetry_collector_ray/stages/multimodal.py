"""Multimodal column plumbing — opaque binary payloads with typed metadata.

Image/audio/video decode libraries are not available in this environment, so the
DECODE KERNEL IS STUBBED (deterministic fake features, clearly marked) while the
Ray-side plumbing is real and tested: binary-column schema, small-batch actor-pool
stages (a decoder is the canonical expensive-`__init__` stage), and the output
layout a feature-extraction pipeline would write.

Scale notes baked into the stage defaults: binary payloads dominate block size, so
``batch_size`` is small (256) and the actor pool holds the "model" once per actor.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("payload", pa.binary()),
        ("media_type", pa.string()),  # image | audio | video
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_bytes", pa.int64()),
    ]
)


def synthesize_media_batch(t: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Deterministic fake media payloads derived from document text — stands in for
    reading real blobs; byte-identical across runs."""
    ids = t[id_col].to_numpy(zero_copy_only=False)
    texts = t[text_col].to_pylist()
    payloads = [str(x).encode("utf-8")[:4096] for x in texts]
    mt = np.array(["image", "audio", "video"], dtype=object)[
        (ids % 3).astype(np.int64)
    ]
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(mt, pa.string()),
            "width": pa.array((ids % 640 + 1).astype(np.int32)),
            "height": pa.array((ids % 480 + 1).astype(np.int32)),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        }
    )


class MediaDecodeActor:
    """Actor-pool decode/feature-extract stage.

    ``__init__`` is where a real pipeline loads the decoder/model ONCE per actor
    (PIL/ffmpeg/torchvision — absent in this container). ``strict=True`` raises
    NotImplementedError from the decode kernel, exactly where the real library call
    belongs; the default deterministic fake keeps the plumbing testable: "features"
    are 8 moments of the payload bytes, "frames" a fixed-stride byte sample.
    """

    def __init__(self, feature_dim: int = 8, frame_stride: int = 512, strict: bool = False):
        self.feature_dim = feature_dim
        self.frame_stride = frame_stride
        self.strict = strict
        # real pipeline: self.model = load_model(...); self.decoder = ...

    def _decode(self, payload: bytes, media_type: str) -> np.ndarray:
        if self.strict:
            raise NotImplementedError(
                "real image/audio/video decoding requires PIL/ffmpeg — not available "
                "in this environment; deterministic fake used when strict=False"
            )
        arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
        if len(arr) == 0:
            return np.zeros(self.feature_dim)
        feats = []
        for m in range(1, self.feature_dim + 1):
            feats.append(float(((arr / 255.0) ** m).mean()))
        return np.round(np.array(feats), 9)

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        mts = t["media_type"].to_pylist()
        feats = [self._decode(p, m) for p, m in zip(payloads, mts)]
        frames = [
            p[:: self.frame_stride][:16] if m == "video" else None
            for p, m in zip(payloads, mts)
        ]
        out = t.drop_columns(["payload"])  # decoded stages drop the heavy payload
        out = out.append_column(
            "features", pa.array([f.tolist() for f in feats], pa.list_(pa.float64()))
        )
        out = out.append_column("frame_sample", pa.array(frames, pa.binary()))
        return out


def decode_stage(
    ds: "ray.data.Dataset",
    concurrency: int = 4,
    batch_size: int = 256,  # binary payloads dominate memory → small batches
    strict: bool = False,
) -> "ray.data.Dataset":
    return ds.map_batches(
        MediaDecodeActor,
        fn_constructor_kwargs={"strict": strict},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
    )
