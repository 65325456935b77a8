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

def _round6_away(x):
    """Round half-AWAY-from-zero at 6 decimals (DuckDB ROUND semantics).
    Channel means/brightness are dyadic fractions (integer sums over
    power-of-two-ish pixel counts), so exact .5 ties at the 6th decimal are
    common — np.round's half-even flips them vs the SQL oracle."""
    return np.floor(np.asarray(x, dtype=np.float64) * 1e6 + 0.5) / 1e6


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
    (PIL/ffmpeg/torchvision — absent in this container). The decode kernel is an
    INJECTION SEAM: pass ``decoder_factory`` — a zero-arg callable returning a
    ``(payload: bytes, media_type: str) -> np.ndarray`` decode function — and it
    is invoked once per actor in ``__init__`` (the load-once pattern); the
    returned callable runs per payload. Without a factory, ``strict=True``
    raises NotImplementedError exactly where the real library call belongs; the
    default deterministic fake keeps the plumbing testable: "features" are 8
    moments of the payload bytes, "frames" a fixed-stride byte sample.
    """

    def __init__(
        self,
        feature_dim: int = 8,
        frame_stride: int = 512,
        strict: bool = False,
        decoder_factory=None,
    ):
        self.feature_dim = feature_dim
        self.frame_stride = frame_stride
        self.strict = strict
        # the real-decoder seam: factory runs ONCE per actor (model/codec load);
        # e.g. decoder_factory=lambda: PILDecoder(weights_path).decode
        self._decoder = decoder_factory() if decoder_factory is not None else None

    def _decode(self, payload: bytes, media_type: str) -> np.ndarray:
        if self._decoder is not None:
            return np.asarray(self._decoder(payload, media_type), dtype=np.float64)
        if self.strict:
            raise NotImplementedError(
                "real image/audio/video decoding requires PIL/ffmpeg — not available "
                "in this environment; inject decoder_factory= or use the "
                "deterministic fake (strict=False)"
            )
        arr = np.frombuffer(payload, dtype=np.uint8)
        n = len(arr)
        if n == 0:
            return np.zeros(self.feature_dim)
        # Exact integer moments: mean((b/255)^m) = sum(b^m) / (255^m * n),
        # rounded half-away at 9 decimals IN EXACT RATIONAL ARITHMETIC (via the
        # 256-bin byte histogram + Python big ints), so the value is a clean
        # <=1e9-denominator double the SQL oracle reproduces bit-for-bit —
        # float summation order can never perturb it.
        counts = np.bincount(arr, minlength=256).tolist()
        feats = []
        for m in range(1, self.feature_dim + 1):
            s = sum(c * v**m for v, c in enumerate(counts) if c)
            d = 255**m * n
            feats.append(((2 * s * 10**9 + d) // (2 * d)) / 1e9)
        return np.array(feats)

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


# ---------------------------------------------------------------------------
# Images: a REAL decode + resize path (raw RGB bitmaps need no external library)
# ---------------------------------------------------------------------------

IMG_W, IMG_H = 64, 48  # synthesized source bitmaps


def synthesize_image_batch(t: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Deterministic raw RGB24 bitmaps keyed by id (smooth gradients + a keyed
    square), byte-identical across runs — the stand-in for reading real blobs."""
    ids = np.asarray(t[id_col].to_numpy(zero_copy_only=False), dtype=np.int64)
    yy, xx = np.mgrid[0:IMG_H, 0:IMG_W]
    payloads = []
    for i in ids:
        r = ((xx * 255) // max(IMG_W - 1, 1)).astype(np.uint8)
        g = ((yy * 255) // max(IMG_H - 1, 1)).astype(np.uint8)
        b = np.full((IMG_H, IMG_W), (i * 37) % 256, dtype=np.uint8)
        x0, y0 = int(i % (IMG_W - 16)), int((i * 7) % (IMG_H - 12))
        r[y0 : y0 + 12, x0 : x0 + 16] = 255 - r[y0 : y0 + 12, x0 : x0 + 16]
        payloads.append(np.stack([r, g, b], axis=-1).tobytes())
    n = len(ids)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(np.full(n, IMG_W, dtype=np.int32)),
            "height": pa.array(np.full(n, IMG_H, dtype=np.int32)),
        }
    )


class ImageResizeActor:
    """REAL image decode + resize — no stub: raw RGB24 decodes with
    ``np.frombuffer().reshape(h, w, 3)`` and resizing is integer-factor
    block-mean pooling (the standard antialiased downsample), plus per-channel
    mean/std features. Output drops the source payload and carries the resized
    bitmap (the training-data layout: thumbnail + stats)."""

    def __init__(self, out_w: int = 16, out_h: int = 12):
        self.out_w = out_w
        self.out_h = out_h

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        ws = t["width"].to_numpy(zero_copy_only=False)
        hs = t["height"].to_numpy(zero_copy_only=False)
        thumbs, means, stds = [], [], []
        for p, w, h in zip(payloads, ws, hs):
            img = np.frombuffer(p, dtype=np.uint8).reshape(int(h), int(w), 3)
            fy, fx = int(h) // self.out_h, int(w) // self.out_w
            crop = img[: fy * self.out_h, : fx * self.out_w]
            pooled = (
                crop.reshape(self.out_h, fy, self.out_w, fx, 3)
                .mean(axis=(1, 3))
                .round()
                .astype(np.uint8)
            )
            thumbs.append(pooled.tobytes())
            # Channel stats via EXACT integer sums (pixel values are uint8):
            # mean = s/n and std = sqrt(n*s2 - s^2)/n are then single
            # correctly-rounded float ops over exactly-representable ints —
            # bit-identical to a SQL replay, where a two-pass float np.std
            # would differ in the last ulp.
            v = img.reshape(-1, 3).astype(np.int64)
            n_px = v.shape[0]
            s = v.sum(axis=0)
            s2 = (v * v).sum(axis=0)
            means.append(_round6_away(s / n_px).tolist())
            stds.append(_round6_away(np.sqrt(n_px * s2 - s * s) / n_px).tolist())
        out = t.drop_columns(["payload"])
        out = out.append_column("thumb", pa.array(thumbs, pa.binary()))
        out = out.append_column("thumb_w", pa.array(np.full(len(thumbs), self.out_w, dtype=np.int32)))
        out = out.append_column("thumb_h", pa.array(np.full(len(thumbs), self.out_h, dtype=np.int32)))
        out = out.append_column("channel_mean", pa.array(means, pa.list_(pa.float64())))
        out = out.append_column("channel_std", pa.array(stds, pa.list_(pa.float64())))
        return out


def image_resize_stage(
    ds: "ray.data.Dataset",
    concurrency: int = 4,
    batch_size: int = 256,
    out_w: int = 16,
    out_h: int = 12,
) -> "ray.data.Dataset":
    return ds.map_batches(
        ImageResizeActor,
        fn_constructor_kwargs={"out_w": out_w, "out_h": out_h},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
    )


# ---------------------------------------------------------------------------
# Video: a REAL decode + frame-sample path (raw RGB frame stacks, no library)
# ---------------------------------------------------------------------------

VID_W, VID_H, VID_FRAMES = 32, 24, 8


def synthesize_video_batch(t: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Deterministic raw RGB24 frame stacks keyed by id (a gradient that shifts
    per frame — motion the sampler can measure), byte-identical across runs."""
    ids = np.asarray(t[id_col].to_numpy(zero_copy_only=False), dtype=np.int64)
    yy, xx = np.mgrid[0:VID_H, 0:VID_W]
    payloads = []
    for i in ids:
        frames = []
        for f in range(VID_FRAMES):
            shift = (int(i) + 3 * f) % VID_W
            r = (((xx + shift) % VID_W) * 255 // max(VID_W - 1, 1)).astype(np.uint8)
            g = ((yy * 255) // max(VID_H - 1, 1)).astype(np.uint8)
            b = np.full((VID_H, VID_W), (i * 11 + f * 29) % 256, dtype=np.uint8)
            frames.append(np.stack([r, g, b], axis=-1))
        payloads.append(np.stack(frames).tobytes())
    n = len(ids)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(np.full(n, VID_W, dtype=np.int32)),
            "height": pa.array(np.full(n, VID_H, dtype=np.int32)),
            "n_frames": pa.array(np.full(n, VID_FRAMES, dtype=np.int32)),
        }
    )


class VideoFrameSampleActor:
    """REAL video decode + frame sampling — no stub: the raw frame stack decodes
    with ``np.frombuffer().reshape(F, H, W, 3)``; every ``stride``-th frame is
    kept (the training-data keyframe-sampling layout), with per-sampled-frame
    mean brightness and a mean inter-frame motion score (abs frame delta)."""

    def __init__(self, stride: int = 3):
        self.stride = stride

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        ws = t["width"].to_numpy(zero_copy_only=False)
        hs = t["height"].to_numpy(zero_copy_only=False)
        fs = t["n_frames"].to_numpy(zero_copy_only=False)
        sampled, counts, bright, motion = [], [], [], []
        for p, w, h, f in zip(payloads, ws, hs, fs):
            vid = np.frombuffer(p, dtype=np.uint8).reshape(int(f), int(h), int(w), 3)
            keep = vid[:: self.stride]
            sampled.append(keep.tobytes())
            counts.append(len(keep))
            # Exact integer sums (cf. ImageResizeActor): one correctly-rounded
            # division per value keeps the doubles bit-identical to a SQL replay.
            px = keep.astype(np.int64).reshape(len(keep), -1)
            bright.append(_round6_away(px.sum(axis=1) / px.shape[1]).tolist())
            deltas = np.abs(np.diff(vid.astype(np.int64), axis=0))
            motion.append(
                float(_round6_away(int(deltas.sum()) / deltas.size))
                if len(vid) > 1
                else 0.0
            )
        out = t.drop_columns(["payload"])
        out = out.append_column("frames", pa.array(sampled, pa.binary()))
        out = out.append_column("n_sampled", pa.array(counts, pa.int32()))
        out = out.append_column(
            "frame_brightness", pa.array(bright, pa.list_(pa.float64()))
        )
        out = out.append_column("motion_score", pa.array(motion, pa.float64()))
        return out


def video_sample_stage(
    ds: "ray.data.Dataset",
    concurrency: int = 4,
    batch_size: int = 128,  # frame stacks are the heaviest payloads → small batches
    stride: int = 3,
) -> "ray.data.Dataset":
    return ds.map_batches(
        VideoFrameSampleActor,
        fn_constructor_kwargs={"stride": stride},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
    )


# ---------------------------------------------------------------------------
# Audio: a REAL decode + feature path (raw PCM needs no external library)
# ---------------------------------------------------------------------------

AUDIO_SAMPLE_RATE = 16_000
AUDIO_CLIP_SAMPLES = 4_000  # 0.25 s mono clips


def synthesize_audio_batch(t: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Deterministic 16-bit PCM mono clips keyed by id (two-partial sine mix):
    the stand-in for reading real audio blobs, byte-identical across runs.
    Vectorized: the whole batch's waveform matrix is built in one numpy op."""
    ids = np.asarray(t[id_col].to_numpy(zero_copy_only=False), dtype=np.int64)
    n = len(ids)
    f0 = (100.0 + (ids % 40) * 20.0)[:, None]  # 100..880 Hz fundamental
    ts = (np.arange(AUDIO_CLIP_SAMPLES, dtype=np.float64) / AUDIO_SAMPLE_RATE)[None, :]
    x = 0.6 * np.sin(2 * np.pi * f0 * ts) + 0.3 * np.sin(2 * np.pi * 2.5 * f0 * ts)
    pcm = (x * 0.5 * 32767.0).astype(np.int16)
    payloads = [row.tobytes() for row in pcm]
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "sample_rate": pa.array(np.full(n, AUDIO_SAMPLE_RATE, dtype=np.int32)),
            "n_samples": pa.array(np.full(n, AUDIO_CLIP_SAMPLES, dtype=np.int64)),
        }
    )


class AudioFeatureActor:
    """REAL audio decode + DSP features — no stub: raw int16 PCM decodes with
    ``np.frombuffer`` and the features are genuine signal processing (RMS,
    zero-crossing rate, spectral centroid, 4-band FFT energy ratios), batched
    through ONE rfft call per batch. The actor shape matches MediaDecodeActor:
    window/init state once per actor, per-batch vectorized work."""

    def __init__(self, sample_rate: int = AUDIO_SAMPLE_RATE, n_fft: int = 1024):
        self.sample_rate = sample_rate
        self.n_fft = n_fft
        self.window = np.hanning(n_fft)  # once per actor
        self.freqs = np.fft.rfftfreq(n_fft, d=1.0 / sample_rate)

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        sigs = [
            np.frombuffer(p, dtype=np.int16).astype(np.float64) / 32768.0
            for p in payloads
        ]
        n = len(sigs)
        rms = np.array([float(np.sqrt(np.mean(s * s))) if len(s) else 0.0 for s in sigs])
        zcr = np.array(
            [
                float(np.mean(np.abs(np.diff(np.signbit(s))))) if len(s) > 1 else 0.0
                for s in sigs
            ]
        )
        # batched FFT over the (padded/truncated) first n_fft samples
        frames = np.zeros((n, self.n_fft))
        for i, s in enumerate(sigs):
            m = min(len(s), self.n_fft)
            frames[i, :m] = s[:m]
        spec = np.abs(np.fft.rfft(frames * self.window[None, :], axis=1))
        power = spec.sum(axis=1)
        power[power == 0] = 1.0
        centroid = (spec * self.freqs[None, :]).sum(axis=1) / power
        nb = spec.shape[1] // 4
        bands = np.stack(
            [spec[:, i * nb : (i + 1) * nb].sum(axis=1) / power for i in range(4)],
            axis=1,
        )
        out = t.drop_columns(["payload"])
        out = out.append_column("rms", pa.array(np.round(rms, 9)))
        out = out.append_column("zcr", pa.array(np.round(zcr, 9)))
        out = out.append_column("spectral_centroid_hz", pa.array(np.round(centroid, 6)))
        out = out.append_column(
            "band_energy", pa.array(np.round(bands, 9).tolist(), pa.list_(pa.float64()))
        )
        return out


class ImageEdgeActor:
    """Horizontal edge statistics — the blur/quality screen feature vision
    pipelines gate ingestion on. Raw RGB24 decodes per clip (np.frombuffer,
    same as ImageResizeActor), then the whole batch's red-channel |∂I/∂x|
    is one vectorized diff: edge_px counts gradients ≥ the threshold,
    grad_sum is the total absolute gradient. Both outputs are EXACT integers
    (uint8 pixel math), so the full-pixel SQL replay hashes bit-for-bit."""

    def __init__(self, threshold: int = 32):
        self.threshold = threshold

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        ws = t["width"].to_numpy(zero_copy_only=False)
        hs = t["height"].to_numpy(zero_copy_only=False)
        reds = [
            np.frombuffer(p, dtype=np.uint8).reshape(int(h), int(w), 3)[:, :, 0]
            for p, w, h in zip(payloads, ws, hs)
        ]
        # uniform dims by construction → one batched diff
        stack = np.stack(reds).astype(np.int64)
        gx = np.abs(np.diff(stack, axis=2))
        edge_px = (gx >= self.threshold).sum(axis=(1, 2)).astype(np.int64)
        grad_sum = gx.sum(axis=(1, 2)).astype(np.int64)
        out = t.drop_columns(["payload"])
        out = out.append_column("edge_px", pa.array(edge_px, pa.int64()))
        out = out.append_column("grad_sum", pa.array(grad_sum, pa.int64()))
        return out


class VideoFlickerActor:
    """Frame-to-frame brightness flicker — the broken-encode / strobe screen
    video curation runs. The whole batch's frame stacks decode with ONE
    frombuffer+reshape each; per-frame totals are one vectorized sum, and a
    flicker is a |ΔS| jump above `threshold` per pixel. Outputs are EXACT
    integers; on the synthesized corpus the per-frame total moves only
    through the blue channel's mod-256 sawtooth (the red gradient is a
    cyclic shift — sum-invariant — and green is static), so the oracle
    replays the jumps in closed form without touching pixels."""

    def __init__(self, threshold_per_px: int = 100):
        self.threshold_per_px = threshold_per_px

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        ws = t["width"].to_numpy(zero_copy_only=False)
        hs = t["height"].to_numpy(zero_copy_only=False)
        fs = t["n_frames"].to_numpy(zero_copy_only=False)
        n_flicker, max_jump = [], []
        for p, w, h, f in zip(payloads, ws, hs, fs):
            stack = np.frombuffer(p, dtype=np.uint8).reshape(
                int(f), int(h), int(w), 3
            )
            s = stack.astype(np.int64).sum(axis=(1, 2, 3))
            d = np.abs(np.diff(s))
            thr = self.threshold_per_px * int(h) * int(w)
            n_flicker.append(int((d > thr).sum()))
            max_jump.append(int(d.max()) if len(d) else 0)
        out = t.drop_columns(["payload"])
        out = out.append_column(
            "n_flicker", pa.array(np.array(n_flicker, np.int64), pa.int64())
        )
        out = out.append_column(
            "max_jump", pa.array(np.array(max_jump, np.int64), pa.int64())
        )
        return out


class ImageLumaHistActor:
    """Per-image luminance histogram — the exposure screen (all-dark /
    blown-out detection) vision curation runs before training. Integer luma
    (r+g+b)//3 over the stacked batch, one bincount per image via a single
    offset-bincount over the whole batch; zero bins are emitted explicitly
    so the output is a dense |images|×bins long format. Exact integers —
    the full-pixel SQL replay hashes bit-for-bit."""

    def __init__(self, bins: int = 8):
        self.bins = bins

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        ws = t["width"].to_numpy(zero_copy_only=False)
        hs = t["height"].to_numpy(zero_copy_only=False)
        ids = t["media_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        imgs = [
            np.frombuffer(p, dtype=np.uint8).reshape(int(h), int(w), 3)
            for p, w, h in zip(payloads, ws, hs)
        ]
        stack = np.stack(imgs).astype(np.int64)  # uniform dims by construction
        luma = stack.sum(axis=3) // 3
        binix = luma // (256 // self.bins)
        n = len(ids)
        # one bincount for the whole batch: offset each image's bins by i*bins
        flat = (np.arange(n)[:, None, None] * self.bins + binix).ravel()
        counts = np.bincount(flat, minlength=n * self.bins).reshape(n, self.bins)
        return pa.table(
            {
                "media_id": pa.array(np.repeat(ids, self.bins), pa.int64()),
                "bin": pa.array(np.tile(np.arange(self.bins, dtype=np.int64), n)),
                "n_px": pa.array(counts.ravel().astype(np.int64), pa.int64()),
            }
        )


class AudioPitchActor:
    """Autocorrelation pitch tracking — the f0 estimate VAD/diarization
    pipelines key on. The whole batch's ACF comes from ONE zero-padded
    rfft→|·|²→irfft round trip (Wiener–Khinchin; no per-lag loops), the peak
    is searched over the 50–1000 Hz lag window, and the outputs are pure
    integers (argmax lag + round-half-up f0 millihertz) so the class-replay
    oracle is exact with no float-hash risk. Actor shape matches
    AudioFeatureActor: constants once per actor, vectorized per batch."""

    def __init__(
        self,
        sample_rate: int = AUDIO_SAMPLE_RATE,
        min_f0_hz: int = 50,
        max_f0_hz: int = 1000,
    ):
        self.sample_rate = sample_rate
        self.lo_lag = sample_rate // max_f0_hz  # shortest period searched
        self.hi_lag = sample_rate // min_f0_hz  # longest period searched

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        n = len(payloads)
        sigs = [
            np.frombuffer(p, dtype=np.int16).astype(np.float64) / 32768.0
            for p in payloads
        ]
        width = max((len(s) for s in sigs), default=0)
        frames = np.zeros((n, width))
        for i, s in enumerate(sigs):
            frames[i, : len(s)] = s
        nfft = 1 << int(np.ceil(np.log2(max(2 * width, 2))))
        spec = np.fft.rfft(frames, n=nfft, axis=1)
        acf = np.fft.irfft(spec * np.conj(spec), n=nfft, axis=1)[:, : width or 1]
        hi = min(self.hi_lag, acf.shape[1] - 1)
        window = acf[:, self.lo_lag : hi + 1]
        lag = (
            np.argmax(window, axis=1).astype(np.int64) + self.lo_lag
            if window.shape[1]
            else np.zeros(n, np.int64)
        )
        lag = np.maximum(lag, 1)
        f0_milli = (2 * self.sample_rate * 1000 + lag) // (2 * lag)
        out = t.drop_columns(["payload"])
        out = out.append_column("lag", pa.array(lag, pa.int64()))
        out = out.append_column("f0_milli", pa.array(f0_milli, pa.int64()))
        return out


def audio_feature_stage(
    ds: "ray.data.Dataset",
    concurrency: int = 4,
    batch_size: int = 256,
) -> "ray.data.Dataset":
    return ds.map_batches(
        AudioFeatureActor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
    )


def decode_stage(
    ds: "ray.data.Dataset",
    concurrency: int = 4,
    batch_size: int = 256,  # binary payloads dominate memory → small batches
    strict: bool = False,
    decoder_factory=None,
) -> "ray.data.Dataset":
    return ds.map_batches(
        MediaDecodeActor,
        fn_constructor_kwargs={"strict": strict, "decoder_factory": decoder_factory},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
    )


# ---------------------------------------------------------------------------
# Image augmentation: flip + center-crop + integer luma stats (REAL kernels)
# ---------------------------------------------------------------------------

CROP_X0, CROP_Y0, CROP_W, CROP_H = 16, 12, 32, 24
_LUMA = (299, 587, 114)  # integer BT.601 weights, // 1000


def _decode_bin_stack(bin_col, shape: tuple[int, ...]) -> np.ndarray:
    """Whole-batch zero-copy decode of an equal-length binary column: reshape
    the Arrow data buffer directly (values are stored back-to-back). Falls back
    to a per-row loop only for ragged payloads."""
    arr = bin_col.combine_chunks() if isinstance(bin_col, pa.ChunkedArray) else bin_col
    n = len(arr)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[arr.offset : arr.offset + n + 1]
    lens = np.diff(offs.astype(np.int64))
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    want = int(np.prod(shape))
    if n and (lens == want).all():
        return data[offs[0] : offs[0] + n * want].reshape((n,) + shape)
    return np.stack(
        [np.frombuffer(arr[i].as_py(), dtype=np.uint8).reshape(shape) for i in range(n)]
    )


class ImageAugmentActor:
    """REAL augmentation kernels over raw RGB24 bitmaps — whole-batch numpy:
    deterministic horizontal flip (media_id odd), fixed center crop, integer
    BT.601 luma, exact 4-bin gray histogram + exact-integer gray mean. The
    training-data aug layout: geometry columns + stats, payload dropped."""

    def __init__(self, crop=(CROP_X0, CROP_Y0, CROP_W, CROP_H)):
        self.x0, self.y0, self.cw, self.ch = crop

    def __call__(self, t: pa.Table) -> pa.Table:
        h = int(t["height"][0].as_py())
        w = int(t["width"][0].as_py())
        imgs = _decode_bin_stack(t["payload"], (h, w, 3))
        ids = t["media_id"].to_numpy(zero_copy_only=False)
        flip = (ids % 2).astype(bool)
        flipped = np.where(flip[:, None, None, None], imgs[:, :, ::-1, :], imgs)
        crop = flipped[
            :, self.y0 : self.y0 + self.ch, self.x0 : self.x0 + self.cw, :
        ].astype(np.int64)
        luma = (
            _LUMA[0] * crop[..., 0] + _LUMA[1] * crop[..., 1] + _LUMA[2] * crop[..., 2]
        ) // 1000
        m = luma.reshape(len(imgs), -1)
        n_px = m.shape[1]
        gray_mean = _round6_away(m.sum(axis=1) / n_px)
        q = m >> 6  # 4 bins of width 64
        hist = np.stack([(q == k).sum(axis=1) for k in range(4)], axis=1)
        out = t.drop_columns(["payload"])
        out = out.append_column("flipped", pa.array(flip))
        out = out.append_column("gray_mean", pa.array(gray_mean, pa.float64()))
        for k in range(4):
            out = out.append_column(f"hist_{k}", pa.array(hist[:, k], pa.int64()))
        return out


def image_augment_stage(
    ds: "ray.data.Dataset", concurrency: int = 4, batch_size: int = 256
) -> "ray.data.Dataset":
    return ds.map_batches(
        ImageAugmentActor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
    )


# ---------------------------------------------------------------------------
# Video scene-cut detection over inter-frame deltas (REAL kernels)
# ---------------------------------------------------------------------------

SCENE_CUT_THRESHOLD = 30  # mean-abs-delta per pixel-channel; compare in exact ints


class VideoSceneActor:
    """REAL scene analysis over raw RGB24 frame stacks — whole-batch numpy:
    per-transition exact integer abs-delta sums, cut decisions compared in
    integers (sum > T * size, no float boundary), first-max peak transition."""

    def __init__(self, threshold: int = SCENE_CUT_THRESHOLD):
        self.threshold = int(threshold)

    def __call__(self, t: pa.Table) -> pa.Table:
        h = int(t["height"][0].as_py())
        w = int(t["width"][0].as_py())
        f = int(t["n_frames"][0].as_py())
        vids = _decode_bin_stack(t["payload"], (f, h, w, 3)).astype(np.int64)
        deltas = np.abs(np.diff(vids, axis=1))  # (n, f-1, h, w, 3)
        s = deltas.reshape(len(vids), f - 1, -1).sum(axis=2)  # exact ints
        denom = h * w * 3
        n_cuts = (s > self.threshold * denom).sum(axis=1).astype(np.int64)
        peak = s.argmax(axis=1).astype(np.int32)  # first max on ties
        rows = np.arange(len(vids))
        peak_motion = _round6_away(s[rows, peak] / denom)
        mean_motion = _round6_away(s.sum(axis=1) / (denom * (f - 1)))
        out = t.drop_columns(["payload"])
        out = out.append_column("n_cuts", pa.array(n_cuts, pa.int64()))
        out = out.append_column("peak_frame", pa.array(peak, pa.int32()))
        out = out.append_column("peak_motion", pa.array(peak_motion, pa.float64()))
        out = out.append_column("mean_motion", pa.array(mean_motion, pa.float64()))
        return out


def video_scene_stage(
    ds: "ray.data.Dataset", concurrency: int = 4, batch_size: int = 128
) -> "ray.data.Dataset":
    return ds.map_batches(
        VideoSceneActor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
    )


class AudioVADActor:
    """Energy-based voice-activity detection over raw int16 PCM — EXACT
    integer math end to end: per 10 ms frame the energy is an int64 sum of
    int32 squares, and a frame is voiced iff
    ``energy · n_frames · 2 > Σ energies`` (half the clip's mean energy,
    division-free). Emits per clip the voiced-frame count, the number of
    contiguous voiced segments, the longest segment and the exact
    voiced-ratio in micro units.

    Same actor shape as AudioFeatureActor: constants once per ``__init__``,
    whole-batch vectorized ``__call__`` (equal-length clips decode as ONE
    frombuffer + reshape; energies via a single reshaped square-sum)."""

    def __init__(self, frame_samples: int = 160):
        self.frame_samples = frame_samples

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        n = len(payloads)
        if n == 0:
            return pa.table(
                {
                    "media_id": pa.array([], pa.int64()),
                    "n_frames": pa.array([], pa.int64()),
                    "n_voiced": pa.array([], pa.int64()),
                    "n_segments": pa.array([], pa.int64()),
                    "longest_segment": pa.array([], pa.int64()),
                    "voiced_ratio_micro": pa.array([], pa.int64()),
                }
            )
        clip_len = len(payloads[0]) // 2
        pcm = np.frombuffer(b"".join(payloads), dtype=np.int16).reshape(n, clip_len)
        f = self.frame_samples
        nf = clip_len // f
        x = pcm[:, : nf * f].astype(np.int32)
        e = (x.astype(np.int64) * x).reshape(n, nf, f).sum(axis=2)
        tot = e.sum(axis=1)
        voiced = (2 * nf) * e > tot[:, None]
        n_voiced = voiced.sum(axis=1).astype(np.int64)
        rising = np.diff(voiced.astype(np.int8), axis=1) > 0
        n_seg = (voiced[:, 0].astype(np.int64)) + rising.sum(axis=1)
        # longest run per row: cumulative count that resets at gaps
        idx = np.arange(nf)[None, :] * np.ones((n, 1), np.int64)
        last_gap = np.maximum.accumulate(np.where(~voiced, idx, -1), axis=1)
        runlen = np.where(voiced, idx - last_gap, 0)
        longest = runlen.max(axis=1).astype(np.int64)
        return pa.table(
            {
                "media_id": t["media_id"],
                "n_frames": pa.array(np.full(n, nf, np.int64)),
                "n_voiced": pa.array(n_voiced),
                "n_segments": pa.array(n_seg.astype(np.int64)),
                "longest_segment": pa.array(longest),
                "voiced_ratio_micro": pa.array(n_voiced * 1_000_000 // nf),
            }
        )


def audio_vad_stage(
    ds: "ray.data.Dataset",
    concurrency: int = 4,
    batch_size: int = 256,
) -> "ray.data.Dataset":
    return ds.map_batches(
        AudioVADActor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
    )


def synthesize_speech_batch(t: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Deterministic 'speech-like' PCM clips: the two-partial sine mix of
    `synthesize_audio_batch` gated by a per-clip burst envelope — frame f
    (10 ms) is active iff ``(f + k) % period(k) < duty(k)`` with
    period = 3 + k%5 and duty = 1 + k%(period−1), k = id % 40 — so clips
    carry real silence gaps with class-varying cadence. Everything depends
    only on ``id % 40`` (same class key as the audio features), keeping the
    class-representative oracle trick valid. Byte-identical across runs."""
    ids = np.asarray(t[id_col].to_numpy(zero_copy_only=False), dtype=np.int64)
    n = len(ids)
    f0 = (100.0 + (ids % 40) * 20.0)[:, None]
    ts = (np.arange(AUDIO_CLIP_SAMPLES, dtype=np.float64) / AUDIO_SAMPLE_RATE)[None, :]
    x = 0.6 * np.sin(2 * np.pi * f0 * ts) + 0.3 * np.sin(2 * np.pi * 2.5 * f0 * ts)
    frame = (np.arange(AUDIO_CLIP_SAMPLES) // 160)[None, :]
    k = (ids % 40)[:, None]
    period = 3 + k % 5  # 3..7-frame burst cycle per class
    duty = 1 + k % (period - 1 + (period <= 1))  # 1..period-1 active frames
    env = (((frame + k) % period) < duty).astype(np.float64)
    pcm = (x * env * 0.5 * 32767.0).astype(np.int16)
    payloads = [row.tobytes() for row in pcm]
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "sample_rate": pa.array(np.full(n, AUDIO_SAMPLE_RATE, dtype=np.int32)),
            "n_samples": pa.array(np.full(n, AUDIO_CLIP_SAMPLES, dtype=np.int64)),
        }
    )
