"""Training-data operator tests: dedup family, text analysis, similarity search,
multimodal plumbing — each validated against a small brute-force oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from sts_opentelemetry_collector_ray.stages.dedup_docs import (
    _shingles,
    embedding_neardup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from sts_opentelemetry_collector_ray.stages.multimodal import (
    MediaDecodeActor,
    decode_stage,
    synthesize_media_batch,
)
from sts_opentelemetry_collector_ray.stages.similarity import brute_force_topk, lsh_topk
from sts_opentelemetry_collector_ray.stages.text_analysis import (
    LangIdActor,
    fingerprint_batch,
    quality_score_batch,
    token_count_batch,
)


@pytest.fixture(scope="module")
def docs():
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog",  # exact dup of 0
        "the quick brown fox jumps over a lazy dog",  # near dup of 0
        "completely different content about spark and ray data pipelines",
        "spark and ray data pipelines process completely different content",
        "short",
    ]
    return pd.DataFrame({"doc_id": range(len(texts)), "text": texts})


def test_exact_dedup(docs):
    ds = ray.data.from_pandas(docs)
    out = exact_dedup(ds).to_pandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == [0, 2, 3, 4, 5]  # doc 1 collapsed into 0


def test_minhash_lsh_finds_near_dups(docs):
    ds = ray.data.from_pandas(docs)
    pairs = minhash_lsh_pairs(ds, jaccard_threshold=0.5).to_pandas()
    got = set(map(tuple, pairs[["a", "b"]].to_numpy()))
    assert (0, 1) in got  # exact dup: jaccard 1.0
    assert (0, 2) in got or (1, 2) in got  # near dup
    assert not any(3 in p and 0 in p for p in got)
    # verified jaccard present and correct for the exact dup
    j01 = pairs[(pairs["a"] == 0) & (pairs["b"] == 1)]["jaccard"].iloc[0]
    assert j01 == 1.0


def test_ngram_jaccard_is_exact_oracle(docs):
    ds = ray.data.from_pandas(docs)
    got = ngram_jaccard_pairs(ds, threshold=0.3).to_pandas()
    got_pairs = set(map(tuple, got[["a", "b"]].to_numpy()))
    # brute-force oracle
    sh = [set(_shingles(t, 5).tolist()) for t in docs["text"]]
    exp = set()
    for i in range(len(sh)):
        for j in range(i + 1, len(sh)):
            union = len(sh[i] | sh[j])
            if union and len(sh[i] & sh[j]) / union >= 0.3:
                exp.add((i, j))
    assert got_pairs == exp


def test_audio_features_real_dsp():
    """The audio path is REAL DSP: a pure-tone clip's spectral centroid must land
    near its fundamental mixture, RMS matches the analytic value, determinism."""
    from sts_opentelemetry_collector_ray.stages.multimodal import (
        AUDIO_SAMPLE_RATE,
        AudioFeatureActor,
        synthesize_audio_batch,
    )

    t = pa.table({"doc_id": pa.array([0, 1, 2, 39], pa.int64())})
    media = synthesize_audio_batch(t)
    feats = AudioFeatureActor()(media)
    d = feats.to_pydict()
    # analytic RMS of 0.5*(0.6 sin + 0.3 sin incommensurate) ≈ 0.5*sqrt(0.18+0.045)
    import math

    expected_rms = 0.5 * math.sqrt(0.6**2 / 2 + 0.3**2 / 2)
    for r in d["rms"]:
        assert abs(r - expected_rms) < 0.02
    # centroid: energy at f0 and 2.5*f0 with 2:1 amplitude → centroid in (f0, 2.5 f0)
    for mid, c in zip(d["media_id"], d["spectral_centroid_hz"]):
        f0 = 100 + (mid % 40) * 20
        assert f0 * 0.8 < c < f0 * 2.6, (mid, f0, c)
        assert 0 < c < AUDIO_SAMPLE_RATE / 2
    # band energies normalized (≤1, sum≈1 over full spectrum coverage)
    for b in d["band_energy"]:
        assert all(0 <= x <= 1 for x in b)
    # deterministic across calls
    feats2 = AudioFeatureActor()(synthesize_audio_batch(t))
    assert feats.equals(feats2)


def test_image_resize_real_pooling():
    """Block-mean pooling is real: a uniform image pools to itself; the x-gradient
    pools to increasing thumb columns; channel stats match numpy directly."""
    from sts_opentelemetry_collector_ray.stages.multimodal import (
        ImageResizeActor,
        synthesize_image_batch,
    )

    t = pa.table({"doc_id": pa.array([0, 5, 11], pa.int64())})
    media = synthesize_image_batch(t)
    out = ImageResizeActor()(media)
    d = out.to_pydict()
    for i, (thumb, cm) in enumerate(zip(d["thumb"], d["channel_mean"])):
        img = np.frombuffer(media["payload"][i].as_py(), np.uint8).reshape(48, 64, 3)
        np.testing.assert_allclose(cm, img.reshape(-1, 3).mean(axis=0), atol=1e-4)
        th = np.frombuffer(thumb, np.uint8).reshape(12, 16, 3)
        # green channel is a pure y-gradient → pooled rows strictly increasing
        g_rows = th[:, :, 1].mean(axis=1)
        assert (np.diff(g_rows) > 0).all()
    # determinism
    assert ImageResizeActor()(media).equals(out)


def test_pca_variance_ordering_and_reconstruction():
    from sts_opentelemetry_collector_ray.stages.embeddings import fit_pca

    rng = np.random.default_rng(3)
    # anisotropic data: variance concentrated along the first axes
    scales = np.array([5.0, 3.0, 1.0, 0.5, 0.1, 0.1, 0.1, 0.1])
    x = rng.standard_normal((500, 8)) * scales
    mean, comps = fit_pca(x, k=4)
    z = (x - mean) @ comps
    v = z.var(axis=0)
    assert (np.diff(v) <= 1e-9).all()  # components ordered by explained variance
    assert v[0] > 15 and v[3] < 2  # captures the anisotropy
    # orthonormal components
    np.testing.assert_allclose(comps.T @ comps, np.eye(4), atol=1e-9)
    # deterministic
    m2, c2 = fit_pca(x, k=4)
    np.testing.assert_array_equal(comps, c2)


def test_video_frame_sampling_real():
    """Frame sampling is real: stride-3 over 8 frames keeps frames 0,3,6; the
    shifting gradient gives constant brightness per frame-mean of r+g channels
    (b varies by frame), and nonzero motion."""
    from sts_opentelemetry_collector_ray.stages.multimodal import (
        VID_FRAMES,
        VideoFrameSampleActor,
        synthesize_video_batch,
    )

    t = pa.table({"doc_id": pa.array([0, 7], pa.int64())})
    media = synthesize_video_batch(t)
    out = VideoFrameSampleActor(stride=3)(media)
    d = out.to_pydict()
    assert d["n_sampled"] == [3, 3]  # frames 0, 3, 6 of 8
    for payload, mid in zip(d["frames"], d["media_id"]):
        vid = np.frombuffer(payload, np.uint8).reshape(3, 24, 32, 3)
        full = np.frombuffer(
            media["payload"][list(d["media_id"]).index(mid)].as_py(), np.uint8
        ).reshape(VID_FRAMES, 24, 32, 3)
        np.testing.assert_array_equal(vid, full[::3])
    assert all(m > 0 for m in d["motion_score"])
    # deterministic
    assert VideoFrameSampleActor(stride=3)(media).equals(out)


def test_neardup_dedup_keeps_one_per_cluster(docs):
    from sts_opentelemetry_collector_ray.stages.dedup_docs import neardup_dedup_docs

    ds = ray.data.from_pandas(docs)
    kept = set(neardup_dedup_docs(ds, jaccard_threshold=0.5).to_pandas()["doc_id"])
    # docs 0/1/2 form a near-dup cluster -> representative 0 survives
    assert 0 in kept and 1 not in kept and 2 not in kept
    # 3/4 are word permutations (borderline near-dups): the representative 3
    # always survives; 5 is unrelated and always survives
    assert 3 in kept and 5 in kept


def test_simhash_pairs(docs):
    ds = ray.data.from_pandas(docs)
    pairs = simhash_pairs(ds, max_hamming=3).to_pandas()
    got = set(map(tuple, pairs[["a", "b"]].to_numpy()))
    assert (0, 1) in got  # identical text → hamming 0
    assert pairs[(pairs["a"] == 0) & (pairs["b"] == 1)]["hamming"].iloc[0] == 0


def test_embedding_neardup_and_topk():
    rng = np.random.default_rng(7)
    base = rng.standard_normal((20, 16))
    base[5] = base[0] + 0.01 * rng.standard_normal(16)  # near-dup pair (0, 5)
    df = pd.DataFrame(
        {"vec_id": np.arange(20, dtype=np.int64), "embedding": [v.tolist() for v in base]}
    )
    ds = ray.data.from_pandas(df)
    pairs = embedding_neardup_pairs(ds, threshold=0.99).to_pandas()
    assert (0, 5) in set(map(tuple, pairs[["a", "b"]].to_numpy()))

    # brute-force top-k vs numpy oracle
    qids = np.array([0, 3])
    topk = brute_force_topk(ds, base[qids], qids, k=3)
    unit = base / np.linalg.norm(base, axis=1)[:, None]
    sims = unit @ unit[qids].T
    for qi, qid in enumerate(qids):
        col = sims[:, qi].copy()
        col[qid] = -np.inf
        exp = np.argsort(-col, kind="stable")[:3]
        got = topk[topk["query_id"] == qid].sort_values("rank")["neighbor_id"].to_numpy()
        assert list(got) == list(exp)

    # LSH recall against the exact baseline — clustered vectors (LSH's use case:
    # near-dup neighborhoods share hyperplane buckets; random orthogonal vectors
    # would legitimately scatter)
    centers = rng.standard_normal((4, 16))
    clustered = np.vstack(
        [centers[i % 4] + 0.05 * rng.standard_normal(16) for i in range(40)]
    )
    cdf = pd.DataFrame(
        {
            "vec_id": np.arange(40, dtype=np.int64),
            "embedding": [v.tolist() for v in clustered],
        }
    )
    cds = ray.data.from_pandas(cdf)
    cqids = np.array([0, 1])
    exact = brute_force_topk(cds, clustered[cqids], cqids, k=3)
    lsh = lsh_topk(cds, clustered[cqids], cqids, k=3, num_planes=4)
    inter = set(map(tuple, lsh[["query_id", "neighbor_id"]].to_numpy())) & set(
        map(tuple, exact[["query_id", "neighbor_id"]].to_numpy())
    )
    assert len(inter) >= 4  # high recall on clustered data


def test_ann_merge_is_block_count_independent():
    """Round-5 ask #1: the top-k partial merge is a distributed bounded
    `groupby(query_id)` reduce, so the result must be IDENTICAL whatever the
    block count — 1 block (single local top-k) vs 16 blocks (16 partials per
    query merged off-driver) — for all three ANN paths."""
    from sts_opentelemetry_collector_ray.stages.similarity import (
        ivf_topk, seeded_centroids,
    )

    rng = np.random.default_rng(11)
    base = rng.standard_normal((96, 12))
    df = pd.DataFrame(
        {"vec_id": np.arange(96, dtype=np.int64), "embedding": [v.tolist() for v in base]}
    )
    qids = np.array([2, 17, 40])
    cents = seeded_centroids(12, 4)
    for nblocks in (1, 16):
        ds = ray.data.from_pandas(df).repartition(nblocks)
        res = {
            "brute": brute_force_topk(ds, base[qids], qids, k=5),
            "lsh": lsh_topk(ds, base[qids], qids, k=5, num_planes=4),
            "ivf": ivf_topk(ds, base[qids], qids, k=5, num_centroids=4,
                            nprobe=2, centroids=cents),
        }
        if nblocks == 1:
            want = res
        else:
            for name, got in res.items():
                pd.testing.assert_frame_equal(
                    got.reset_index(drop=True), want[name].reset_index(drop=True),
                    check_dtype=True, obj=name,
                )
    # schema is stable even at k beyond corpus size per bucket
    assert list(want["brute"].columns) == ["query_id", "neighbor_id", "rank"]


def test_token_count_and_quality(docs):
    t = pa.table({"doc_id": docs["doc_id"], "text": docs["text"]})
    out = token_count_batch(t)
    assert out["n_tokens"].to_pylist()[0] == 9
    assert out["n_tokens"].to_pylist()[5] == 1
    q = quality_score_batch(t)
    assert q["n_chars_actual"].to_pylist()[5] == 5
    assert 0 <= q["stopword_ratio"].to_pylist()[0] <= 1


def test_fingerprint_deterministic(docs):
    t = pa.table({"text": docs["text"]})
    a = fingerprint_batch(t)["fingerprint"].to_pylist()
    b = fingerprint_batch(t)["fingerprint"].to_pylist()
    assert a == b
    assert a[0] == a[1]  # identical text, identical fingerprint
    assert a[0] != a[3]
    # matches the scalar rolling hash definition
    def scalar(s):
        acc = 0
        for ch in s.encode():
            acc = (acc * 131 + ch) % 2147483647
        return acc
    assert a[0] == scalar(docs["text"][0])


def test_langid_actor(docs):
    t = pa.table({"text": ["the cat and the dog are in the house",
                           "el perro y el gato en la casa"]})
    out = LangIdActor()(t)
    assert out["lang_pred"].to_pylist()[0] == "en"
    assert out["lang_pred"].to_pylist()[1] == "es"


def test_multimodal_plumbing(docs):
    t = pa.table({"doc_id": docs["doc_id"], "text": docs["text"]})
    media = synthesize_media_batch(t)
    assert media.schema.field("payload").type == pa.binary()
    dec = MediaDecodeActor()(media)
    assert dec.schema.field("features").type == pa.list_(pa.float64())
    assert len(dec["features"].to_pylist()[0]) == 8
    # deterministic across calls
    dec2 = MediaDecodeActor()(media)
    assert dec["features"].to_pylist() == dec2["features"].to_pylist()
    # strict mode marks the real decode boundary
    with pytest.raises(NotImplementedError):
        MediaDecodeActor(strict=True)(media)
    # full Ray path
    ds = ray.data.from_arrow(media)
    out = decode_stage(ds, concurrency=2).to_pandas()
    assert len(out) == len(docs)
    assert "payload" not in out.columns  # heavy bytes dropped post-decode


def test_media_decoder_injection_seam(docs):
    """A 'real' decoder swaps in via decoder_factory WITHOUT editing the actor:
    strict=True no longer raises once a decoder is injected, and the injected
    kernel's output flows through the same features column / actor-pool stage.

    The factory is a NESTED function on purpose: cloudpickle ships it by VALUE
    to the actor. A module-level function in a test file pickles by reference
    and the Ray worker cannot import `test_training_ops` → silent actor
    crash-restart loop."""

    def _stub_real_decoder_factory():
        # stands in for `lambda: PILDecoder(weights).decode` — the factory body
        # is the once-per-actor model/codec load
        def decode(payload: bytes, media_type: str):
            return np.array(
                [float(len(payload)), float(payload[0]) if payload else 0.0]
            )

        return decode

    t = pa.table({"doc_id": docs["doc_id"], "text": docs["text"]})
    media = synthesize_media_batch(t)
    dec = MediaDecodeActor(strict=True, decoder_factory=_stub_real_decoder_factory)(media)
    feats = dec["features"].to_pylist()
    pay = media["payload"].to_pylist()
    assert feats[0] == [float(len(pay[0])), float(pay[0][0])]
    assert dec.schema.field("features").type == pa.list_(pa.float64())
    # and through the actor-pool stage (factory pickled to the actor, run in __init__)
    ds = ray.data.from_arrow(media)
    out = decode_stage(
        ds, concurrency=2, strict=True, decoder_factory=_stub_real_decoder_factory
    ).to_pandas()
    assert len(out) == len(docs)
    got = {m: f for m, f in zip(out["media_id"], out["features"])}
    want = {m: [float(len(p)), float(p[0])] for m, p in zip(media["media_id"].to_pylist(), pay)}
    assert {k: list(v) for k, v in got.items()} == want


def test_png_codec_roundtrip_all_filters():
    """Round-5 ask #4 groundwork: the pure-stdlib PNG codec. The SAME pixels
    encoded under every scanline filter (None/Sub/Up/Average/Paeth) produce
    DIFFERENT byte streams that must all decode back to identical pixels —
    exercising each reconstruction path — for grey, RGB and RGBA."""
    from sts_opentelemetry_collector_ray.functions.png import decode_png, encode_png

    rng = np.random.default_rng(3)
    images = [
        rng.integers(0, 256, (11, 7), dtype=np.uint8),  # grey
        rng.integers(0, 256, (9, 13, 3), dtype=np.uint8),  # RGB
        rng.integers(0, 256, (6, 5, 4), dtype=np.uint8),  # RGBA
    ]
    for img in images:
        streams = [encode_png(img, filter_type=f) for f in range(5)]
        assert len({s for s in streams}) == 5  # genuinely distinct encodings
        want = img if img.ndim == 3 else img[:, :, None]
        for f, s in enumerate(streams):
            got = decode_png(s)
            assert got.shape == want.shape, f"filter {f}"
            assert np.array_equal(got, want), f"filter {f}"

    # malformed payloads fail loudly, never mis-decode
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png at all")
    good = encode_png(images[1])
    bad_depth = bytearray(good)
    bad_depth[24] = 16  # IHDR bit-depth byte
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(bytes(bad_depth))


def test_png_decoder_seam_real_bytes(docs):
    """Round-5 ask #4: the decoder_factory seam exercised END-TO-END on real
    PNG bytes — MediaDecodeActor(strict=True) decodes actual zlib-compressed,
    filtered scanlines through the package's pure-stdlib decoder, and the
    features match a direct numpy computation over the decoded pixels."""
    from sts_opentelemetry_collector_ray.functions.png import (
        decode_png, encode_png, png_decoder_factory,
    )

    rng = np.random.default_rng(21)
    ids = np.arange(6, dtype=np.int64)
    pixels = [rng.integers(0, 256, (10, 8, 3), dtype=np.uint8) for _ in ids]
    payloads = [encode_png(px, filter_type=int(i % 5)) for i, px in zip(ids, pixels)]
    media = pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(["image"] * len(ids), pa.string()),
        }
    )
    # png_decoder_factory is PACKAGE-level → pickles by reference safely
    dec = MediaDecodeActor(strict=True, decoder_factory=png_decoder_factory)(media)
    feats = dec["features"].to_pylist()
    for i, px in enumerate(pixels):
        f = px.astype(np.float64) / 255.0
        want = np.concatenate(
            [np.pad(f.mean(axis=(0, 1)), (0, 1)), np.pad(f.std(axis=(0, 1)), (0, 1))]
        )
        assert np.allclose(feats[i], want)
        # and the payload really is a PNG that round-trips
        assert np.array_equal(decode_png(payloads[i]), px)
    # through the Ray actor-pool stage (factory runs once per actor __init__)
    ds = ray.data.from_arrow(media)
    out = decode_stage(
        ds, concurrency=2, strict=True, decoder_factory=png_decoder_factory
    ).to_pandas()
    assert len(out) == len(ids)
    got = {m: list(f) for m, f in zip(out["media_id"], out["features"])}
    assert got.keys() == set(ids.tolist())
    for i in ids:
        assert np.allclose(got[int(i)], feats[int(i)])


def test_ivf_topk_recall():
    from sts_opentelemetry_collector_ray.stages.similarity import ivf_topk

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((4, 16))
    clustered = np.vstack(
        [centers[i % 4] + 0.05 * rng.standard_normal(16) for i in range(80)]
    )
    df = pd.DataFrame(
        {
            "vec_id": np.arange(80, dtype=np.int64),
            "embedding": [v.tolist() for v in clustered],
        }
    )
    ds = ray.data.from_pandas(df)
    qids = np.array([0, 1])
    exact = brute_force_topk(ds, clustered[qids], qids, k=5)
    ivf = ivf_topk(ds, clustered[qids], qids, k=5, num_centroids=4, nprobe=2)
    inter = set(map(tuple, ivf[["query_id", "neighbor_id"]].to_numpy())) & set(
        map(tuple, exact[["query_id", "neighbor_id"]].to_numpy())
    )
    assert len(inter) >= 8  # high recall on clustered data (10 exact rows total)
    # deterministic across runs (seeded k-means)
    ivf2 = ivf_topk(ds, clustered[qids], qids, k=5, num_centroids=4, nprobe=2)
    pd.testing.assert_frame_equal(ivf.reset_index(drop=True), ivf2.reset_index(drop=True))


def test_image_augment_flip_and_bins():
    import numpy as np
    import pyarrow as pa

    from sts_opentelemetry_collector_ray.stages.multimodal import (
        CROP_H, CROP_W, CROP_X0, CROP_Y0, ImageAugmentActor, synthesize_image_batch,
    )

    t = pa.table({"doc_id": pa.array([4, 5, 6, 7], pa.int64())})
    media = synthesize_image_batch(t)
    out = ImageAugmentActor()(media)
    # brute force per row
    for i, mid in enumerate([4, 5, 6, 7]):
        img = np.frombuffer(media["payload"][i].as_py(), np.uint8).reshape(48, 64, 3)
        if mid % 2 == 1:
            img = img[:, ::-1, :]
        crop = img[CROP_Y0 : CROP_Y0 + CROP_H, CROP_X0 : CROP_X0 + CROP_W].astype(np.int64)
        luma = (299 * crop[..., 0] + 587 * crop[..., 1] + 114 * crop[..., 2]) // 1000
        exp_mean = np.floor(luma.mean() * 1e6 + 0.5) / 1e6
        assert out["flipped"][i].as_py() == (mid % 2 == 1)
        assert out["gray_mean"][i].as_py() == exp_mean
        assert out["hist_2"][i].as_py() == int((luma // 64 == 2).sum())
        assert sum(out[f"hist_{k}"][i].as_py() for k in range(4)) == CROP_W * CROP_H


def test_video_scene_threshold_and_tiebreak():
    import numpy as np
    import pyarrow as pa

    from sts_opentelemetry_collector_ray.stages.multimodal import (
        SCENE_CUT_THRESHOLD, VideoSceneActor, synthesize_video_batch,
    )

    ids = list(range(12))
    t = pa.table({"doc_id": pa.array(ids, pa.int64())})
    media = synthesize_video_batch(t)
    out = VideoSceneActor()(media)
    for i, mid in enumerate(ids):
        vid = np.frombuffer(media["payload"][i].as_py(), np.uint8).reshape(8, 24, 32, 3)
        s = np.abs(np.diff(vid.astype(np.int64), axis=0)).reshape(7, -1).sum(axis=1)
        denom = 24 * 32 * 3
        assert out["n_cuts"][i].as_py() == int((s > SCENE_CUT_THRESHOLD * denom).sum())
        assert out["peak_frame"][i].as_py() == int(s.argmax())  # first max on ties
        assert out["mean_motion"][i].as_py() == np.floor(s.sum() / (denom * 7) * 1e6 + 0.5) / 1e6


def test_decode_bin_stack_ragged_fallback():
    import numpy as np
    import pyarrow as pa

    from sts_opentelemetry_collector_ray.stages.multimodal import _decode_bin_stack

    a = np.arange(12, dtype=np.uint8)
    b = np.arange(12, 24, dtype=np.uint8)
    col = pa.array([a.tobytes(), b.tobytes()], pa.binary())
    stack = _decode_bin_stack(col, (3, 4))
    assert stack.shape == (2, 3, 4)
    assert (stack[1] == b.reshape(3, 4)).all()
    # sliced column exercises the arr.offset path of the zero-copy branch
    stack2 = _decode_bin_stack(col.slice(1, 1), (3, 4))
    assert (stack2[0] == b.reshape(3, 4)).all()


def test_semantic_dedup_drop_rule(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from sts_opentelemetry_collector_ray.stages.similarity import semantic_dedup

    # One centroid → one cluster. v0 ~ v1 ~ v2 chain where sim(v0,v2) < tau:
    # v1 drops (earlier v0), v2 drops too (earlier v1 shadows even though v1
    # itself dropped — the documented non-cascading rule). v3 is orthogonal.
    v0 = np.zeros(8); v0[0] = 1.0
    v1 = np.zeros(8); v1[0] = 0.8; v1[1] = 0.6
    v2 = np.zeros(8); v2[0] = 0.3; v2[1] = 0.954
    v3 = np.zeros(8); v3[7] = 1.0
    assert v0 @ v2 < 0.5 and v0 @ v1 > 0.5 and (v1 @ v2) / np.linalg.norm(v1) / np.linalg.norm(v2) > 0.5
    t = pa.table(
        {
            "vec_id": pa.array([10, 11, 12, 13], pa.int64()),
            "embedding": pa.array([v.tolist() for v in (v0, v1, v2, v3)], pa.list_(pa.float32())),
        }
    )
    out = (
        semantic_dedup(ray.data.from_arrow(t), np.ones((1, 8)), threshold=0.5)
        .to_pandas().sort_values("vec_id")
    )
    assert out["vec_id"].tolist() == [10, 13]


def test_bloom_contamination_deterministic_fps(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from sts_opentelemetry_collector_ray.functions.hashing import fnv1a32, fnv1a64
    from sts_opentelemetry_collector_ray.stages.dedup_docs import (
        _bloom_positions, bloom_contamination,
    )

    # doc ids chosen so exactly one is a probe (fnv32(str(id)) % 20 == 0)
    ids = [i for i in range(200) if fnv1a32(str(i)) % 20 == 0][:1]
    probe_id = ids[0]
    rows = {
        probe_id: "a b c d e f",                       # probe: grams {a b c d e, b c d e f}
        next(i for i in range(200) if fnv1a32(str(i)) % 20 != 0): "a b c d e x y z w v",  # true hit
    }
    # add non-probe filler docs; with a TINY bloom some must flag as FPs
    filler = [i for i in range(200) if fnv1a32(str(i)) % 20 != 0 and i not in rows][:30]
    for j, i in enumerate(filler):
        rows[i] = f"w{j} q{j} r{j} s{j} t{j} u{j} v{j}"
    t = pa.table(
        {
            "doc_id": pa.array(list(rows), pa.int64()),
            "text": [rows[i] for i in rows],
        }
    )
    out = (
        bloom_contamination(ray.data.from_arrow(t), n_bits=64, k=2)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    # brute-force replay of the same bloom: same probe grams, same positions
    def grams(s):
        w = s.split(" ")
        return {" ".join(w[i : i + 5]) for i in range(len(w) - 4)}
    bits = np.zeros(64, dtype=bool)
    for g in grams(rows[probe_id]):
        bits[_bloom_positions(np.array([fnv1a64(g)], np.uint64), 64, 2)[0]] = True
    expect = {}
    for i, s in rows.items():
        if i == probe_id:
            continue
        n = sum(bool(bits[_bloom_positions(np.array([fnv1a64(g)], np.uint64), 64, 2)[0]].all()) for g in grams(s))
        if n:
            expect[i] = n
    got = dict(zip(out["doc_id"], out["n_flagged"]))
    assert got == expect
    # the tiny filter must actually produce false positives beyond the true hit
    assert len(expect) > 1
