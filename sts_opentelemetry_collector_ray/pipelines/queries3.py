"""Driver-contract queries, wave 3: metric-type dispatch (K4), log-body
normalization (M14), BPE-ish regex token counting, multimodal feature plumbing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..stages.body import normalize_body
from ..stages.metrics_dispatch import TYPE_MODEL, metrics_dispatch
from ..stages.multimodal import decode_stage, synthesize_media_batch
from ..stages.text_analysis import STOPWORDS  # noqa: F401  (shared surface)

# Disjoint alternation → identical token boundaries under Python re (leftmost-first)
# and RE2 (leftmost-longest): word runs | digit runs | single other non-space.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _flatten_list_col(
    t: pa.Table,
    col: str,
    prefix: str,
    names: tuple[str, ...] | None = None,
    base: int = 1,
) -> pa.Table:
    """Replace a fixed-width list<float64> column with scalar float64 columns
    ``{prefix}{name}`` — the driver gate compares pandas frames, where scalar
    columns sort/hash cleanly and list columns don't."""
    from ..functions.vectors import stack_list_column

    m = stack_list_column(t[col])
    idx = t.schema.get_field_index(col)
    t = t.remove_column(idx)
    for j in range(m.shape[1]):
        suffix = names[j] if names is not None else str(base + j)
        t = t.append_column(f"{prefix}{suffix}", pa.array(m[:, j], pa.float64()))
    return t


def q_metrics_dispatch(sf_dir: str):
    """K4: one typed model per datapoint + per-model derived buckets."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )
    return metrics_dispatch(ds).select_columns(
        [
            "event_id", "model", "hist_bucket", "exp_bucket",
            "count", "sum_val", "bucket_counts",
            "scale", "zero_count", "pos_offset", "pos_bucket_counts",
            "neg_offset", "neg_bucket_counts", "value_at_quantiles",
        ]
    )


def q_body_normalize(sf_dir: str):
    """M14: polymorphic body → (kind, canonical JSON | string fallback, keys)."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "props"])
    return normalize_body(ds, col="props").select_columns(
        ["event_id", "body_kind", "body", "body_keys"]
    )


def q_docs_token_count_bpe(sf_dir: str):
    """BPE-ish regex token count over documents (word/digit/punct alternation)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df["n_bpe_tokens"] = df["text"].str.count(BPE_ISH_PATTERN).astype("int64")
        return df[["doc_id", "n_bpe_tokens"]]

    return ds.map_batches(fn, batch_format="pandas")


def q_media_features(sf_dir: str):
    """Multimodal plumbing end-to-end: synthesize binary payloads → actor-pool
    decode (deterministic fake kernel; the real decoder slot is marked with
    strict=True → NotImplementedError) → typed feature columns, flattened to
    scalar ``feat_m`` columns. Oracled: the byte moments replay in SQL off
    hex(encode(text)) (see ORACLES3)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    media = ds.map_batches(synthesize_media_batch, batch_format="pyarrow")
    decoded = decode_stage(media, concurrency=2)
    return decoded.map_batches(
        lambda t: _flatten_list_col(
            t.select(["media_id", "media_type", "n_bytes", "features"]),
            "features", "feat_",
        ),
        batch_format="pyarrow",
    )


def q_events_sessionize(sf_dir: str):
    """Gap-based session windows per user (30-min inactivity gap)."""
    from ..stages.clusters import sessionize

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    return sessionize(ds)


def q_neardup_components(sf_dir: str):
    """Full near-dup resolution: MinHash-LSH candidate pairs → signature-Jaccard
    verify → IN-CLUSTER connected components (min-label propagation via
    Dataset.join; no driver-side pair or label materialization). Rows-only (LSH
    recall; the union-find oracle lives in tests)."""
    from ..stages.clusters import connected_components_distributed
    from ..stages.dedup_docs import minhash_lsh_pairs

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    pairs = minhash_lsh_pairs(ds, jaccard_threshold=0.5)
    labels = connected_components_distributed(pairs)
    return labels.map_batches(
        lambda t: t.rename_columns(["node", "component"]), batch_format="pyarrow"
    )


def q_audio_features(sf_dir: str):
    """REAL audio path (no stub): deterministic PCM clips keyed by doc_id →
    actor-pool decode (np.frombuffer) + DSP features (RMS / zero-crossing rate /
    spectral centroid / FFT band energies, one batched rfft per batch), band
    energies flattened to scalar columns. Oracled: payloads depend only on
    doc_id % 40, so the oracle inlines the 40 per-class feature rows computed
    by the same DSP kernel and joins them back (see `_audio_features_oracle`)."""
    from ..stages.multimodal import audio_feature_stage, synthesize_audio_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    media = ds.map_batches(synthesize_audio_batch, batch_format="pyarrow")
    feats = audio_feature_stage(media, concurrency=2).select_columns(
        ["media_id", "rms", "zcr", "spectral_centroid_hz", "band_energy"]
    )
    return feats.map_batches(
        lambda t: _flatten_list_col(t, "band_energy", "band_"),
        batch_format="pyarrow",
    )


def q_image_thumbs(sf_dir: str):
    """REAL image path (no stub): raw RGB24 bitmaps keyed by doc_id →
    actor-pool decode (frombuffer/reshape) + block-mean resize to 16×12 thumbs
    + per-channel stats (exact integer sums → mean/std). Oracled: the oracle
    SQL re-synthesizes every pixel from the closed-form integer formulas and
    re-aggregates (`_image_thumbs_oracle`); the thumb bitmap itself is
    unit-tested (pooling math)."""
    from ..stages.multimodal import image_resize_stage, synthesize_image_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    media = ds.map_batches(synthesize_image_batch, batch_format="pyarrow")
    stats = image_resize_stage(media, concurrency=2).select_columns(
        ["media_id", "thumb_w", "thumb_h", "channel_mean", "channel_std"]
    )

    def flat(t: pa.Table) -> pa.Table:
        t = _flatten_list_col(t, "channel_mean", "mean_", names=("r", "g", "b"))
        return _flatten_list_col(t, "channel_std", "std_", names=("r", "g", "b"))

    return stats.map_batches(flat, batch_format="pyarrow")


def q_video_frames(sf_dir: str):
    """REAL video path (no stub): raw RGB frame stacks keyed by doc_id →
    actor-pool decode (frombuffer/reshape) + every-3rd-frame sampling +
    brightness/motion scores (exact integer sums). Oracled: the oracle SQL
    re-synthesizes every frame pixel from the closed-form integer formulas and
    re-aggregates brightness + inter-frame motion (`_video_frames_oracle`)."""
    from ..stages.multimodal import synthesize_video_batch, video_sample_stage

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    media = ds.map_batches(synthesize_video_batch, batch_format="pyarrow")
    sampled = video_sample_stage(media, concurrency=2).select_columns(
        ["media_id", "n_sampled", "frame_brightness", "motion_score"]
    )
    return sampled.map_batches(
        lambda t: _flatten_list_col(t, "frame_brightness", "bright_", base=0),
        batch_format="pyarrow",
    )


def q_emb_pca(sf_dir: str):
    """PCA projection of the embeddings table to 8 dims: driver fit on a bounded
    sample, broadcast components, per-batch matmul projection (shuffle-free).
    Oracled via `_emb_pca_oracle` (dynamic_oracles): the seeded bounded-sample
    fit makes mean/components constants for a given input, which the generated
    SQL inlines to replay center → matmul → round-6 per output dim."""
    from ..stages.embeddings import pca_project

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return pca_project(ds, k=8, flat=True)


def q_docs_join_emb(sf_dir: str):
    """Generic large×large hash join through Ray's native `Dataset.join`
    (hash-partitioned): documents ⋈ embeddings on doc_id = vec_id, projecting
    (doc_id, n_chars, dim). Both sides pruned at the read."""
    import pyarrow.compute as pc

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(
        lambda t: pa.table(
            {"doc_id": t["doc_id"],
             "n_chars": pc.cast(pc.utf8_length(t["text"]), pa.int64())}
        ),
        batch_format="pyarrow",
    )
    embs = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(
        lambda t: pa.table(
            {"vec_id": t["vec_id"],
             "dim": pc.cast(pc.list_value_length(t["embedding"]), pa.int64())}
        ),
        batch_format="pyarrow",
    )
    joined = docs.join(
        embs, join_type="inner", num_partitions=8, on=("doc_id",), right_on=("vec_id",)
    )
    return joined.select_columns(["doc_id", "n_chars", "dim"])


def q_orders_top_per_cust(sf_dir: str):
    """Grouped top-k window (top-2 orders per customer by price): hash-BUCKET
    exchange + ONE vectorized sort + per-group head per bucket — the windowed
    rank operator without per-customer Python groups."""
    num_buckets = 32

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        b = (df["o_custkey"].to_numpy().astype(np.uint64) % num_buckets).astype(np.int32)
        return df.assign(_b=b)

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_b"]).sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        g["rank"] = g.groupby("o_custkey").cumcount() + 1
        out = g[g["rank"] <= 2].copy()
        out["rank"] = out["rank"].astype(np.int64)
        return out

    b = ds.map_batches(bucketize, batch_format="pandas")
    return b.groupby("_b").map_groups(topk, batch_format="pandas")


def q_docs_gopher(sf_dir: str):
    """Gopher-rule document quality filter (Rae et al. 2021, appendix A1.1):
    word-count bounds, mean-word-length bounds, symbol ratios, stop-word
    evidence — per-rule flags plus the combined keep decision."""
    from ..stages.text_analysis import gopher_quality_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(gopher_quality_batch, batch_format="pyarrow").select_columns(
        ["doc_id", "word_count", "ok_word_count", "ok_mean_word_len",
         "ok_symbol_ratio", "ok_stopwords", "keep"]
    )


def q_docs_vocab(sf_dir: str):
    """Vocabulary building: global token counts → top-20 by (count desc, token).
    Per-batch Arrow combiner (local token counts) → hash-aggregate groupby(token)
    (Ray hash aggregate, NOT per-group Python) → tiny sort+limit. The classic
    map-reduce wordcount at training-corpus scale."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def local_counts(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), r"\s+")
        flat = toks.combine_chunks().flatten()
        flat = flat.filter(pc.not_equal(flat, ""))
        g = pa.table({"token": flat}).group_by(["token"]).aggregate([([], "count_all")])
        return g.rename_columns(["token", "pn"])

    partials = ds.map_batches(local_counts, batch_format="pyarrow")
    agg = partials.groupby("token").aggregate(Sum("pn", alias_name="n"))
    top = agg.sort(["n", "token"], descending=[True, False]).limit(20)
    return top


def q_docs_split(sf_dir: str):
    """Deterministic train/val split by content-independent id hash
    (fnv1a32(doc_id) % 100 < 90 → train) — reproducible across runs and
    machines, no RNG state; the sampling-operator family (O4) applied to
    dataset splitting."""
    from ..functions.hashing import fnv1a32_arrow

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def split(t: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        ids = pc.cast(t["doc_id"], pa.string()).combine_chunks()
        h = fnv1a32_arrow(ids) % np.uint64(100)
        lab = np.where(h < 90, "train", "val")
        return pa.table(
            {"doc_id": t["doc_id"], "split": pa.array(lab.astype(object), pa.string())}
        )

    return ds.map_batches(split, batch_format="pyarrow")


def q_events_sliding(sf_dir: str):
    """Hopping/sliding-window aggregate (1h window, 30min hop): each event lands
    in exactly size/hop windows — explode per batch (vectorized), pre-combine,
    then one small groupby. The streaming-window → batch translation family of
    SURVEY §2.9 alongside tumbling (`events_hourly`) and session
    (`events_sessionize`) windows."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    SIZE, HOP = 3600, 1800
    k = SIZE // HOP  # windows per event

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def explode(t: pa.Table) -> pa.Table:
        epoch = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False) // 1_000_000
        base = epoch // HOP  # newest window index containing the event
        et = t["event_type"]
        pieces = []
        for i in range(k):
            pieces.append(
                pa.table(
                    {
                        "event_type": et,
                        "window_start": pa.array((base - i) * HOP, pa.int64()),
                    }
                )
            )
        both = pa.concat_tables(pieces)
        g = both.group_by(["event_type", "window_start"]).aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "window_start", "p_n"])

    partials = ds.map_batches(explode, batch_format="pyarrow")
    agg = partials.groupby(["event_type", "window_start"]).aggregate(
        Sum("p_n", alias_name="n")
    )
    return agg


def q_docs_neardup_dedup(sf_dir: str):
    """Keep-one-per-near-dup-cluster dedup: LSH pairs → in-cluster components →
    bucketed anti-join of non-representatives. Rows-only (LSH recall)."""
    from ..stages.dedup_docs import neardup_dedup_docs

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = neardup_dedup_docs(ds, jaccard_threshold=0.5)
    return out.select_columns(["doc_id"])


def q_sg_latency_sketch(sf_dir: str):
    """Approximate latency percentiles per tool from a mergeable log-bin sketch
    (rows-only: the estimate is approximate by design; accuracy bounds are
    asserted vs numpy quantiles in tests)."""
    from ..stages.quantiles import quantile_sketch
    from ..stages.servicegraph import edge_table
    from ..stages.parse import parse_stage
    from ..sources.transcripts import derive_transcripts_from_events

    edges = edge_table(parse_stage(derive_transcripts_from_events(sf_dir)))
    return quantile_sketch(edges, "latency_us", key_cols=["tool"], qs=[0.5, 0.9, 0.99])


def _model_case() -> str:
    arms = " ".join(f"WHEN '{k}' THEN '{v}'" for k, v in TYPE_MODEL.items())
    return f"CASE event_type {arms} ELSE 'gauge' END"


def _components_sql(select: str) -> str:
    """Connected components of the MinHash near-dup pair graph as a recursive
    transitive closure over the byte-exact minhash oracle SQL: component label
    = MIN reachable node (what min-label propagation converges to)."""
    from .queries2 import _minhash_oracle

    return f"""
WITH RECURSIVE mh AS MATERIALIZED ({_minhash_oracle()}),
nodes AS MATERIALIZED (SELECT DISTINCT a AS n FROM mh UNION SELECT DISTINCT b FROM mh),
edges2 AS MATERIALIZED (SELECT a AS s, b AS d FROM mh UNION SELECT b, a FROM mh),
reach AS (
  SELECT n AS src, n AS dst FROM nodes
  UNION
  SELECT r.src, e.d FROM reach r JOIN edges2 e ON r.dst = e.s
),
comp AS (SELECT src AS node, MIN(dst) AS component FROM reach GROUP BY src)
{select}"""


_FNV32_DOC = (
    "list_reduce(list_prepend(2166136261::BIGINT, "
    "list_transform(string_split(CAST(doc_id AS VARCHAR), ''), "
    "c -> unicode(c)::BIGINT)), "
    "(acc, x) -> (xor(acc, x) * 16777619) % 4294967296) % 100"
)

def _quantile_sketch_oracle() -> str:
    """SQL replica of the log-bin quantile sketch: the 127 log-spaced edges are
    inlined as exact double literals; bin index = count of edges ≤ clamped
    value (== searchsorted side='right'); the selected bin is the first with
    cumulative ≥ q·total (== searchsorted side='left', which always lands on a
    non-empty bin); estimate = geometric midpoint √(lo·hi)."""
    from ..stages.quantiles import _EDGES, _HI, _LO

    from .queries2 import _EDGES_SQL

    e_sql = "CAST([" + ", ".join(repr(float(x)) for x in _EDGES) + "] AS DOUBLE[])"
    n_edges = len(_EDGES)
    return (
        _EDGES_SQL
        + f""",
vals AS (
  SELECT tool,
         greatest(CAST({_LO!r} AS DOUBLE), least(CAST(latency_us AS DOUBLE), CAST({_HI - 1!r} AS DOUBLE))) AS v
  FROM edges
),
binned AS (SELECT tool, len(list_filter({e_sql}, e -> e <= v)) AS b FROM vals),
counts AS (SELECT tool, b, COUNT(*) AS c FROM binned GROUP BY 1, 2),
tot AS (SELECT tool, SUM(c) AS total FROM counts GROUP BY 1),
cum AS (SELECT tool, b,
        SUM(c) OVER (PARTITION BY tool ORDER BY b) AS cum FROM counts),
qs AS (SELECT CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS q),
pick AS (
  SELECT t.tool, q.q, MIN(c.b) AS bsel
  FROM tot t CROSS JOIN qs q
  JOIN cum c ON c.tool = t.tool AND c.cum >= q.q * t.total
  GROUP BY 1, 2
),
bounds AS (
  SELECT tool, q,
         CASE WHEN bsel > 0 THEN ({e_sql})[bsel] ELSE CAST({_LO!r} AS DOUBLE) END AS lo,
         CASE WHEN bsel < {n_edges} THEN ({e_sql})[bsel + 1] ELSE CAST({_HI!r} AS DOUBLE) END AS hi
  FROM pick
)
SELECT tool, q, sqrt(lo * hi) AS estimate FROM bounds"""
    )


ORACLES3: dict[str, str] = {
    "sg_latency_sketch": _quantile_sketch_oracle(),
    "neardup_components": _components_sql("SELECT node, component FROM comp"),
    "docs_neardup_dedup": _components_sql(
        """SELECT d.doc_id FROM documents d
WHERE d.doc_id NOT IN (SELECT node FROM comp WHERE node <> component)"""
    ),
    "docs_join_emb": """
SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars,
       CAST(len(e.embedding) AS BIGINT) AS dim
FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id""",
    "orders_top_per_cust": """
SELECT o_orderkey, o_custkey, o_totalprice, rank FROM (
  SELECT o_orderkey, o_custkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rank
  FROM orders) WHERE rank <= 2""",
    "docs_gopher": """
WITH w AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS words
  FROM documents
),
m AS (
  SELECT doc_id, text,
         CAST(len(words) AS BIGINT) AS word_count,
         list_sum(list_transform(words, x -> strlen(x))) * 1.0
             / greatest(len(words), 1) AS mean_len,
         (length(text) - length(replace(text, '#', ''))) AS hashes,
         (length(text) - length(replace(text, '...', ''))) / 3 AS ellipses,
         (CAST(regexp_matches(lower(text), '\\bthe\\b') AS INT)
          + CAST(regexp_matches(lower(text), '\\bbe\\b') AS INT)
          + CAST(regexp_matches(lower(text), '\\bto\\b') AS INT)
          + CAST(regexp_matches(lower(text), '\\bof\\b') AS INT)
          + CAST(regexp_matches(lower(text), '\\band\\b') AS INT)
          + CAST(regexp_matches(lower(text), '\\bthat\\b') AS INT)
          + CAST(regexp_matches(lower(text), '\\bhave\\b') AS INT)
          + CAST(regexp_matches(lower(text), '\\bwith\\b') AS INT)) AS stop_hits
  FROM w
)
SELECT doc_id, word_count,
       (word_count >= 50 AND word_count <= 100000) AS ok_word_count,
       (mean_len >= 3.0 AND mean_len <= 10.0) AS ok_mean_word_len,
       (hashes * 1.0 / greatest(word_count, 1) <= 0.1
        AND ellipses * 1.0 / greatest(word_count, 1) <= 0.1) AS ok_symbol_ratio,
       (stop_hits >= 2) AS ok_stopwords,
       ((word_count >= 50 AND word_count <= 100000)
        AND (mean_len >= 3.0 AND mean_len <= 10.0)
        AND (hashes * 1.0 / greatest(word_count, 1) <= 0.1)
        AND (ellipses * 1.0 / greatest(word_count, 1) <= 0.1)
        AND (stop_hits >= 2)) AS keep
FROM m""",
    "docs_vocab": """
SELECT token, COUNT(*) AS n
FROM (SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x <> '')) AS token
      FROM documents)
GROUP BY token ORDER BY n DESC, token LIMIT 20""",
    "docs_split": f"""
SELECT doc_id, CASE WHEN {_FNV32_DOC} < 90 THEN 'train' ELSE 'val' END AS split
FROM documents""",
    "events_sliding": """
SELECT event_type,
       (CAST(floor(epoch(ts) / 1800) AS BIGINT) - shifts.i) * 1800 AS window_start,
       COUNT(*) AS n
FROM events, (SELECT 0 AS i UNION ALL SELECT 1) shifts
GROUP BY 1, 2""",
    "metrics_dispatch": f"""
WITH m AS (
  SELECT event_id, value, {_model_case()} AS model,
         CAST(len(list_filter([10.0, 50.0, 100.0, 500.0], b -> b < value)) AS INTEGER) AS hist_bucket,
         CAST(CASE WHEN value > 0 THEN ceil(log2(value)) ELSE 0 END AS INTEGER) AS exp_bucket
  FROM events
)
SELECT event_id, model, hist_bucket, exp_bucket,
       CAST(CASE WHEN model IN ('histogram','exp_histogram','summary')
                 THEN 1 ELSE 0 END AS BIGINT) AS count,
       CASE WHEN model IN ('histogram','exp_histogram','summary')
            THEN value ELSE 0.0 END AS sum_val,
       CASE WHEN model = 'histogram'
            THEN '[' || array_to_string(list_transform(range(5),
                 j -> CASE WHEN j = hist_bucket THEN '1' ELSE '0' END), ',') || ']'
       END AS bucket_counts,
       CAST(0 AS BIGINT) AS scale,
       CAST(CASE WHEN model = 'exp_histogram' AND value = 0
                 THEN 1 ELSE 0 END AS BIGINT) AS zero_count,
       CAST(CASE WHEN model = 'exp_histogram' AND value > 0
                 THEN exp_bucket ELSE 0 END AS BIGINT) AS pos_offset,
       CASE WHEN model = 'exp_histogram'
            THEN CASE WHEN value > 0 THEN '[1]' ELSE '[]' END
       END AS pos_bucket_counts,
       CAST(CASE WHEN model = 'exp_histogram' AND value < 0
                 THEN ceil(log2(-value)) ELSE 0 END AS BIGINT) AS neg_offset,
       CASE WHEN model = 'exp_histogram'
            THEN CASE WHEN value < 0 THEN '[1]' ELSE '[]' END
       END AS neg_bucket_counts,
       CASE WHEN model = 'summary'
            THEN '[{{"q":0.5,"v":' || printf('%.6f', round(value, 6))
                 || '}},{{"q":0.9,"v":' || printf('%.6f', round(value, 6))
                 || '}},{{"q":0.99,"v":' || printf('%.6f', round(value, 6)) || '}}]'
       END AS value_at_quantiles
FROM m""",
    "body_normalize": """
SELECT event_id,
       'map' AS body_kind,
       '{"k":' || regexp_extract(props, '"k": (\\d+)', 1) || '}' AS body,
       'k' AS body_keys
FROM events""",
    "docs_token_count_bpe": f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS BIGINT) AS n_bpe_tokens
FROM documents""",
    "events_sessionize": """
WITH ordered AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
  FROM events
), flagged AS (
  SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_sess
  FROM ordered
), sess AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
  FROM flagged
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       COUNT(*) AS n_events, MIN(ts_us) AS start_us, MAX(ts_us) AS end_us
FROM sess GROUP BY user_id, session_idx""",
}


def _media_features_oracle(feature_dim: int = 8, cap: int = 4096) -> str:
    """Independent SQL replay of `MediaDecodeActor._decode`: utf-8 bytes come
    from hex(encode(text)) (capped at the payload truncation), byte moments are
    EXACT HUGEINT sums, and the half-away round-9 is pure integer arithmetic —
    `(2*s*10^9 + d) // (2*d)` — the same rational the engine computes, so the
    doubles agree bit-for-bit regardless of float summation order."""
    powers = "v AS v1, v*v AS v2, v*v*v AS v3, (v*v)*(v*v) AS v4"
    sums = (
        "sum(v1) AS s1, sum(v2) AS s2, sum(v3) AS s3, sum(v4) AS s4, "
        "sum(v4*v1) AS s5, sum(v4*v2) AS s6, sum(v4*v3) AS s7, sum(v4*v4) AS s8"
    )
    feats = ",\n       ".join(
        f"CAST((2*s{m}*1000000000 + {255**m}*n) // (2*{255**m}*n) AS DOUBLE)/1e9"
        f" AS feat_{m}"
        for m in range(1, feature_dim + 1)
    )
    return f"""
WITH d AS (
  SELECT doc_id, substr(hex(encode(text)), 1, {2 * cap}) AS hx FROM documents
),
b AS (
  SELECT doc_id,
         CAST((strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) - 1) * 16
            + strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1 AS HUGEINT) AS v
  FROM d, unnest(range(1, length(hx)//2 + 1)) AS t(i)
),
p AS (SELECT doc_id, {powers} FROM b),
s AS (SELECT doc_id, CAST(count(*) AS HUGEINT) AS n, {sums} FROM p GROUP BY doc_id)
SELECT doc_id AS media_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
           AS media_type,
       CAST(n AS BIGINT) AS n_bytes,
       {feats}
FROM s"""


def _audio_features_oracle() -> str:
    """`synthesize_audio_batch` payloads depend only on doc_id % 40 (the
    fundamental-frequency class), so the oracle runs the SAME DSP kernel once
    per class representative (no Ray; FFT isn't SQL-expressible), inlines the
    40 constant rows, and joins them back by class — verifying the distributed
    path maps every document to its class features."""
    from ..stages.multimodal import AudioFeatureActor, synthesize_audio_batch

    rep = pa.table({"doc_id": pa.array(np.arange(40, dtype=np.int64))})
    cf = AudioFeatureActor()(synthesize_audio_batch(rep))
    cb = np.array(cf["band_energy"].to_pylist())
    rows = ",\n    ".join(
        f"({i}, {cf['rms'][i].as_py()!r}, {cf['zcr'][i].as_py()!r}, "
        f"{cf['spectral_centroid_hz'][i].as_py()!r}, "
        + ", ".join(repr(float(cb[i, j])) for j in range(4))
        + ")"
        for i in range(40)
    )
    return f"""
WITH c(k, rms, zcr, spectral_centroid_hz, band_1, band_2, band_3, band_4) AS (
  SELECT * FROM (VALUES
    {rows}
  )
)
SELECT d.doc_id AS media_id, c.rms, c.zcr, c.spectral_centroid_hz,
       c.band_1, c.band_2, c.band_3, c.band_4
FROM documents d JOIN c ON d.doc_id % 40 = c.k"""


def _image_thumbs_oracle() -> str:
    """Independent SQL replay of the image path: every pixel of
    `synthesize_image_batch`'s bitmap is re-derived from the closed-form
    integer formulas (x-gradient red with the keyed inverted rectangle,
    y-gradient green, constant keyed blue), then per-channel mean/std come
    from EXACT integer sums — matching `ImageResizeActor`'s integer-sum path
    bit-for-bit (single correctly-rounded division / sqrt per value)."""
    from ..stages.multimodal import IMG_H, IMG_W

    chan = {"r": "sr", "g": "sg", "b": "sb"}
    stats = ",\n       ".join(
        f"floor(({s} / n) * 1e6 + 0.5) / 1e6 AS mean_{c},\n       "
        f"floor((sqrt(CAST(n*{s}2 - {s}*{s} AS DOUBLE)) / n) * 1e6 + 0.5) / 1e6"
        f" AS std_{c}"
        for c, s in chan.items()
    )
    return f"""
WITH px AS (
  SELECT d.doc_id,
         CASE WHEN x.x >= d.doc_id % {IMG_W - 16}
               AND x.x <  d.doc_id % {IMG_W - 16} + 16
               AND y.y >= (d.doc_id * 7) % {IMG_H - 12}
               AND y.y <  (d.doc_id * 7) % {IMG_H - 12} + 12
              THEN 255 - (x.x * 255) // {IMG_W - 1}
              ELSE (x.x * 255) // {IMG_W - 1} END AS r,
         (y.y * 255) // {IMG_H - 1} AS g,
         (d.doc_id * 37) % 256 AS b
  FROM documents d,
       unnest(range(0, {IMG_H})) AS y(y),
       unnest(range(0, {IMG_W})) AS x(x)
),
s AS (
  SELECT doc_id, count(*) AS n,
         sum(r) AS sr, sum(r*r) AS sr2, sum(g) AS sg, sum(g*g) AS sg2,
         sum(b) AS sb, sum(b*b) AS sb2
  FROM px GROUP BY doc_id
)
SELECT doc_id AS media_id,
       CAST(16 AS INT) AS thumb_w, CAST(12 AS INT) AS thumb_h,
       {stats}
FROM s"""


def _video_frames_oracle(stride: int = 3) -> str:
    """Independent SQL replay of the video path: every frame pixel of
    `synthesize_video_batch` is re-derived from the closed-form integer
    formulas (per-frame shifted x-gradient red, y-gradient green, keyed
    constant blue), sampled-frame brightness and inter-frame motion come from
    EXACT integer sums over a self-join on consecutive frames — matching
    `VideoFrameSampleActor`'s integer-sum path bit-for-bit."""
    from ..stages.multimodal import VID_FRAMES, VID_H, VID_W

    brights = ",\n         ".join(
        f"max(CASE WHEN f = {j * stride} THEN"
        f" floor((s * 1.0 / n) * 1e6 + 0.5) / 1e6 END) AS bright_{j}"
        for j in range((VID_FRAMES + stride - 1) // stride)
    )
    return f"""
WITH px AS (
  SELECT d.doc_id, f.f, y.y, x.x,
         ((((x.x + (d.doc_id + 3*f.f) % {VID_W}) % {VID_W}) * 255)
            // {VID_W - 1}) AS r,
         (y.y * 255) // {VID_H - 1} AS g,
         (d.doc_id * 11 + f.f * 29) % 256 AS b
  FROM documents d,
       unnest(range(0, {VID_FRAMES})) AS f(f),
       unnest(range(0, {VID_H})) AS y(y),
       unnest(range(0, {VID_W})) AS x(x)
),
fr AS (
  SELECT doc_id, f, sum(r) + sum(g) + sum(b) AS s, count(*) * 3 AS n
  FROM px GROUP BY doc_id, f
),
bright AS (
  SELECT doc_id,
         {brights}
  FROM fr GROUP BY doc_id
),
mo AS (
  SELECT a.doc_id,
         sum(abs(b2.r - a.r) + abs(b2.g - a.g) + abs(b2.b - a.b)) AS ds,
         count(*) * 3 AS dn
  FROM px a JOIN px b2 ON a.doc_id = b2.doc_id AND b2.f = a.f + 1
                        AND a.y = b2.y AND a.x = b2.x
  GROUP BY a.doc_id
)
SELECT b.doc_id AS media_id,
       CAST({(VID_FRAMES + stride - 1) // stride} AS INT) AS n_sampled,
       b.bright_0, b.bright_1, b.bright_2,
       floor((m.ds * 1.0 / m.dn) * 1e6 + 0.5) / 1e6 AS motion_score
FROM bright b JOIN mo m ON b.doc_id = m.doc_id"""


def q_image_augment(sf_dir: str):
    """REAL image augmentation (no stub): deterministic horizontal flip
    (media_id odd) + fixed 32×24 center crop + integer BT.601 luma, with an
    exact 4-bin gray histogram and exact-integer gray mean — whole-batch numpy
    over the zero-copy payload stack (`_decode_bin_stack`). Oracled: the SQL
    replays every cropped pixel through the flip coordinate map and the same
    integer luma/bin math (`_image_augment_oracle`)."""
    from ..stages.multimodal import image_augment_stage, synthesize_image_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    media = ds.map_batches(synthesize_image_batch, batch_format="pyarrow")
    return image_augment_stage(media, concurrency=2).select_columns(
        ["media_id", "flipped", "gray_mean", "hist_0", "hist_1", "hist_2", "hist_3"]
    )


def _image_augment_oracle() -> str:
    """Pixel replay of the augmentation path: the flip is a coordinate map
    (x_src = W-1-x for odd ids), so the oracle re-derives each CROPPED pixel
    from `synthesize_image_batch`'s closed-form formulas at the mapped source
    coordinate, then applies the identical integer luma and 64-wide bins."""
    from ..stages.multimodal import (
        CROP_H,
        CROP_W,
        CROP_X0,
        CROP_Y0,
        IMG_H,
        IMG_W,
        _LUMA,
    )

    hists = ",\n       ".join(
        f"CAST(count(*) FILTER (luma // 64 = {k}) AS BIGINT) AS hist_{k}"
        for k in range(4)
    )
    return f"""
WITH co AS (
  SELECT d.doc_id,
         CASE WHEN d.doc_id % 2 = 1 THEN {IMG_W - 1} - x.x ELSE x.x END AS xs,
         y.y AS y
  FROM documents d,
       unnest(range({CROP_Y0}, {CROP_Y0 + CROP_H})) AS y(y),
       unnest(range({CROP_X0}, {CROP_X0 + CROP_W})) AS x(x)
), rgb AS (
  SELECT doc_id,
         CASE WHEN xs >= doc_id % {IMG_W - 16}
               AND xs <  doc_id % {IMG_W - 16} + 16
               AND y >= (doc_id * 7) % {IMG_H - 12}
               AND y <  (doc_id * 7) % {IMG_H - 12} + 12
              THEN 255 - (xs * 255) // {IMG_W - 1}
              ELSE (xs * 255) // {IMG_W - 1} END AS r,
         (y * 255) // {IMG_H - 1} AS g,
         (doc_id * 37) % 256 AS b
  FROM co
), l AS (
  SELECT doc_id, ({_LUMA[0]} * r + {_LUMA[1]} * g + {_LUMA[2]} * b) // 1000 AS luma
  FROM rgb
)
SELECT doc_id AS media_id,
       (doc_id % 2 = 1) AS flipped,
       floor((sum(luma) * 1.0 / count(*)) * 1e6 + 0.5) / 1e6 AS gray_mean,
       {hists}
FROM l GROUP BY doc_id"""


def q_video_scenes(sf_dir: str):
    """REAL video scene-cut detection (no stub): per-transition exact-integer
    abs-delta sums over the raw frame stack, integer-compared cut threshold
    (no float boundary), first-max peak transition, mean motion. Oracled: the
    SQL re-synthesizes every frame pixel and replays the consecutive-frame
    join + integer threshold + window-max tie-break (`_video_scenes_oracle`)."""
    from ..stages.multimodal import synthesize_video_batch, video_scene_stage

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    media = ds.map_batches(synthesize_video_batch, batch_format="pyarrow")
    return video_scene_stage(media, concurrency=2).select_columns(
        ["media_id", "n_cuts", "peak_frame", "peak_motion", "mean_motion"]
    )


def _video_scenes_oracle() -> str:
    from ..stages.multimodal import (
        SCENE_CUT_THRESHOLD,
        VID_FRAMES,
        VID_H,
        VID_W,
    )

    denom = VID_H * VID_W * 3
    return f"""
WITH px AS (
  SELECT d.doc_id, f.f, y.y, x.x,
         ((((x.x + (d.doc_id + 3*f.f) % {VID_W}) % {VID_W}) * 255)
            // {VID_W - 1}) AS r,
         (y.y * 255) // {VID_H - 1} AS g,
         (d.doc_id * 11 + f.f * 29) % 256 AS b
  FROM documents d,
       unnest(range(0, {VID_FRAMES})) AS f(f),
       unnest(range(0, {VID_H})) AS y(y),
       unnest(range(0, {VID_W})) AS x(x)
),
tr AS (
  SELECT a.doc_id, a.f,
         sum(abs(b2.r - a.r) + abs(b2.g - a.g) + abs(b2.b - a.b)) AS s
  FROM px a JOIN px b2 ON a.doc_id = b2.doc_id AND b2.f = a.f + 1
                        AND a.y = b2.y AND a.x = b2.x
  GROUP BY a.doc_id, a.f
),
wm AS (
  SELECT doc_id, f, s, max(s) OVER (PARTITION BY doc_id) AS mx FROM tr
)
SELECT doc_id AS media_id,
       CAST(count(*) FILTER (s > {SCENE_CUT_THRESHOLD} * {denom}) AS BIGINT)
         AS n_cuts,
       CAST(min(f) FILTER (s = mx) AS INT) AS peak_frame,
       floor((max(s) * 1.0 / {denom}) * 1e6 + 0.5) / 1e6 AS peak_motion,
       floor((sum(s) * 1.0 / ({denom} * {VID_FRAMES - 1})) * 1e6 + 0.5) / 1e6
         AS mean_motion
FROM wm GROUP BY doc_id"""


ORACLES3["media_features"] = _media_features_oracle()
ORACLES3["audio_features"] = _audio_features_oracle()
ORACLES3["image_thumbs"] = _image_thumbs_oracle()
ORACLES3["video_frames"] = _video_frames_oracle()
ORACLES3["image_augment"] = _image_augment_oracle()
ORACLES3["video_scenes"] = _video_scenes_oracle()


def q_docs_repetition(sf_dir: str):
    """Gopher-style repetition signals per document (dup-word mass, dominant
    bigram coverage) — whole-batch Arrow group_by kernels, no per-doc Python
    (stages/text_analysis.py::repetition_batch)."""
    from ..stages.text_analysis import repetition_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(repetition_batch, batch_format="pyarrow").select_columns(
        ["doc_id", "n_tokens", "dup_word_frac", "top_2gram_count", "top_2gram_frac"]
    )


def q_docs_contamination(sf_dir: str):
    """Benchmark-contamination scan: training docs sharing any word 5-gram with
    the held-out probe split (fnv(doc_id)%20==0). Probe grams broadcast via
    ray.put; the training side streams through one membership kernel — no
    shuffle on the big side (stages/dedup_docs.py::contamination_check)."""
    from ..stages.dedup_docs import contamination_check

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return contamination_check(ds)


_FNV32_DOC20 = _FNV32_DOC.replace("% 100", "% 20")

# FNV-1a64 over the gram's UTF-8 BYTES (byte-exact vs functions/hashing.py::
# fnv1a64_arrow, which hashes raw Arrow string buffers): each codepoint is
# expanded to its UTF-8 byte sequence arithmetically (1–4 bytes by range),
# flattened, then folded. Verified equal to the Python byte fold for ASCII,
# Latin-1, CJK and astral (emoji) inputs.
_FNV64_GRAM = (
    "list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT), "
    "list_transform(flatten(list_transform(string_split(gram, ''), c -> "
    "CASE WHEN unicode(c) < 128 THEN [unicode(c)] "
    "WHEN unicode(c) < 2048 THEN [192 + unicode(c) // 64, 128 + unicode(c) % 64] "
    "WHEN unicode(c) < 65536 THEN [224 + unicode(c) // 4096, "
    "128 + (unicode(c) // 64) % 64, 128 + unicode(c) % 64] "
    "ELSE [240 + unicode(c) // 262144, 128 + (unicode(c) // 4096) % 64, "
    "128 + (unicode(c) // 64) % 64, 128 + unicode(c) % 64] END)), "
    "b -> CAST(b AS HUGEINT))), "
    "(acc, x) -> (xor(acc, x) * 1099511628211) % 18446744073709551616)"
)

ORACLES3["docs_repetition"] = """
WITH s AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
tok AS (SELECT doc_id, len(t) AS n_tokens, unnest(t) AS w FROM s),
dis AS (SELECT doc_id, any_value(n_tokens) AS n_tokens,
               count(DISTINCT w) AS nd, count(*) AS nt
        FROM tok GROUP BY doc_id),
bg AS (SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS g
       FROM s WHERE len(t) >= 2),
bgc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g),
top AS (SELECT doc_id, max(c) AS mc FROM bgc GROUP BY doc_id)
SELECT d.doc_id, d.n_tokens,
       floor((1.0 - nd * 1.0 / nt) * 1e6 + 0.5) / 1e6 AS dup_word_frac,
       coalesce(mc, 0) AS top_2gram_count,
       floor((2.0 * coalesce(mc, 0) / d.n_tokens) * 1e6 + 0.5) / 1e6 AS top_2gram_frac
FROM dis d LEFT JOIN top USING (doc_id)"""

ORACLES3["docs_contamination"] = f"""
WITH f AS (SELECT doc_id, {_FNV32_DOC20} AS h, string_split(text, ' ') AS t FROM documents),
g AS (SELECT doc_id, h,
             unnest(list_transform(range(1, len(t) - 3), i ->
               t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4])) AS gram
      FROM f WHERE len(t) >= 5),
d AS (SELECT DISTINCT doc_id, h, gram FROM g),
ph AS (SELECT doc_id, h, {_FNV64_GRAM} AS hv FROM d),
p AS (SELECT DISTINCT hv FROM ph WHERE h = 0)
SELECT a.doc_id, count(DISTINCT a.hv) AS n_shared
FROM ph a JOIN p USING (hv)
WHERE a.h <> 0 GROUP BY a.doc_id"""

def q_docs_pack(sf_dir: str):
    """Sequence packing for training: greedy first-fit of documents into
    ≤512-token bins in deterministic doc_id order, per bounded doc_id-range
    bucket, globally renumbered (stages/pack.py::pack_documents — the A5
    envelope-packing kernel applied to the LLM-training use case)."""
    from ..stages.pack import pack_documents

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return pack_documents(ds, max_tokens=512)


_PACK_CAP = 512
_PACK_BUCKET = 1024

ORACLES3["docs_pack"] = f"""
WITH RECURSIVE
sized AS (SELECT doc_id, len(string_split(text, ' ')) AS sz,
                 doc_id // {_PACK_BUCKET} AS bucket
          FROM documents),
seq AS (SELECT *, row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn
        FROM sized),
gstat AS (SELECT bucket, SUM(sz) AS tot FROM sized GROUP BY 1),
rseq AS (SELECT s.* FROM seq s JOIN gstat g USING (bucket) WHERE g.tot > {_PACK_CAP}),
packed AS (
  SELECT bucket, rn, doc_id, sz, CAST(0 AS BIGINT) AS bin, CAST(sz AS BIGINT) AS acc
  FROM rseq WHERE rn = 1
  UNION ALL
  SELECT r.bucket, r.rn, r.doc_id, r.sz,
         CASE WHEN p.acc + r.sz > {_PACK_CAP} AND p.acc > 0 THEN p.bin + 1 ELSE p.bin END,
         CAST(CASE WHEN p.acc + r.sz > {_PACK_CAP} AND p.acc > 0
              THEN r.sz ELSE p.acc + r.sz END AS BIGINT)
  FROM rseq r JOIN packed p ON r.bucket = p.bucket AND r.rn = p.rn + 1
),
bins AS (
  SELECT bucket, bin, COUNT(*) AS n_docs, CAST(SUM(sz) AS BIGINT) AS n_tokens,
         arg_min(doc_id, rn) AS first_doc
  FROM packed GROUP BY 1, 2
  UNION ALL
  SELECT s.bucket, CAST(0 AS BIGINT), COUNT(*), CAST(SUM(s.sz) AS BIGINT), min(s.doc_id)
  FROM seq s JOIN gstat g USING (bucket) WHERE g.tot <= {_PACK_CAP} GROUP BY 1
),
cnts AS (SELECT bucket, COUNT(*) AS c FROM bins GROUP BY 1),
offs AS (SELECT bucket,
                SUM(c) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) - c AS off
         FROM cnts)
SELECT CAST(b.bin + o.off AS BIGINT) AS bin_idx, b.n_docs, b.n_tokens, b.first_doc
FROM bins b JOIN offs o USING (bucket)"""

# Per-language keep rates for stratified sampling: downsample the dominant
# language, keep the tail (the corpus-rebalancing recipe). Deterministic via
# the same content-independent id hash as docs_split.
STRATA_RATES = {"en": 40, "de": 80, "fr": 80, "es": 80, "zh": 80}
STRATA_DEFAULT = 100


def q_docs_sample_stratified(sf_dir: str):
    """Stratified deterministic sampling: per-language keep rates applied via
    fnv1a32(doc_id) % 100 — rebalances the language mix with no RNG state and
    stable membership across runs/machines (O4 family at corpus scale: one
    vectorized hash + rate-lookup mask per batch, no shuffle)."""
    import pyarrow.compute as pc

    from ..functions.hashing import fnv1a32_arrow

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    langs = list(STRATA_RATES)
    rates = np.array([STRATA_RATES[l] for l in langs] + [STRATA_DEFAULT], dtype=np.int64)

    def pick(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["doc_id"], pa.string()).combine_chunks()
        h = fnv1a32_arrow(ids) % np.uint64(100)
        li = pc.index_in(t["lang"], value_set=pa.array(langs)).to_numpy(
            zero_copy_only=False
        )
        li = np.where(np.isnan(li.astype(float)), len(langs), li).astype(np.int64)
        keep = h.astype(np.int64) < rates[li]
        return t.filter(pa.array(keep))

    return ds.map_batches(pick, batch_format="pyarrow")


_STRATA_CASE = " ".join(
    f"WHEN lang = '{l}' THEN {r}" for l, r in STRATA_RATES.items()
)

ORACLES3["docs_sample_stratified"] = f"""
SELECT doc_id, lang FROM documents
WHERE {_FNV32_DOC} < CASE {_STRATA_CASE} ELSE {STRATA_DEFAULT} END"""


def q_docs_tfidf(sf_dir: str):
    """TF-IDF top-3 terms per document. Two passes, both scale-shaped: (1)
    document-frequency aggregate — per-batch DISTINCT (doc, token) combiner →
    hash aggregate over the BOUNDED vocabulary → broadcast df map via ray.put;
    (2) per-batch TF counts × broadcast idf → vectorized per-doc top-3. The
    corpus streams; only |vocab| rows ever leave the aggregation."""
    import pyarrow.compute as pc

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    n_docs = docs.count()

    def distinct_tokens(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.fill_null(t["text"], ""), " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = toks.flatten()
        r = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        d = (
            pa.table({"r": pa.array(r), "w": flat})
            .group_by(["r", "w"])
            .aggregate([])
            .group_by(["w"])
            .aggregate([([], "count_all")])
        )
        return d.rename_columns(["w", "pdf"])

    from ray.data.aggregate import Sum

    df_tbl = (
        docs.map_batches(distinct_tokens, batch_format="pyarrow")
        .groupby("w")
        .aggregate(Sum("pdf", alias_name="df"))
        .to_pandas()  # |vocab| rows — bounded, documented assumption
    )
    df_map = ray.put(
        (pa.array(df_tbl["w"], pa.string()), df_tbl["df"].to_numpy(dtype=np.float64))
    )

    def topk(t: pa.Table) -> pa.Table:
        vocab, dfvals = ray.get(df_map)
        toks = pc.split_pattern(pc.fill_null(t["text"], ""), " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = toks.flatten()
        r = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        tf = (
            pa.table({"r": pa.array(r), "w": flat}).group_by(["r", "w"]).aggregate(
                [([], "count_all")]
            )
        )
        rr = tf["r"].to_numpy()
        cc = tf["count_all"].to_numpy().astype(np.float64)
        wi = pc.index_in(tf["w"], value_set=vocab).to_numpy(zero_copy_only=False)
        dfv = dfvals[wi.astype(np.int64)]
        score = cc * np.log(n_docs * 1.0 / dfv)
        import pandas as pd

        frame = pd.DataFrame(
            {
                "doc_id": t["doc_id"].to_numpy(zero_copy_only=False)[rr],
                "term": tf["w"].to_pandas(),
                "score": score,
            }
        )
        frame = frame.sort_values(
            ["doc_id", "score", "term"], ascending=[True, False, True], kind="mergesort"
        )
        frame["rank"] = frame.groupby("doc_id").cumcount() + 1
        frame = frame[frame["rank"] <= 3]
        frame["score"] = np.floor(frame["score"] * 1e6 + 0.5) / 1e6
        return pa.Table.from_pandas(
            frame[["doc_id", "term", "rank", "score"]], preserve_index=False
        ).replace_schema_metadata(None)

    return docs.map_batches(topk, batch_format="pyarrow")


ORACLES3["docs_tfidf"] = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
tf AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY 1, 2),
dfx AS (SELECT w, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
n AS (SELECT count(*) AS nn FROM documents),
s AS (SELECT doc_id, w AS term, c * ln(nn * 1.0 / df) AS score
      FROM tf JOIN dfx USING (w), n),
r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, term) AS rk FROM s)
SELECT doc_id, term, CAST(rk AS BIGINT) AS rank,
       floor(score * 1e6 + 0.5) / 1e6 AS score
FROM r WHERE rk <= 3"""

def q_events_asof(sf_dir: str):
    """As-of join (purchase attribution): each purchase matched to the same
    user's most recent view at ts ≤ purchase ts. Distributed via key-aligned
    bucket co-partitioning + one vectorized lexsort/maximum.accumulate merge
    per bucket (stages/asof.py::asof_join). Sides are TWO independent reads —
    never a branched lazy Dataset (CLAUDE.md rule)."""
    import pyarrow.compute as pc

    from ..stages.asof import asof_join

    cols = ["event_id", "user_id", "ts", "event_type"]

    def only(et):
        def fn(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["event_type"], et)).drop_columns(["event_type"])

        return fn

    purchases = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=cols).map_batches(
        only("purchase"), batch_format="pyarrow"
    )
    views = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=cols).map_batches(
        only("view"), batch_format="pyarrow"
    )
    return asof_join(
        purchases, views, key_col="user_id", ts_col="ts",
        left_id="event_id", right_id="event_id",
        out_left="purchase_id", out_right="view_id",
    )


ORACLES3["events_asof"] = """
WITH v AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'view'),
p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
j AS (SELECT p.event_id AS purchase_id, p.user_id, v.event_id AS view_id,
             epoch_us(p.ts) - epoch_us(v.ts) AS gap_us,
             row_number() OVER (PARTITION BY p.event_id
                                ORDER BY v.ts DESC, v.event_id DESC) AS rn
      FROM p JOIN v ON v.user_id = p.user_id AND v.ts <= p.ts)
SELECT purchase_id, user_id, view_id, gap_us FROM j WHERE rn = 1"""

def q_events_range_join(sf_dir: str):
    """Range join (the other custom-join shape): purchases joined into the
    per-user SESSION WINDOW containing them — sessionize builds the non-
    overlapping intervals, interval_join resolves containment per key bucket
    with the as-of + end-filter kernel (stages/asof.py::interval_join)."""
    import pyarrow.compute as pc

    from ..stages.asof import interval_join
    from ..stages.clusters import sessionize

    sessions = sessionize(
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"])
    )

    def only_purchase(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["event_type"], "purchase")).drop_columns(["event_type"])

    purchases = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    ).map_batches(only_purchase, batch_format="pyarrow")
    return interval_join(
        purchases, sessions, key_col="user_id", ts_col="ts", point_id="event_id",
        out_point="purchase_id", out_interval="session_idx",
    )


ORACLES3["events_range_join"] = """
WITH ordered AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
  FROM events
), flagged AS (
  SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_sess
  FROM ordered
), sess AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
  FROM flagged
), sessions AS (
  SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
         MIN(ts_us) AS start_us, MAX(ts_us) AS end_us
  FROM sess GROUP BY user_id, session_idx
), p AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
  WHERE event_type = 'purchase'
)
SELECT p.event_id AS purchase_id, p.user_id, s.session_idx,
       p.ts_us - s.start_us AS offset_us
FROM p JOIN sessions s
  ON s.user_id = p.user_id AND p.ts_us BETWEEN s.start_us AND s.end_us"""

def q_docs_lm_score(sf_dir: str):
    """CCNet-style LM quality score: corpus-fit bigram LM (add-one smoothing),
    per-doc mean transition log-probability — two bounded-aggregate passes +
    one vectorized scoring pass (stages/text_analysis.py::lm_score_pipeline)."""
    from ..stages.text_analysis import lm_score_pipeline

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return lm_score_pipeline(ds).select_columns(["doc_id", "n_trans", "lm_score"])


ORACLES3["docs_lm_score"] = """
WITH s AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
uni AS (SELECT w, count(*) AS n FROM (SELECT unnest(t) AS w FROM s) GROUP BY 1),
v AS (SELECT count(*) AS v FROM uni),
tr AS (SELECT doc_id, unnest(list_transform(range(1, len(t)), j ->
           {'w1': t[j], 'b': t[j] || ' ' || t[j+1], 'j': j})) AS u
       FROM s),
tx AS (SELECT doc_id, u.w1 AS w1, u.b AS b, u.j AS j FROM tr),
big AS (SELECT b, count(*) AS n FROM tx GROUP BY 1),
lp AS (SELECT tx.doc_id, tx.j,
              ln((coalesce(bg.n, 0) + 1.0) / (un.n + v.v)) AS logp
       FROM tx JOIN uni un ON un.w = tx.w1
       LEFT JOIN big bg ON bg.b = tx.b, v),
agg AS (SELECT doc_id, count(*) AS n_trans,
               list_sum(list(logp ORDER BY j)) / count(*) AS m
        FROM lp GROUP BY doc_id)
SELECT s.doc_id, coalesce(a.n_trans, 0) AS n_trans,
       CASE WHEN a.n_trans > 0 THEN floor(a.m * 1e6 + 0.5) / 1e6 END AS lm_score
FROM s LEFT JOIN agg a USING (doc_id)"""

_EPOCH = 3
_EPOCH_SHARDS = 16


def q_docs_epoch_shuffle(sf_dir: str):
    """Deterministic epoch reshuffle for training loaders: each epoch permutes
    the corpus by hashing (doc_id, epoch) — docs land in one of N loader
    shards with a within-shard position, no RNG state, any epoch reproducible.
    Shard ranks are computed per shard bucket with a vectorized argsort — one
    bounded exchange, never a global sort. _EPOCH_SHARDS is the task-memory
    knob: size it so corpus/shards fits one task (the DOCS_PER_BUCKET
    argument); loaders at 100 TB run thousands of shards."""
    import pyarrow.compute as pc

    from ..functions.hashing import fnv1a64_arrow

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def hashed(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(t["doc_id"], pa.string()), str(_EPOCH), ":"
        )
        h = fnv1a64_arrow(key.combine_chunks())
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "h": pa.array(h.astype(np.int64), pa.int64()),
                "shard": pa.array(
                    (h % np.uint64(_EPOCH_SHARDS)).astype(np.int64), pa.int64()
                ),
            }
        )

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["h", "doc_id"], kind="mergesort")
        df["shard_pos"] = np.arange(len(df), dtype=np.int64)
        return df[["doc_id", "shard", "shard_pos"]]

    return (
        ds.map_batches(hashed, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(rank, batch_format="pandas")
    )


_FNV64_EPOCH = (
    "CAST(list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT), "
    f"list_transform(string_split(CAST(doc_id AS VARCHAR) || ':{_EPOCH}', ''), "
    "c -> unicode(c)::HUGEINT)), "
    "(acc, x) -> (xor(acc, x) * 1099511628211) % 18446744073709551616) AS HUGEINT)"
)

ORACLES3["docs_epoch_shuffle"] = f"""
WITH h AS (
  SELECT doc_id, {_FNV64_EPOCH} AS hu FROM documents
),
x AS (
  SELECT doc_id,
         CAST(CASE WHEN hu >= 9223372036854775808 THEN hu - 18446744073709551616
                   ELSE hu END AS BIGINT) AS h,
         CAST(hu % {_EPOCH_SHARDS} AS BIGINT) AS shard
  FROM h
)
SELECT doc_id, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) - 1 AS BIGINT)
         AS shard_pos
FROM x"""


_TOPK_PER_STRATUM = 20


def q_docs_topk_sample(sf_dir: str):
    """Exact-k-per-stratum deterministic sample: within each language the k
    docs with the smallest id hash (reservoir sampling's batch equivalent —
    stable membership, exactly k per stratum). Strata are bounded, so the
    per-stratum rank is a bounded map_groups with a vectorized argsort."""
    import pyarrow.compute as pc

    from ..functions.hashing import fnv1a32_arrow

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])

    def local_topk(t: pa.Table) -> pa.Table:
        # per-batch combiner: at most k rows per (batch, lang) survive, so the
        # final per-stratum group sees ≤ k × #batches rows, never the stratum
        h = fnv1a32_arrow(pc.cast(t["doc_id"], pa.string()).combine_chunks())
        df = pd.DataFrame(
            {
                "doc_id": t["doc_id"].to_numpy(zero_copy_only=False),
                "lang": t["lang"].to_pandas(),
                "h": h.astype(np.int64),
            }
        )
        df = df.sort_values(["lang", "h", "doc_id"], kind="mergesort")
        df = df.groupby("lang", as_index=False).head(_TOPK_PER_STRATUM)
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["h", "doc_id"], kind="mergesort").head(_TOPK_PER_STRATUM)
        return df[["doc_id", "lang"]]

    return (
        ds.map_batches(local_topk, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(topk, batch_format="pandas")
    )


ORACLES3["docs_topk_sample"] = f"""
WITH h AS (SELECT doc_id, lang, {_FNV32_DOC.replace(') % 100', ')')} AS h FROM documents),
r AS (SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rk
      FROM h)
SELECT doc_id, lang FROM r WHERE rk <= {_TOPK_PER_STRATUM}"""

# Line-level dedup (C4 / Lee et al. 2021): the "line" unit on this word-stream
# corpus is a fixed 2-word window — see stages/linededup.py for the rationale.
_LINE_W = 2

_LINE_CHUNKS_CTE = f"""
w AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS word,
         unnest(range(len(string_split(text, ' ')))) AS ord
  FROM documents
), c AS (
  SELECT doc_id, ord // {_LINE_W} AS widx, string_agg(word, ' ' ORDER BY ord) AS chunk
  FROM w GROUP BY doc_id, (ord // {_LINE_W})
)"""


def q_docs_line_dedup(sf_dir: str):
    """Within-document window dedup (C4-style repeated-span removal): drop all
    but the first occurrence of each distinct 2-word window inside a doc and
    re-join. Pure map_batches — zero shuffles, streams at any corpus size."""
    from ..stages.linededup import line_dedup_docs

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return line_dedup_docs(ds, window=_LINE_W)


ORACLES3["docs_line_dedup"] = f"""
WITH {_LINE_CHUNKS_CTE}, k AS (
  SELECT doc_id, widx, chunk,
         row_number() OVER (PARTITION BY doc_id, chunk ORDER BY widx) AS rn,
         count(*) OVER (PARTITION BY doc_id) AS n_windows
  FROM c
)
SELECT doc_id,
       string_agg(chunk, ' ' ORDER BY widx) AS text,
       CAST(max(n_windows) AS BIGINT) AS n_windows,
       CAST(count(*) AS BIGINT) AS n_kept
FROM k WHERE rn = 1 GROUP BY doc_id"""


def q_docs_line_dedup_global(sf_dir: str):
    """Corpus-global first-wins window dedup (Lee et al. 2021 shape): each
    distinct 2-word window survives only at its minimum (doc_id, widx)
    occurrence corpus-wide; docs are reassembled from their surviving windows.
    Two bounded exchanges (chunk-hash election, doc-hash reassembly)."""
    from ..stages.linededup import line_dedup_global

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return line_dedup_global(ds, window=_LINE_W, num_buckets=64)


ORACLES3["docs_line_dedup_global"] = f"""
WITH {_LINE_CHUNKS_CTE}, k AS (
  SELECT doc_id, widx, chunk,
         row_number() OVER (PARTITION BY chunk ORDER BY doc_id, widx) AS rn
  FROM c
)
SELECT doc_id,
       string_agg(chunk, ' ' ORDER BY widx) AS text,
       CAST(count(*) AS BIGINT) AS n_kept
FROM k WHERE rn = 1 GROUP BY doc_id"""


def q_docs_bloom_contamination(sf_dir: str):
    """Bloom-filter decontamination: the probe 5-gram set compressed to a 65536-bit
    Bloom filter (FNV-1a64 double hashing, k=5) — the O(1)-memory broadcast a
    100 TB run ships when the benchmark suite outgrows an exact string set.
    False positives are deterministic, so the oracle replays membership —
    including every FP — bit-for-bit (stages/dedup_docs.py::bloom_contamination)."""
    from ..stages.dedup_docs import bloom_contamination

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return bloom_contamination(ds)


ORACLES3["docs_bloom_contamination"] = f"""
WITH f AS (SELECT doc_id, {_FNV32_DOC20} AS hsel, string_split(text, ' ') AS t FROM documents),
g AS (SELECT doc_id, hsel,
             unnest(list_transform(range(1, len(t) - 3), i ->
               t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4])) AS gram
      FROM f WHERE len(t) >= 5),
d AS (SELECT DISTINCT doc_id, hsel, gram FROM g),
ps AS (SELECT doc_id, hsel, gram, {_FNV64_GRAM} AS hv FROM d),
pp AS (SELECT doc_id, hsel, gram, hv % 65536 AS h1,
              ((hv // 8589934592) % 65535) + 1 AS h2
       FROM ps),
bits AS (SELECT DISTINCT CAST((h1 + j.j * h2) % 65536 AS BIGINT) AS bit
         FROM pp CROSS JOIN unnest(range(0, 5)) AS j(j) WHERE hsel = 0),
hits AS (
  SELECT p.doc_id, p.gram
  FROM pp p
  CROSS JOIN unnest(range(0, 5)) AS j(j)
  JOIN bits b ON b.bit = CAST((p.h1 + j.j * p.h2) % 65536 AS BIGINT)
  WHERE p.hsel <> 0
  GROUP BY p.doc_id, p.gram
  HAVING count(*) = 5
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_flagged FROM hits GROUP BY doc_id"""


def q_events_rolling(sf_dir: str):
    """Per-user rolling sum over the last 3 events in (ts, event_id) order —
    the ordered stateful scan behind running per-key metrics. One bounded
    user-bucket exchange + vectorized prefix-sum difference; values sum as
    exact integer cents (stages/clusters.py::rolling_sum)."""
    from ..stages.clusters import rolling_sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )
    return rolling_sum(ds, window_rows=3)


ORACLES3["events_rolling"] = """
SELECT event_id, user_id,
       SUM(CAST(round(value * 100) AS BIGINT)) OVER w / 100.0 AS roll_sum,
       CAST(count(*) OVER w AS BIGINT) AS n_window
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)"""


def q_events_jsonl_ingest(sf_dir: str):
    """JSON wire-format ingest (the OTLP/HTTP JSON receiver analogue, S1
    family): the events stream is materialized once as JSONL under /tmp
    (Ray `write_json`, idempotent per sf), re-ingested with
    `ray.data.read_json`, and aggregated — proving the non-parquet source
    path end-to-end. Values aggregate as exact integer cents."""
    import hashlib
    import os

    import pyarrow.compute as pc

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    jdir = f"/tmp/graft_jsonl_{tag}"
    marker = os.path.join(jdir, "_DONE")
    if not os.path.exists(marker):
        ds = ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "user_id", "event_type", "value"],
        )
        ds.write_json(jdir)
        open(marker, "w").write("ok")
    j = ray.data.read_json(
        [os.path.join(jdir, f) for f in sorted(os.listdir(jdir)) if f.endswith(".json")]
    )

    def agg(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        g = (
            pa.table({"event_type": t["event_type"], "cents": cents})
            .group_by(["event_type"])
            .aggregate([("cents", "sum"), ("cents", "count")])
        )
        return g.rename_columns(["event_type", "pc", "pn"])

    from ray.data.aggregate import Sum

    part = j.map_batches(agg, batch_format="pyarrow")
    out = part.groupby("event_type").aggregate(
        Sum("pc", alias_name="c"), Sum("pn", alias_name="n_events")
    )

    def final(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "total_value": pc.divide(pc.cast(t["c"], pa.float64()), 100.0),
                "n_events": pc.cast(t["n_events"], pa.int64()),
            }
        )

    return out.map_batches(final, batch_format="pyarrow")


ORACLES3["events_jsonl_ingest"] = """
SELECT event_type,
       SUM(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total_value,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY event_type"""


def q_docs_length_filter(sf_dir: str):
    """Quantile-threshold filtering — the two-pass shape for 'drop the shortest
    10% of the corpus' at scale: pass 1 reduces the corpus to ONE mergeable
    128-bin log sketch (O(bins) driver state) whose P10 estimate becomes the
    threshold; pass 2 streams the corpus through a vectorized length filter.
    The sketch estimate is approximate by design but fully deterministic, so
    the oracle replays bins → pick → geometric midpoint → filter exactly."""
    import pyarrow.compute as pc

    from ..stages.quantiles import quantile_sketch

    def ntok(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.fill_null(t["text"], ""), " ")
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pc.cast(pc.list_value_length(toks), pa.int64()),
            }
        )

    def counted():
        return ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ).map_batches(ntok, batch_format="pyarrow")

    thr = float(
        quantile_sketch(counted(), "n_tokens", qs=[0.1])["estimate"].iloc[0]
    )
    return counted().map_batches(
        lambda t: t.filter(pc.greater_equal(pc.cast(t["n_tokens"], pa.float64()), thr)),
        batch_format="pyarrow",
    )


def _docs_length_filter_oracle() -> str:
    from ..stages.quantiles import _EDGES, _HI, _LO

    e_sql = "CAST([" + ", ".join(repr(float(x)) for x in _EDGES) + "] AS DOUBLE[])"
    n_edges = len(_EDGES)
    return f"""
WITH toks AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
vals AS (
  SELECT greatest(CAST({_LO!r} AS DOUBLE),
                  least(CAST(n_tokens AS DOUBLE), CAST({_HI - 1!r} AS DOUBLE))) AS v
  FROM toks
),
binned AS (SELECT len(list_filter({e_sql}, e -> e <= v)) AS b FROM vals),
counts AS (SELECT b, COUNT(*) AS c FROM binned GROUP BY 1),
tot AS (SELECT SUM(c) AS total FROM counts),
cum AS (SELECT b, SUM(c) OVER (ORDER BY b) AS cum FROM counts),
pick AS (SELECT MIN(c.b) AS bsel FROM tot t JOIN cum c ON c.cum >= 0.1 * t.total),
thr AS (
  SELECT sqrt(
    CASE WHEN bsel > 0 THEN ({e_sql})[bsel] ELSE CAST({_LO!r} AS DOUBLE) END *
    CASE WHEN bsel < {n_edges} THEN ({e_sql})[bsel + 1] ELSE CAST({_HI!r} AS DOUBLE) END
  ) AS t FROM pick
)
SELECT doc_id, n_tokens FROM toks, thr WHERE CAST(n_tokens AS DOUBLE) >= thr.t"""


ORACLES3["docs_length_filter"] = _docs_length_filter_oracle()


QUERIES3 = {
    "events_asof": q_events_asof,
    "events_range_join": q_events_range_join,
    "docs_lm_score": q_docs_lm_score,
    "docs_epoch_shuffle": q_docs_epoch_shuffle,
    "docs_topk_sample": q_docs_topk_sample,
    "docs_repetition": q_docs_repetition,
    "docs_contamination": q_docs_contamination,
    "docs_pack": q_docs_pack,
    "docs_sample_stratified": q_docs_sample_stratified,
    "docs_tfidf": q_docs_tfidf,
    "metrics_dispatch": q_metrics_dispatch,
    "body_normalize": q_body_normalize,
    "docs_token_count_bpe": q_docs_token_count_bpe,
    "media_features": q_media_features,
    "events_sessionize": q_events_sessionize,
    "events_sliding": q_events_sliding,
    "docs_vocab": q_docs_vocab,
    "docs_gopher": q_docs_gopher,
    "docs_split": q_docs_split,
    "audio_features": q_audio_features,
    "image_thumbs": q_image_thumbs,
    "video_frames": q_video_frames,
    "emb_pca": q_emb_pca,
    "docs_join_emb": q_docs_join_emb,
    "orders_top_per_cust": q_orders_top_per_cust,
    "neardup_components": q_neardup_components,
    "docs_neardup_dedup": q_docs_neardup_dedup,
    "sg_latency_sketch": q_sg_latency_sketch,
    "docs_line_dedup": q_docs_line_dedup,
    "docs_line_dedup_global": q_docs_line_dedup_global,
    "image_augment": q_image_augment,
    "video_scenes": q_video_scenes,
    "docs_bloom_contamination": q_docs_bloom_contamination,
    "events_rolling": q_events_rolling,
    "events_jsonl_ingest": q_events_jsonl_ingest,
    "docs_length_filter": q_docs_length_filter,
}


# ---------------------------------------------------------------------------
# Dynamic oracles — SQL generated at oracle_sql() call time because the inlined
# constants derive from the INPUT TABLE (per scale factor), not just a seed.
# The target sf comes from GRAFT_ORACLE_SF_DIR (default: the driver gate's
# /root/testdata/sf0.01); tests/conftest.py points it at the test sf.
# ---------------------------------------------------------------------------

def _emb_pca_oracle(sf_dir: str, k: int = 8, sample_size: int = 2048) -> str:
    """Replay of `pca_project(flat=True)`: re-run the engine's exact fit (same
    file order, same numpy ops ⇒ identical float64 mean/components), inline the
    constants (repr round-trips doubles), and replay center → per-dim dot →
    round-6 in SQL. The eigendecomposition itself is verified by unit tests
    (orthonormality, variance ordering); this oracle verifies the distributed
    projection end-to-end against the constants the fit produced."""
    import pyarrow.parquet as _pq

    from ..functions.vectors import stack_list_column
    from ..stages.embeddings import fit_pca

    t = _pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).slice(0, sample_size)
    mean, comps = fit_pca(stack_list_column(t["embedding"]), k)
    mean_sql = "[" + ", ".join(repr(float(v)) for v in mean) + "]"
    cols = ",\n       ".join(
        f"round(list_dot_product(cv, ["
        + ", ".join(repr(float(v)) for v in comps[:, j])
        + f"]), 6) AS pca_{j}"
        for j in range(k)
    )
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
c AS (SELECT vec_id,
             list_transform(list_zip(v, {mean_sql}), p -> p[1] - p[2]) AS cv
      FROM e)
SELECT vec_id,
       {cols}
FROM c"""


def dynamic_oracles() -> dict[str, str]:
    """Oracles whose SQL depends on the input tables (fit constants inlined per
    scale factor). Generated lazily so the env override is honored."""
    import os

    sf_dir = os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    out: dict[str, str] = {}
    try:
        out["emb_pca"] = _emb_pca_oracle(sf_dir)
    except (OSError, FileNotFoundError):  # sf dir without embeddings: rows-only
        pass
    return out
