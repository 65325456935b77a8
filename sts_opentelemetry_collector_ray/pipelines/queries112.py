"""Driver-contract queries, wave 112 — mixup augmentation over id-adjacent
images (pixel-mean blends with EXACT per-channel integer checksums: the
training-time regularizer's plumbing, verified by a full-pixel SQL replay)
and the dedup funnel report (how many documents each dedup method keeps,
composed from the already-oracled exact and near-dup stages into one
retention table). Same contract as queries.py: column names AND dtypes
match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES112: dict[str, str] = {}

_MIX_RANGE = 64  # id-range bucket width (the wave-105 overlap pattern)


# ---------------------------------------------------------------------------
# image_mixup — pixel-mean blend of consecutive-id images + exact checksums
# ---------------------------------------------------------------------------


def q_image_mixup(sf_dir: str):
    """Mixup plumbing: for every consecutive id pair (i, i+1), blend the two
    synthesized bitmaps pixelwise as (p₁+p₂)//2 and emit exact per-channel
    checksums of the blend (Σ over pixels) — the augmentation layout with a
    value-level oracle instead of an opaque binary.

    Scale shape: the wave-105 overlapping id-range buckets (ghost row at
    each range edge) co-locate every pair; blending + checksums are one
    vectorized add/sum over the stacked pair frames."""
    from ..stages.multimodal import IMG_H, IMG_W, synthesize_image_batch

    def partial(t: pa.Table) -> pd.DataFrame:
        media = synthesize_image_batch(t)
        ids = media["media_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        payloads = media["payload"].to_pylist()
        rows = []
        for i, p in zip(ids, payloads):
            b = int(i) // _MIX_RANGE
            rows.append({"doc_id": int(i), "p": p, "_b": b, "ghost": 0})
            if int(i) % _MIX_RANGE == 0 and b > 0:
                rows.append({"doc_id": int(i), "p": p, "_b": b - 1, "ghost": 1})
        return pd.DataFrame(rows)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "ghost"], kind="mergesort")
        ids = g["doc_id"].to_numpy(np.int64)
        ghosts = g["ghost"].to_numpy(np.int64)
        imgs = [
            np.frombuffer(p, dtype=np.uint8).reshape(IMG_H, IMG_W, 3).astype(np.int64)
            for p in g["p"].tolist()
        ]
        out = []
        for i in range(len(ids) - 1):
            if ids[i + 1] != ids[i] + 1 or ghosts[i] == 1:
                continue
            mix = (imgs[i] + imgs[i + 1]) // 2
            s = mix.sum(axis=(0, 1))
            out.append(
                {
                    "doc_id": int(ids[i]),
                    "next_doc_id": int(ids[i + 1]),
                    "sum_r": int(s[0]),
                    "sum_g": int(s[1]),
                    "sum_b": int(s[2]),
                }
            )
        if not out:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype=np.int64),
                    "next_doc_id": pd.Series([], dtype=np.int64),
                    "sum_r": pd.Series([], dtype=np.int64),
                    "sum_g": pd.Series([], dtype=np.int64),
                    "sum_b": pd.Series([], dtype=np.int64),
                }
            )
        return pd.DataFrame(out).astype(np.int64)

    return (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
    )


def _mixup_oracle() -> str:
    from ..stages.multimodal import IMG_H, IMG_W

    def r_expr(did: str) -> str:
        return f"""CASE WHEN x.x >= {did} % {IMG_W - 16}
               AND x.x <  {did} % {IMG_W - 16} + 16
               AND y.y >= ({did} * 7) % {IMG_H - 12}
               AND y.y <  ({did} * 7) % {IMG_H - 12} + 12
              THEN 255 - (x.x * 255) // {IMG_W - 1}
              ELSE (x.x * 255) // {IMG_W - 1} END"""

    return f"""
WITH pairs AS (
  SELECT a.doc_id, b.doc_id AS next_doc_id
  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
),
px AS (
  SELECT p.doc_id, p.next_doc_id,
         (({r_expr("p.doc_id")}) + ({r_expr("p.next_doc_id")})) // 2 AS r,
         -- g depends only on y and b only on the id ⇒ blend directly
         (2 * ((y.y * 255) // {IMG_H - 1})) // 2 AS g,
         ((p.doc_id * 37) % 256 + (p.next_doc_id * 37) % 256) // 2 AS b
  FROM pairs p,
       unnest(range(0, {IMG_H})) AS y(y),
       unnest(range(0, {IMG_W})) AS x(x)
)
SELECT doc_id, next_doc_id,
       CAST(sum(r) AS BIGINT) AS sum_r,
       CAST(sum(g) AS BIGINT) AS sum_g,
       CAST(sum(b) AS BIGINT) AS sum_b
FROM px GROUP BY 1, 2"""


ORACLES112["image_mixup"] = _mixup_oracle()


# ---------------------------------------------------------------------------
# docs_dedup_funnel — retention per dedup method, one composed report
# ---------------------------------------------------------------------------


def q_docs_dedup_funnel(sf_dir: str):
    """Dedup funnel: for each method applied INDEPENDENTLY to the corpus —
    exact text dedup (first-wins) and embedding-free near-dup keep-one
    (the oracled docs_neardup_dedup pipeline) — the survivor count and
    retention in exact basis points, plus the corpus row for scale.

    Scale shape: delegates to the two existing oracled pipelines (their
    scale shapes are documented at their definitions) and counts their
    survivors with Dataset.count() — nothing new materializes."""
    from .queries2 import q_docs_dedup_exact
    from .queries3 import q_docs_neardup_dedup

    total = int(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"]).count()
    )

    def n_rows(res) -> int:
        if isinstance(res, ray.data.Dataset):
            return int(res.count())
        return int(len(res))

    kept_exact = n_rows(q_docs_dedup_exact(sf_dir))
    kept_near = n_rows(q_docs_neardup_dedup(sf_dir))
    rows = [
        {"method": "corpus", "n_kept": total},
        {"method": "exact", "n_kept": kept_exact},
        {"method": "neardup", "n_kept": kept_near},
    ]
    out = pd.DataFrame(rows)
    out["n_kept"] = out["n_kept"].astype(np.int64)
    out["kept_bp"] = (
        out["n_kept"].to_numpy(np.int64) * 10_000 // max(total, 1)
    ).astype(np.int64)
    return out


def _funnel_oracle() -> str:
    # compose the EXISTING oracles so the funnel can never drift from the
    # per-method contracts
    from .queries2 import ORACLES2
    from .queries3 import ORACLES3

    exact = ORACLES2["docs_dedup_exact"]
    near = ORACLES3["docs_neardup_dedup"]
    return f"""
WITH tot AS (SELECT count(*) AS n FROM documents),
ex AS (SELECT count(*) AS n FROM ({exact})),
nd AS (SELECT count(*) AS n FROM ({near}))
SELECT 'corpus' AS method, CAST(n AS BIGINT) AS n_kept,
       CAST(10000 AS BIGINT) AS kept_bp FROM tot
UNION ALL
SELECT 'exact', CAST(ex.n AS BIGINT),
       CAST(ex.n * 10000 // greatest(tot.n, 1) AS BIGINT) FROM ex, tot
UNION ALL
SELECT 'neardup', CAST(nd.n AS BIGINT),
       CAST(nd.n * 10000 // greatest(tot.n, 1) AS BIGINT) FROM nd, tot"""


ORACLES112["docs_dedup_funnel"] = _funnel_oracle()


QUERIES112 = {
    "image_mixup": q_image_mixup,
    "docs_dedup_funnel": q_docs_dedup_funnel,
}
