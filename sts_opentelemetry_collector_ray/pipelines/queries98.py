"""Driver-contract queries, wave 98 — image edge density (horizontal
gradient statistics over the synthesized RGB corpus: the blur/quality screen
with EXACT integer outputs and a full-pixel SQL replay) and deterministic
differential-privacy counts (per-type counts released with seeded Laplace
noise — the privacy-release primitive, hash-derived so the oracle replays
the noise draw exactly). Same contract as queries.py: column names AND
dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .queries5 import _fnv32_sql

ORACLES98: dict[str, str] = {}

_EDGE_T = 32
_DP_EPS = 1.0  # Laplace scale b = sensitivity/ε = 1/ε


# ---------------------------------------------------------------------------
# image_edges — horizontal gradient stats per synthesized bitmap
# ---------------------------------------------------------------------------


def q_image_edges(sf_dir: str):
    """REAL edge path: deterministic RGB24 bitmaps keyed by doc_id →
    actor-pool horizontal-gradient stats (stages/multimodal.py::
    ImageEdgeActor — one batched |diff| over the red channel). edge_px
    counts gradients ≥ {T}; grad_sum totals them; both exact integers.
    Oracled by a full-pixel SQL replay of the closed-form bitmap (the
    image_thumbs oracle technique) with a lag() window as ∂/∂x.""".format(
        T=_EDGE_T
    )
    from ..stages.multimodal import ImageEdgeActor, synthesize_image_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    media = ds.map_batches(synthesize_image_batch, batch_format="pyarrow")
    return media.map_batches(
        ImageEdgeActor,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 2),
        num_cpus=1,
    ).select_columns(["media_id", "edge_px", "grad_sum"])


def _image_edges_oracle() -> str:
    from ..stages.multimodal import IMG_H, IMG_W

    return f"""
WITH px AS (
  SELECT d.doc_id, y.y AS y, x.x AS x,
         CASE WHEN x.x >= d.doc_id % {IMG_W - 16}
               AND x.x <  d.doc_id % {IMG_W - 16} + 16
               AND y.y >= (d.doc_id * 7) % {IMG_H - 12}
               AND y.y <  (d.doc_id * 7) % {IMG_H - 12} + 12
              THEN 255 - (x.x * 255) // {IMG_W - 1}
              ELSE (x.x * 255) // {IMG_W - 1} END AS r
  FROM documents d,
       unnest(range(0, {IMG_H})) AS y(y),
       unnest(range(0, {IMG_W})) AS x(x)
),
dif AS (
  SELECT doc_id,
         abs(r - lag(r) OVER (PARTITION BY doc_id, y ORDER BY x)) AS gx
  FROM px
)
SELECT doc_id AS media_id,
       CAST(count(*) FILTER (gx >= {_EDGE_T}) AS BIGINT) AS edge_px,
       CAST(sum(gx) AS BIGINT) AS grad_sum
FROM dif WHERE gx IS NOT NULL GROUP BY doc_id"""


ORACLES98["image_edges"] = _image_edges_oracle()


# ---------------------------------------------------------------------------
# events_dp_counts — seeded-Laplace differentially-private count release
# ---------------------------------------------------------------------------


def q_events_dp_counts(sf_dir: str):
    """DP count release: per event type, the exact count plus Laplace(1/ε)
    noise whose uniform draw is DETERMINISTIC — u = fnv1a32(type)/2³², noise
    = −sign(u−½)·ln(1−2|u−½|)/ε (inverse CDF) — so runs are reproducible and
    the SQL oracle replays the draw bit-for-bit (same fixed-parenthesization
    double expression; ε = {e}). Released value only, rounded half-up at
    1e-6 micro-counts.

    Scale shape: per-batch (type, n) combiner partials fold on the driver;
    the noise is O(|types|) driver math — no shuffle at all.""".format(
        e=_DP_EPS
    )
    from ..functions.hashing import fnv1a32

    def partial(t: pa.Table) -> pd.DataFrame:
        et = np.asarray(t["event_type"].to_numpy(zero_copy_only=False))
        uu, cc = np.unique(et, return_counts=True)
        return pd.DataFrame({"event_type": uu, "n": cc.astype(np.int64)})

    part = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    g = part.groupby("event_type", sort=True)["n"].sum().reset_index()
    tys = g["event_type"].to_numpy(object)
    n = g["n"].to_numpy(np.int64).astype(np.float64)
    u = np.array([fnv1a32(t) for t in tys], np.float64) / 4294967296.0
    c = u - 0.5
    # fixed parenthesization — mirrored token-for-token in the SQL replay
    noisy = n + (-(np.sign(c)) * np.log(1.0 - 2.0 * np.abs(c))) / _DP_EPS
    return pd.DataFrame(
        {
            "event_type": tys,
            "noisy_micro": np.floor(noisy * 1_000_000.0 + 0.5).astype(np.int64),
        }
    )


ORACLES98["events_dp_counts"] = f"""
WITH t AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1
),
w AS (
  SELECT event_type, n,
         CAST({_fnv32_sql('event_type')} AS DOUBLE) / 4294967296.0 - 0.5 AS c
  FROM t
)
SELECT event_type,
       CAST(floor((CAST(n AS DOUBLE)
                   + (-(sign(c)) * ln(1.0 - 2.0 * abs(c))) / {_DP_EPS})
                  * 1000000.0 + 0.5) AS BIGINT) AS noisy_micro
FROM w"""


QUERIES98 = {
    "image_edges": q_image_edges,
    "events_dp_counts": q_events_dp_counts,
}
