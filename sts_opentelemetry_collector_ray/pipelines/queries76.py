"""Driver-contract queries, wave 76 — simplified silhouette score per label
(cluster-quality readout against fixed-point centroids: a/b distances, exact
integer geometry) and a windowed band join over events (for every click, the
purchases by the same user inside the following 30 minutes — the
time-proximity join behind attribution and conversion windows). Same contract
as queries.py: column names AND dtypes match the DuckDB oracle exactly.

Silhouette determinism: components quantize to 2⁻²⁰ fixed point (the wave-63
centroid convention), so centroids and all squared distances are EXACT
integers; the only floats are sqrt/divide over identical integers in both
engines, and the per-vector score is micro-quantized before the distributed
sum."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES76: dict[str, str] = {}

_SIL_SCALE = 1 << 20
_SIL_OFF = 1 << 40  # floor-div offset: DuckDB // truncates, Python floors
_SIL_DIM = 64
_BAND_A = "click"
_BAND_B = "purchase"
_BAND_W_US = 1_800_000_000  # 30 minutes
_BAND_BUCKETS = 64
_BAND_SPAN = 1 << 49  # > max ts_rel + window (ts span ≈ 2.2e14 us ≪ 2^49)


# ---------------------------------------------------------------------------
# emb_silhouette — simplified silhouette per label (centroid a/b distances)
# ---------------------------------------------------------------------------


def q_emb_silhouette(sf_dir: str):
    """Simplified silhouette (Hruschka et al.'s centroid variant): per vector,
    a = distance to its own label centroid, b = min distance to any OTHER
    label centroid, s = (b−a)/max(a,b) (0 when both are 0); report per label
    the floor-mean of micro-quantized s and the vector count.

    Scale shape: pass 1 reduces to |labels|×d integer centroid sums (the
    wave-63 exchange); the int64 centroid matrix broadcasts in the task
    closure; pass 2 computes per-batch n×|labels| exact squared distances
    with one broadcasted subtract and emits per-label (Σ s_micro, n)
    partials — the driver re-reduces |labels| rows."""
    from ..functions.vectors import stack_list_column

    def cen_partial(t: pa.Table) -> pd.DataFrame:
        v = stack_list_column(t["embedding"])
        q = np.floor(v * _SIL_SCALE + 0.5).astype(np.int64)
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        frames = []
        for l in np.unique(lab):
            sel = q[lab == l]
            frames.append(
                pd.DataFrame(
                    {
                        "label": np.full(_SIL_DIM, l, np.int64),
                        "dim": np.arange(_SIL_DIM, dtype=np.int64),
                        "s": sel.sum(axis=0),
                        "n": np.full(_SIL_DIM, len(sel), np.int64),
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    cen = (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
        )
        .map_batches(cen_partial, batch_format="pyarrow")
        .to_pandas()  # bounded: |labels| × d per block
        .groupby(["label", "dim"])
        .agg(s=("s", "sum"), n=("n", "sum"))
        .reset_index()
        .sort_values(["label", "dim"], kind="mergesort")
    )
    labels = np.sort(cen["label"].unique()).astype(np.int64)
    L = len(labels)
    C = (
        (cen["s"].to_numpy(np.int64) // cen["n"].to_numpy(np.int64))
        .reshape(L, _SIL_DIM)
    )  # exact fixed-point centroids, broadcast via closure
    lab_pos = {int(l): i for i, l in enumerate(labels)}

    def sil_partial(t: pa.Table) -> pd.DataFrame:
        v = stack_list_column(t["embedding"])
        q = np.floor(v * _SIL_SCALE + 0.5).astype(np.int64)
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.array([lab_pos[int(l)] for l in lab], np.int64)
        # n×L×d exact integer geometry in one broadcasted subtract
        diff = q[:, None, :] - C[None, :, :]
        d2 = np.einsum("nld,nld->nl", diff, diff)  # int64, exact
        n = len(q)
        a2 = d2[np.arange(n), pos]
        d2o = d2.astype(np.float64)
        d2o[np.arange(n), pos] = np.inf
        b2 = d2o.min(axis=1)
        a = np.sqrt(a2.astype(np.float64))
        b = np.sqrt(b2)
        mx = np.maximum(a, b)
        with np.errstate(invalid="ignore", divide="ignore"):
            s = np.where(mx > 0, (b - a) / np.where(mx > 0, mx, 1.0), 0.0)
        sm = np.floor(s * 1_000_000.0 + 0.5).astype(np.int64)
        g = pd.DataFrame({"label": lab, "sm": sm, "n": np.int64(1)}).groupby(
            "label", sort=False, as_index=False
        ).sum()
        return pd.DataFrame(
            {
                "label": g["label"].to_numpy(np.int64),
                "sm": g["sm"].to_numpy(np.int64),
                "n": g["n"].to_numpy(np.int64),
            }
        )

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
        )
        .map_batches(sil_partial, batch_format="pyarrow")
        .to_pandas()  # bounded: |labels| rows per block
        .groupby("label", as_index=False)[["sm", "n"]]
        .sum()
        .sort_values("label", kind="mergesort")
    )
    sm = part["sm"].to_numpy(np.int64)
    n = part["n"].to_numpy(np.int64)
    return pd.DataFrame(
        {
            "label": part["label"].to_numpy(np.int64),
            "n_vec": n,
            "mean_sil_micro": sm // n,  # numpy floors; SQL replays via offset
        }
    )


ORACLES76["emb_silhouette"] = f"""
WITH u AS (
  SELECT vec_id, CAST(label AS BIGINT) AS own, CAST(g.i AS BIGINT) AS dim,
         CAST(floor(CAST(embedding[CAST(g.i AS INT) + 1] AS DOUBLE)
                    * {_SIL_SCALE} + 0.5) AS BIGINT) AS q
  FROM embeddings CROSS JOIN range(0, {_SIL_DIM}) g(i)
),
a AS (
  SELECT own AS label, dim, sum(CAST(q AS HUGEINT)) AS s,
         CAST(count(*) AS HUGEINT) AS n
  FROM u GROUP BY 1, 2
),
cent AS (
  SELECT label, dim,
         CAST(((s + n * {_SIL_OFF}) // n) - {_SIL_OFF} AS BIGINT) AS cfp
  FROM a
),
d2 AS (
  SELECT u.vec_id, u.own, c.label AS cand,
         sum(CAST((u.q - c.cfp) AS HUGEINT) * CAST((u.q - c.cfp) AS HUGEINT))
           AS d2
  FROM u JOIN cent c ON c.dim = u.dim
  GROUP BY 1, 2, 3
),
ab AS (
  SELECT vec_id, own,
         sqrt(CAST(max(CASE WHEN cand = own THEN d2 END) AS DOUBLE)) AS da,
         sqrt(CAST(min(CASE WHEN cand <> own THEN d2 END) AS DOUBLE)) AS db
  FROM d2 GROUP BY 1, 2
),
s AS (
  SELECT own AS label,
         CAST(floor(CASE WHEN greatest(da, db) > 0
                         THEN (db - da) / greatest(da, db) ELSE 0.0 END
                    * 1000000 + 0.5) AS HUGEINT) AS sm
  FROM ab
),
agg AS (
  SELECT label, sum(sm) AS ssm, CAST(count(*) AS HUGEINT) AS n
  FROM s GROUP BY 1
)
SELECT label, CAST(n AS BIGINT) AS n_vec,
       CAST(((ssm + n * {_SIL_OFF}) // n) - {_SIL_OFF} AS BIGINT)
         AS mean_sil_micro
FROM agg ORDER BY label"""


# ---------------------------------------------------------------------------
# events_band_join — purchases within 30 min after each click, per user
# ---------------------------------------------------------------------------


def q_events_band_join(sf_dir: str):
    """Windowed band join: for every '{A}' event, count the '{B}' events by
    the same user with ts in (click_ts, click_ts + 30 min]; report per user
    the click count and the total pair count (users with ≥1 click).

    Scale shape: both sides filter at the batch level and share ONE
    user-bucket exchange; inside a bucket, users relabel densely (factorize)
    and both sides encode into a single sorted int64 key uid·2⁴⁹ + ts_rel, so
    ALL windows resolve with two vectorized searchsorted calls — no per-user
    loop, no pair materialization. Buckets own users completely and emit
    final per-user rows.""".format(A=_BAND_A, B=_BAND_B)

    def rows(t: pa.Table) -> pd.DataFrame:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        m = (et == _BAND_A) | (et == _BAND_B)
        u = t["user_id"].to_numpy()[m].astype(np.int64)
        ts = t["ts"].cast(pa.int64()).to_numpy()[m]
        return pd.DataFrame(
            {
                "u": u,
                "ts": ts,
                "is_b": (et[m] == _BAND_B).astype(np.int64),
                "_b": (u % _BAND_BUCKETS).astype(np.int64),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        uid, _ = pd.factorize(g["u"], sort=False)
        ts = g["ts"].to_numpy(np.int64)
        ts_rel = ts - ts.min()
        assert ts_rel.max() + _BAND_W_US < _BAND_SPAN  # key-packing invariant
        key = uid.astype(np.int64) * _BAND_SPAN + ts_rel
        is_b = (g["is_b"] == 1).to_numpy()
        bkeys = np.sort(key[is_b])
        akeys = key[~is_b]
        cnt = np.searchsorted(
            bkeys, akeys + _BAND_W_US, side="right"
        ) - np.searchsorted(bkeys, akeys, side="right")
        out = (
            pd.DataFrame({"u": g.loc[~is_b, "u"].to_numpy(np.int64), "c": cnt})
            .groupby("u", sort=False)
            .agg(n_a=("c", "size"), n_pairs=("c", "sum"))
            .reset_index()
        )
        return pd.DataFrame(
            {
                "user_id": out["u"].to_numpy(np.int64),
                "n_a": out["n_a"].to_numpy(np.int64),
                "n_pairs": out["n_pairs"].to_numpy(np.int64),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
        )
        .map_batches(rows, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
    )


ORACLES76["events_band_join"] = f"""
WITH a AS (
  SELECT user_id, ts FROM events WHERE event_type = '{_BAND_A}'
),
b AS (
  SELECT user_id, ts FROM events WHERE event_type = '{_BAND_B}'
),
p AS (
  SELECT a.user_id, CAST(count(*) AS BIGINT) AS np
  FROM a JOIN b ON b.user_id = a.user_id
   AND epoch_us(b.ts) > epoch_us(a.ts)
   AND epoch_us(b.ts) <= epoch_us(a.ts) + {_BAND_W_US}
  GROUP BY 1
),
an AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_a FROM a GROUP BY 1
)
SELECT an.user_id, an.n_a, CAST(COALESCE(p.np, 0) AS BIGINT) AS n_pairs
FROM an LEFT JOIN p ON p.user_id = an.user_id
ORDER BY an.user_id"""


QUERIES76 = {
    "emb_silhouette": q_emb_silhouette,
    "events_band_join": q_events_band_join,
}
