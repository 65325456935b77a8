"""Driver-contract queries, wave 324 — sign-code calibration (how well
1-bit SimHash Hamming distances recover true cosines on the bounded
embedding sample) and the per-shard clock-phase audit (median
minute-of-hour per user shard — the skew detector for fleet clocks).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES324: dict[str, str] = {}

_SC_MAX_ID = 256
_CP_SHARDS = 16


# ---------------------------------------------------------------------------
# emb_signcode_calibration — 1-bit code distance vs true cosine
# ---------------------------------------------------------------------------


def q_emb_signcode_calibration(sf_dir: str):
    """SimHash calibration on the vec_id < 256 sample: per pair the
    true cosine (dimension-sequential, the bit-exact list_dot_product
    mirror) and the 1-bit estimate cos(pi h / d) from the sign-code
    Hamming distance h (computed EXACTLY as (d - dot(sign_a, sign_b))
    / 2 with +-1 signs, sign(x) = 1 iff x >= 0). One row: n_pairs,
    mae_micro (mean |est - true|), bias_micro (mean est - true),
    corr_micro."""

    import pyarrow.compute as pc

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(t["vec_id"], _SC_MAX_ID))

    t = (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        .map_batches(keep, batch_format="pyarrow")
        .to_pandas()
        .sort_values("vec_id")
    )
    cols = ["n_pairs", "mae_micro", "bias_micro", "corr_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if len(t) < 2:
        return empty
    v = np.stack([np.asarray(e) for e in t["embedding"]]).astype(np.float64)
    n, d = v.shape
    norms2 = np.zeros(n)
    dots = np.zeros((n, n))
    for j in range(d):
        norms2 = norms2 + v[:, j] * v[:, j]
        dots = dots + v[:, j][:, None] * v[None, :, j]
    iu = np.triu_indices(n, k=1)
    true_cos = dots[iu] / (
        np.sqrt(norms2)[iu[0]] * np.sqrt(norms2)[iu[1]]
    )
    signs = np.where(v >= 0.0, 1, -1).astype(np.int64)
    sdot = signs @ signs.T
    h = (d - sdot[iu]) // 2
    est = np.cos(np.pi * h.astype(np.float64) / float(d))
    diff = est - true_cos
    m = len(diff)
    mae = float(np.abs(diff).mean())
    bias = float(diff.mean())
    sx, sy = float(est.sum()), float(true_cos.sum())
    sxx = float((est * est).sum())
    syy = float((true_cos * true_cos).sum())
    sxy = float((est * true_cos).sum())
    den = (m * sxx - sx * sx) * (m * syy - sy * sy)
    corr = (
        (m * sxy - sx * sy) / float(np.sqrt(den)) if den > 0.0 else 0.0
    )
    return pd.DataFrame(
        [
            (
                np.int64(m),
                np.int64(np.floor(mae * 1_000_000.0 + 0.5)),
                np.int64(np.floor(bias * 1_000_000.0 + 0.5)),
                np.int64(np.floor(corr * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES324["emb_signcode_calibration"] = f"""
WITH s AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CASE WHEN x >= 0 THEN 1.0 ELSE -1.0 END)
           AS sg,
         len(embedding) AS d
  FROM embeddings WHERE vec_id < {_SC_MAX_ID}
),
pairs AS (
  SELECT a.d,
         list_dot_product(a.v, b.v)
           / (sqrt(list_dot_product(a.v, a.v))
              * sqrt(list_dot_product(b.v, b.v))) AS tc,
         CAST((a.d - CAST(list_dot_product(a.sg, b.sg) AS BIGINT)) // 2
              AS BIGINT) AS h
  FROM s a JOIN s b ON a.vec_id < b.vec_id
),
est AS (
  SELECT cos(pi() * h / d) AS e, tc FROM pairs
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         avg(abs(e - tc)) AS mae, avg(e - tc) AS bias,
         count(*) * sum(e * tc) - sum(e) * sum(tc) AS cnum,
         (count(*) * sum(e * e) - sum(e) * sum(e))
           * (count(*) * sum(tc * tc) - sum(tc) * sum(tc)) AS cden
  FROM est
)
SELECT n AS n_pairs,
       CAST(floor(mae * 1000000.0 + 0.5) AS BIGINT) AS mae_micro,
       CAST(floor(bias * 1000000.0 + 0.5) AS BIGINT) AS bias_micro,
       CAST(floor(CASE WHEN cden > 0 THEN cnum / sqrt(cden) ELSE 0.0 END
                  * 1000000.0 + 0.5) AS BIGINT) AS corr_micro
FROM m
WHERE n >= 1"""


# ---------------------------------------------------------------------------
# events_shard_clock_phase — minute-of-hour phase per user shard
# ---------------------------------------------------------------------------


def q_events_shard_clock_phase(sf_dir: str):
    """Clock-phase audit: per user shard (user_id % 16) the LOWER-median
    minute-of-hour of its events vs the global lower median — a shard
    whose phase is systematically offset has a skewed clock or a batchy
    emitter. Exact order statistics off bounded 60-bin histograms. Per
    shard: shard, n_events, med_minute, offset_minutes.

    Scale shape: one (shard, minute -> count) combiner; the driver
    folds 16 x 60 scalars."""

    def partial(t: pa.Table) -> pd.DataFrame:
        us = pa.compute.cast(t["ts"], pa.int64()).to_numpy()
        minute = (us // 60_000_000) % 60
        sh = (
            t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            % _CP_SHARDS
        )
        g = (
            pd.DataFrame({"sh": sh, "mi": minute})
            .groupby(["sh", "mi"])
            .size()
            .rename("c")
            .reset_index()
        )
        g["c"] = g["c"].astype(np.int64)
        return g

    h = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["sh", "mi"])["c"]
        .sum()
    )
    cols = ["shard", "n_events", "med_minute", "offset_minutes"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if h.empty:
        return empty

    def lower_med(series: pd.Series) -> int:
        mi = series.index.to_numpy(np.int64)
        c = series.to_numpy(np.int64)
        n = int(c.sum())
        cum = np.cumsum(c)
        k = (n + 1) // 2
        return int(mi[int(np.searchsorted(cum, k, side="left"))])

    glob = h.groupby(level=1).sum()
    gmed = lower_med(glob)
    rows = []
    for sh in sorted(set(h.index.get_level_values(0))):
        sub = h.loc[sh].sort_index()
        med = lower_med(sub)
        rows.append(
            (
                np.int64(int(sh)), np.int64(int(sub.sum())),
                np.int64(med), np.int64(med - gmed),
            )
        )
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols}
    )


ORACLES324["events_shard_clock_phase"] = f"""
WITH base AS (
  SELECT CAST(user_id % {_CP_SHARDS} AS BIGINT) AS sh,
         CAST((epoch_us(ts) // 60000000) % 60 AS BIGINT) AS mi
  FROM events
),
h AS (
  SELECT sh, mi, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY 1, 2
),
gl AS (SELECT mi, CAST(sum(c) AS BIGINT) AS c FROM h GROUP BY 1),
gn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM gl),
gmed AS (
  SELECT min(mi) AS m FROM (
    SELECT mi, sum(c) OVER (ORDER BY mi) AS cum FROM gl
  ), gn WHERE cum >= (gn.n + 1) // 2
),
sn AS (SELECT sh, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1),
smed AS (
  SELECT sn.sh, sn.n, min(cc.mi) AS m
  FROM sn JOIN (
    SELECT sh, mi, sum(c) OVER (PARTITION BY sh ORDER BY mi) AS cum
    FROM h
  ) cc ON cc.sh = sn.sh AND cc.cum >= (sn.n + 1) // 2
  GROUP BY 1, 2
)
SELECT smed.sh AS shard, smed.n AS n_events,
       CAST(smed.m AS BIGINT) AS med_minute,
       CAST(smed.m - gmed.m AS BIGINT) AS offset_minutes
FROM smed, gmed
ORDER BY shard"""


QUERIES324 = {
    "emb_signcode_calibration": q_emb_signcode_calibration,
    "events_shard_clock_phase": q_events_shard_clock_phase,
}
