"""Driver-contract queries, wave 47 — Adjusted Rand Index between the
embedding labels and the k-means assignment (the clustering-evaluation
metric) and seasonal-naive forecast evaluation with MASE (the time-series
baseline scorecard). Same contract as queries.py: column names AND dtypes
match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES47: dict[str, str] = {}

_MASE_SEASON = 168  # hours per week


# ---------------------------------------------------------------------------
# emb_cluster_ari — Adjusted Rand Index, labels vs k-means assignment
# ---------------------------------------------------------------------------


def q_emb_cluster_ari(sf_dir: str):
    """Adjusted Rand Index (Hubert & Arabie 1985) between the ground-truth
    label column and the oracled seed-42 k-means assignment — the standard
    clustering-agreement score, EXACT: pair-count binomials from the bounded
    (cluster, label) contingency grid, the final ratio the only float
    (identical expression order on both sides).

    One map_batches computes assignment AND contingency partials in the same
    pass (labels live in the same table — no join); the exchange carries
    ≤ k×|labels| count rows per block. Output: one row — n, sum_ij, sum_a,
    sum_b (the binomial sums) and ari_micro."""
    from ..functions.vectors import stack_list_column
    from ..stages.similarity import _unit, seeded_centroids

    cents = _unit(seeded_centroids(64, 8, seed=42))

    def partial(t: pa.Table) -> pa.Table:
        mat = stack_list_column(t["embedding"]).astype(np.float64)
        a = (mat @ cents.T).argmax(axis=1).astype(np.int64)
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"cluster": a, "label": lab})
        out = df.groupby(["cluster", "label"], sort=False).size().rename("cnt").reset_index()
        out["cnt"] = out["cnt"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
            None
        )

    cont = (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["embedding", "label"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: ≤ k×labels rows per block
        .groupby(["cluster", "label"])["cnt"]
        .sum()
    )

    def c2(x: np.ndarray) -> np.ndarray:
        return x * (x - 1) // 2

    nij = cont.to_numpy().astype(np.int64)
    ai = cont.groupby("cluster").sum().to_numpy().astype(np.int64)
    bj = cont.groupby("label").sum().to_numpy().astype(np.int64)
    n = int(nij.sum())
    sum_ij = int(c2(nij).sum())
    sum_a = int(c2(ai).sum())
    sum_b = int(c2(bj).sum())
    cn2 = n * (n - 1) // 2
    num = 2 * cn2 * sum_ij - 2 * sum_a * sum_b
    den = cn2 * (sum_a + sum_b) - 2 * sum_a * sum_b
    ari_micro = np.int64(np.floor(1_000_000.0 * num / den + 0.5))
    return pd.DataFrame(
        {
            "n": [np.int64(n)],
            "sum_ij": [np.int64(sum_ij)],
            "sum_a": [np.int64(sum_a)],
            "sum_b": [np.int64(sum_b)],
            "ari_micro": [ari_micro],
        }
    )


def _ari_oracle() -> str:
    from ..stages.similarity import _unit, seeded_centroids

    cents = _unit(seeded_centroids(64, 8, seed=42))
    values = ",\n    ".join(
        f"({ci}, [" + ", ".join(repr(float(x)) for x in cents[ci]) + "])"
        for ci in range(len(cents))
    )
    return f"""
WITH cents(cid, c) AS (
  SELECT * FROM (VALUES
    {values}
  ) t(cid, c)
),
corpus AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, CAST(label AS BIGINT) AS label
  FROM embeddings
),
assign AS (
  SELECT vec_id, label, cid,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY list_dot_product(v, c) DESC, cid ASC) AS r
  FROM corpus, cents
),
cont AS (
  SELECT cid, label, CAST(count(*) AS BIGINT) AS cnt
  FROM assign WHERE r = 1 GROUP BY 1, 2
),
sums AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS n,
         CAST(SUM(cnt * (cnt - 1) // 2) AS BIGINT) AS sum_ij
  FROM cont
),
rowsum AS (
  SELECT CAST(SUM(s * (s - 1) // 2) AS BIGINT) AS sum_a
  FROM (SELECT SUM(cnt) AS s FROM cont GROUP BY cid)
),
colsum AS (
  SELECT CAST(SUM(s * (s - 1) // 2) AS BIGINT) AS sum_b
  FROM (SELECT SUM(cnt) AS s FROM cont GROUP BY label)
)
SELECT n, sum_ij, sum_a, sum_b,
       CAST(floor(1000000.0 *
              (2 * (n * (n - 1) // 2) * sum_ij - 2 * sum_a * sum_b)
              / ((n * (n - 1) // 2) * (sum_a + sum_b) - 2 * sum_a * sum_b)
              + 0.5) AS BIGINT) AS ari_micro
FROM sums, rowsum, colsum"""


ORACLES47["emb_cluster_ari"] = _ari_oracle()


# ---------------------------------------------------------------------------
# events_mase_forecast — seasonal-naive forecast MASE scorecard
# ---------------------------------------------------------------------------


def q_events_mase_forecast(sf_dir: str):
    """Seasonal-naive forecast evaluation (Hyndman & Koehler 2006 MASE): the
    forecast for hour h is the value at h−168 (same hour last week); MASE
    scales its MAE by the one-step naive MAE, both over the DENSE hour grid
    (missing hours are true zeros). Pure integer error sums; the final ratio
    num·(H−1) / (den·(H−168)) is the only float, in SQL expression order
    (products stay ≤2^53 so the doubles are exact).

    Exchange: (type, hour, cents) partial sums — bounded by the hour grid;
    the driver densifies and diffs per type. Output per type: n_hours,
    err_seasonal, err_naive, mase_micro."""

    S = _MASE_SEASON

    def partial(t: pa.Table) -> pa.Table:
        tu = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        hour = (tu // 3_600_000_000).astype(np.int64)
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_numpy(zero_copy_only=False),
                "hour": hour,
                "cents": cents,
            }
        )
        out = (
            df.groupby(["event_type", "hour"], sort=False)["cents"]
            .sum()
            .reset_index()
        )
        out["cents"] = out["cents"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
            None
        )

    grid = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["ts", "value", "event_type"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: hour-grid rows per block
        .groupby(["event_type", "hour"])["cents"]
        .sum()
    )
    hmin = int(grid.index.get_level_values("hour").min())
    hmax = int(grid.index.get_level_values("hour").max())
    hours = np.arange(hmin, hmax + 1, dtype=np.int64)
    H = len(hours)
    rows = []
    for et in sorted(grid.index.get_level_values(0).unique()):
        y = np.zeros(H, dtype=np.int64)
        sub = grid.loc[et]
        y[sub.index.to_numpy() - hmin] = sub.to_numpy()
        err_s = int(np.abs(y[S:] - y[:-S]).sum())
        err_1 = int(np.abs(y[1:] - y[:-1]).sum())
        mase_micro = np.int64(
            np.floor(
                1_000_000.0 * (err_s * (H - 1)) / (err_1 * (H - S)) + 0.5
            )
        )
        rows.append((et, np.int64(H), np.int64(err_s), np.int64(err_1), mase_micro))
    return pd.DataFrame(
        rows,
        columns=["event_type", "n_hours", "err_seasonal", "err_naive", "mase_micro"],
    ).astype(
        {
            "n_hours": np.int64,
            "err_seasonal": np.int64,
            "err_naive": np.int64,
            "mase_micro": np.int64,
        }
    )


ORACLES47["events_mase_forecast"] = f"""
WITH c AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS hour,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
hsum AS (
  SELECT event_type, hour, CAST(SUM(cents) AS BIGINT) AS y
  FROM c GROUP BY 1, 2
),
b AS (SELECT min(hour) AS hmin, max(hour) AS hmax FROM c),
grid AS (
  SELECT t.event_type, b.hmin + i AS hour
  FROM (SELECT DISTINCT event_type FROM c) t, b,
       UNNEST(range(0, b.hmax - b.hmin + 1)) u(i)
),
dense AS (
  SELECT g.event_type, g.hour, coalesce(h.y, 0) AS y
  FROM grid g LEFT JOIN hsum h
    ON h.event_type = g.event_type AND h.hour = g.hour
),
lagged AS (
  SELECT event_type, y,
         lag(y, 1) OVER (PARTITION BY event_type ORDER BY hour) AS y1,
         lag(y, {_MASE_SEASON}) OVER (PARTITION BY event_type ORDER BY hour)
           AS ys
  FROM dense
),
agg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours,
         CAST(SUM(abs(y - ys)) FILTER (ys IS NOT NULL) AS BIGINT)
           AS err_seasonal,
         CAST(SUM(abs(y - y1)) FILTER (y1 IS NOT NULL) AS BIGINT) AS err_naive
  FROM lagged GROUP BY event_type
)
SELECT event_type, n_hours, err_seasonal, err_naive,
       CAST(floor(1000000.0 * (err_seasonal * (n_hours - 1))
                  / (err_naive * (n_hours - {_MASE_SEASON})) + 0.5) AS BIGINT)
         AS mase_micro
FROM agg"""


QUERIES47 = {
    "emb_cluster_ari": q_emb_cluster_ari,
    "events_mase_forecast": q_events_mase_forecast,
}
