"""Driver-contract queries, wave 383 — Theil's U forecast-quality of
the naive monthly order forecast and leave-one-out 1-NN label accuracy
over an embedding sample (cosine, sequential-fold mirrored floats).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES383: dict[str, str] = {}

_NN_SAMPLE = 200


# ---------------------------------------------------------------------------
# orders_theil_u_naive — naive-forecast quality on monthly counts
# ---------------------------------------------------------------------------


def q_orders_theil_u_naive(sf_dir: str):
    """Theil's U: the naive forecast (next month = this month) on the
    calendar-month order-count series (consecutive months only).
    Integer cores: sum (a_t - a_{t-1})^2 and sum a_t^2 over forecast
    months; U = sqrt(num)/sqrt(den), MAE and RMSE in milli. One row:
    n_forecasts, u_micro, mae_milli, rmse_milli."""

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        ym = (
            df["o_orderdate"].dt.year * 12 + df["o_orderdate"].dt.month
        ).to_numpy(np.int64)
        h = pd.Series(ym).groupby(ym).size()
        return pd.DataFrame(
            {"m": h.index.to_numpy(np.int64), "c": h.to_numpy(np.int64)}
        )

    monthly = (
        ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_orderdate"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("m")["c"]
        .sum()
        .sort_index()
    )
    cols = ["n_forecasts", "u_micro", "mae_milli", "rmse_milli"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if len(monthly) < 3:
        return empty
    m = monthly.index.to_numpy(np.int64)
    c = monthly.to_numpy(np.int64).astype(object)
    adj = m[1:] == m[:-1] + 1
    prev = c[:-1][adj]
    act = c[1:][adj]
    k = len(act)
    if k < 2:
        return empty
    num = int(sum((int(a) - int(p)) ** 2 for a, p in zip(act, prev)))
    den = int(sum(int(a) * int(a) for a in act))
    abs_sum = int(sum(abs(int(a) - int(p)) for a, p in zip(act, prev)))
    if den <= 0:
        return empty
    u = float(np.sqrt(float(num))) / float(np.sqrt(float(den)))
    mae = float(abs_sum) / float(k)
    rmse = float(np.sqrt(float(num) / float(k)))
    return pd.DataFrame(
        [
            (
                np.int64(k),
                np.int64(np.floor(u * 1_000_000.0 + 0.5)),
                np.int64(np.floor(mae * 1_000.0 + 0.5)),
                np.int64(np.floor(rmse * 1_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c_: np.int64 for c_ in cols})


ORACLES383["orders_theil_u_naive"] = """
WITH monthly AS (
  SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
           AS m,
         CAST(count(*) AS BIGINT) AS c
  FROM orders GROUP BY 1
),
seq AS (
  SELECT m, c, lag(m) OVER (ORDER BY m) AS pm,
         lag(c) OVER (ORDER BY m) AS pc
  FROM monthly
),
fc AS (
  SELECT c AS a, pc AS p FROM seq WHERE pm = m - 1
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         CAST(sum(CAST(a - p AS HUGEINT) * (a - p)) AS HUGEINT) AS num,
         CAST(sum(CAST(a AS HUGEINT) * a) AS HUGEINT) AS den,
         CAST(sum(abs(a - p)) AS BIGINT) AS ab
  FROM fc
)
SELECT k AS n_forecasts,
       CAST(floor(sqrt(CAST(num AS DOUBLE)) / sqrt(CAST(den AS DOUBLE))
                  * 1000000.0 + 0.5) AS BIGINT) AS u_micro,
       CAST(floor(CAST(ab AS DOUBLE) / k * 1000.0 + 0.5) AS BIGINT)
         AS mae_milli,
       CAST(floor(sqrt(CAST(num AS DOUBLE) / k) * 1000.0 + 0.5)
            AS BIGINT) AS rmse_milli
FROM agg
WHERE k >= 2 AND den > 0"""


# ---------------------------------------------------------------------------
# emb_label_1nn_accuracy — leave-one-out nearest-neighbor labels
# ---------------------------------------------------------------------------


def q_emb_label_1nn_accuracy(sf_dir: str):
    """Embedding-quality probe: over the 200 lowest vec_ids, each
    vector's leave-one-out nearest neighbor by cosine similarity
    (sequential dot/norm folds in dim order; ties -> larger cosine
    first, then smaller vec_id); accuracy = share whose neighbor
    carries the same label. One row: n, n_labels, n_correct,
    acc_micro."""

    sample = (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding", "label"],
        )
        .to_pandas()
        .sort_values("vec_id")
        .head(_NN_SAMPLE)
        .reset_index(drop=True)
    )
    cols = ["n", "n_labels", "n_correct", "acc_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    m = len(sample)
    if m < 3:
        return empty
    vecs = [np.asarray(e, np.float64) for e in sample["embedding"]]
    ids = sample["vec_id"].to_numpy(np.int64)
    labels = sample["label"].to_numpy(np.int64)
    d = len(vecs[0])

    def fold(vals) -> float:
        acc = 0.0
        for v in vals:
            acc = acc + float(v)
        return acc

    norms = [
        float(np.sqrt(fold(v[i] * v[i] for i in range(d)))) for v in vecs
    ]
    correct = 0
    for a in range(m):
        best_cos = None
        best_id = None
        best_lab = None
        for b in range(m):
            if b == a:
                continue
            dot = fold(vecs[a][i] * vecs[b][i] for i in range(d))
            cos = dot / (norms[a] * norms[b])
            if (
                best_cos is None
                or cos > best_cos
                or (cos == best_cos and int(ids[b]) < best_id)
            ):
                best_cos = cos
                best_id = int(ids[b])
                best_lab = int(labels[b])
        if best_lab == int(labels[a]):
            correct += 1
    return pd.DataFrame(
        [
            (
                np.int64(m), np.int64(len(set(labels.tolist()))),
                np.int64(correct),
                np.int64(np.floor(
                    float(correct) / float(m) * 1_000_000.0 + 0.5
                )),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES383["emb_label_1nn_accuracy"] = f"""
WITH sample AS (
  SELECT vec_id, embedding, label,
         row_number() OVER (ORDER BY vec_id) AS rn
  FROM embeddings QUALIFY rn <= {_NN_SAMPLE}
),
dims AS (
  SELECT vec_id, CAST(r.range AS BIGINT) AS i,
         CAST(embedding[CAST(r.range AS BIGINT) + 1] AS DOUBLE) AS v
  FROM sample, range(0, 4096) r
  WHERE r.range < len(embedding)
),
norms AS (
  SELECT vec_id,
         sqrt(list_reduce(list_prepend(0.0, list(v * v ORDER BY i)),
                          (a, b) -> a + b)) AS nrm
  FROM dims GROUP BY 1
),
pairs AS (
  SELECT a.vec_id AS va, b.vec_id AS vb
  FROM sample a JOIN sample b ON a.vec_id <> b.vec_id
),
cosim AS (
  SELECT p.va, p.vb,
         list_reduce(list_prepend(0.0,
           list(da.v * db.v ORDER BY da.i)), (x, y) -> x + y)
           / (na.nrm * nb.nrm) AS cos
  FROM pairs p
  JOIN dims da ON da.vec_id = p.va
  JOIN dims db ON db.vec_id = p.vb AND db.i = da.i
  JOIN norms na ON na.vec_id = p.va
  JOIN norms nb ON nb.vec_id = p.vb
  GROUP BY p.va, p.vb, na.nrm, nb.nrm
),
nn AS (
  SELECT va, vb,
         row_number() OVER (PARTITION BY va ORDER BY cos DESC, vb)
           AS rk
  FROM cosim
),
hit AS (
  SELECT sa.vec_id,
         CASE WHEN sa.label = sb.label THEN 1 ELSE 0 END AS ok
  FROM nn
  JOIN sample sa ON sa.vec_id = nn.va
  JOIN sample sb ON sb.vec_id = nn.vb
  WHERE nn.rk = 1
),
f AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
         CAST(sum(ok) AS BIGINT) AS correct,
         (SELECT CAST(count(DISTINCT label) AS BIGINT) FROM sample)
           AS nl
  FROM hit
)
SELECT m AS n, nl AS n_labels, correct AS n_correct,
       CAST(floor(CAST(correct AS DOUBLE) / m * 1000000.0 + 0.5)
            AS BIGINT) AS acc_micro
FROM f
WHERE m >= 3"""


QUERIES383 = {
    "orders_theil_u_naive": q_orders_theil_u_naive,
    "emb_label_1nn_accuracy": q_emb_label_1nn_accuracy,
}
