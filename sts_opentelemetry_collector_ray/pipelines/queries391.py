"""Driver-contract queries, wave 391 — the daily new-vs-returning
active-user mix and the MASE comparison of naive vs seasonal-naive
monthly order forecasts. Same contract as queries.py: column names AND
dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES391: dict[str, str] = {}

_DAY_US = 86_400_000_000
_NR_BUCKETS = 64


# ---------------------------------------------------------------------------
# users_new_returning_mix — growth accounting per day
# ---------------------------------------------------------------------------


def q_users_new_returning_mix(sf_dir: str):
    """Growth accounting: per day the active users split into new
    (this is their first active day) and returning. First-day
    attribution happens per user inside ONE user-bucket exchange.
    Per day: day, n_active, n_new, n_returning, new_share_micro."""

    def partial(t: pa.Table) -> pd.DataFrame:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        day = pa.compute.cast(t["ts"], pa.int64()).to_numpy() // _DAY_US
        df = pd.DataFrame({"u": u, "d": day}).drop_duplicates()
        df["_b"] = (df["u"].to_numpy(np.int64) % _NR_BUCKETS).astype(
            np.int64
        )
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        zero = pd.DataFrame(
            {
                "d": pd.Series([], dtype=np.int64),
                "act": pd.Series([], dtype=np.int64),
                "new": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return zero
        g = g.drop_duplicates(["u", "d"])
        first = g.groupby("u")["d"].min()
        act = g.groupby("d").size().rename("act")
        new = first.groupby(first).size().rename("new")
        out = pd.DataFrame(
            {"d": act.index.to_numpy(np.int64),
             "act": act.to_numpy(np.int64)}
        )
        out["new"] = out["d"].map(new).fillna(0).astype(np.int64)
        return out

    per_day = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .groupby("d")[["act", "new"]]
        .sum()
        .sort_index()
    )
    cols = ["day", "n_active", "n_new", "n_returning", "new_share_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if per_day.empty:
        return empty
    rows = []
    for d_, r in per_day.iterrows():
        act, new = int(r["act"]), int(r["new"])
        rows.append(
            (
                np.int64(int(d_)), np.int64(act), np.int64(new),
                np.int64(act - new),
                np.int64(np.floor(
                    float(new) / float(act) * 1_000_000.0 + 0.5
                )),
            )
        )
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols}
    )


ORACLES391["users_new_returning_mix"] = f"""
WITH du AS (
  SELECT DISTINCT user_id AS u, epoch_us(ts) // {_DAY_US} AS d
  FROM events
),
first AS (SELECT u, min(d) AS fd FROM du GROUP BY 1),
per AS (
  SELECT du.d,
         CAST(count(*) AS BIGINT) AS act,
         CAST(sum(CASE WHEN first.fd = du.d THEN 1 ELSE 0 END)
              AS BIGINT) AS new
  FROM du JOIN first USING (u)
  GROUP BY 1
)
SELECT CAST(d AS BIGINT) AS day, act AS n_active, new AS n_new,
       CAST(act - new AS BIGINT) AS n_returning,
       CAST(floor(CAST(new AS DOUBLE) / act * 1000000.0 + 0.5)
            AS BIGINT) AS new_share_micro
FROM per
ORDER BY day"""


# ---------------------------------------------------------------------------
# orders_mase_seasonal — naive vs seasonal-naive forecast error
# ---------------------------------------------------------------------------


def q_orders_mase_seasonal(sf_dir: str):
    """MASE: on the consecutive calendar-month order-count series, the
    MAE of the 12-month seasonal-naive forecast divided by the MAE of
    the 1-month naive forecast over the SAME forecastable months
    (both lags available). Integer absolute-error cores. One row:
    n_forecasts, mae_naive_milli, mae_seasonal_milli, mase_micro."""

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
    cols = ["n_forecasts", "mae_naive_milli", "mae_seasonal_milli",
            "mase_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if len(monthly) < 14:
        return empty
    idx = {int(m): int(c) for m, c in monthly.items()}
    ae_n = []
    ae_s = []
    for m, a in idx.items():
        p1 = idx.get(m - 1)
        p12 = idx.get(m - 12)
        if p1 is None or p12 is None:
            continue
        ae_n.append(abs(a - p1))
        ae_s.append(abs(a - p12))
    k = len(ae_n)
    if k < 2:
        return empty
    sn = sum(ae_n)
    ss = sum(ae_s)
    if sn == 0:
        return empty
    return pd.DataFrame(
        [
            (
                np.int64(k),
                np.int64(np.floor(
                    float(sn) / float(k) * 1_000.0 + 0.5
                )),
                np.int64(np.floor(
                    float(ss) / float(k) * 1_000.0 + 0.5
                )),
                np.int64(np.floor(
                    float(ss) / float(sn) * 1_000_000.0 + 0.5
                )),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES391["orders_mase_seasonal"] = """
WITH monthly AS (
  SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
           AS m,
         CAST(count(*) AS BIGINT) AS c
  FROM orders GROUP BY 1
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS total FROM monthly),
fc AS (
  SELECT a.c AS act, p1.c AS prev1, p12.c AS prev12
  FROM monthly a
  JOIN monthly p1 ON p1.m = a.m - 1
  JOIN monthly p12 ON p12.m = a.m - 12
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         CAST(sum(abs(act - prev1)) AS BIGINT) AS sn,
         CAST(sum(abs(act - prev12)) AS BIGINT) AS ss
  FROM fc
)
SELECT k AS n_forecasts,
       CAST(floor(CAST(sn AS DOUBLE) / k * 1000.0 + 0.5) AS BIGINT)
         AS mae_naive_milli,
       CAST(floor(CAST(ss AS DOUBLE) / k * 1000.0 + 0.5) AS BIGINT)
         AS mae_seasonal_milli,
       CAST(floor(CAST(ss AS DOUBLE) / sn * 1000000.0 + 0.5) AS BIGINT)
         AS mase_micro
FROM agg, nn
WHERE nn.total >= 14 AND k >= 2 AND sn > 0"""


QUERIES391 = {
    "users_new_returning_mix": q_users_new_returning_mix,
    "orders_mase_seasonal": q_orders_mase_seasonal,
}
