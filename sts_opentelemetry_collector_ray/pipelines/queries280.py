"""Driver-contract queries, wave 280 — the Hoover (Robin Hood) index of
per-customer spend inequality (exact |y n - S| integer fold) and the
empirical upper-tail dependence coefficient between lineitem quantity
and price at the 95% marginal quantiles (exact order-statistic
thresholds). Same contract as queries.py: column names AND dtypes match
the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES280: dict[str, str] = {}

_HV_BUCKETS = 64


# ---------------------------------------------------------------------------
# customer_hoover — Robin Hood index of per-customer spend
# ---------------------------------------------------------------------------


def q_customer_hoover(sf_dir: str):
    """Hoover index H = sum |y_i - mu| / (2 sum y) over per-customer
    order spend (cents): with mu = S/n, |y - mu| = |y n - S| / n, so the
    numerator sum |y n - S| c_y over the spend histogram is an EXACT
    integer (arbitrary precision; HUGEINT in SQL) and
    H = that / (2 n S) is one division — the share of total spend that
    would have to move to equalize customers. One row: n_cust,
    sum_cents, hoover_micro.

    Scale shape: per-customer spend reduces via ONE custkey-bucket
    exchange (the `customer_rfm` idiom); each bucket emits its bounded
    spend histogram."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(
            df["o_totalprice"].to_numpy(np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame(
                {"k": df["o_custkey"].to_numpy(np.int64), "s": cents}
            )
            .groupby("k", sort=False)["s"]
            .sum()
            .reset_index()
        )
        g["s"] = g["s"].astype(np.int64)
        g["_b"] = (g["k"].to_numpy(np.int64) % _HV_BUCKETS).astype(np.int64)
        return g

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby("k", sort=False)["s"].sum()
        h = per.groupby(per.values).size()
        return pd.DataFrame(
            {
                "y": h.index.to_numpy(np.int64),
                "c": h.to_numpy(np.int64),
            }
        )

    hist = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
        )
        .map_batches(partial, batch_format="pandas")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .groupby("y")["c"]
        .sum()
    )
    cols = ["n_cust", "sum_cents", "hoover_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if hist.empty:
        return empty
    y = hist.index.to_numpy(np.int64).astype(object)
    c = hist.to_numpy(np.int64).astype(object)
    n = int(c.sum())
    s = int((y * c).sum())
    if s <= 0:
        return empty
    num = int((abs(y * n - s) * c).sum())
    hoover = float(num) / (2.0 * float(n) * float(s))
    return pd.DataFrame(
        [
            (
                np.int64(n), np.int64(s),
                np.int64(np.floor(hoover * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c_: np.int64 for c_ in cols})


ORACLES280["customer_hoover"] = """
WITH spend AS (
  SELECT o_custkey,
         CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS y
  FROM orders GROUP BY 1
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS s
  FROM spend
),
num AS (
  SELECT CAST(sum(abs(CAST(y AS HUGEINT) * m.n - m.s)) AS HUGEINT) AS num
  FROM spend, m
)
SELECT m.n AS n_cust, m.s AS sum_cents,
       CAST(floor(CAST(num.num AS DOUBLE)
                  / (2.0 * CAST(m.n AS DOUBLE) * CAST(m.s AS DOUBLE))
                  * 1000000.0 + 0.5) AS BIGINT) AS hoover_micro
FROM m, num
WHERE m.s > 0"""


# ---------------------------------------------------------------------------
# lineitem_tail_dependence — empirical upper-tail dependence at q = 0.95
# ---------------------------------------------------------------------------


def q_lineitem_tail_dependence(sf_dir: str):
    """Empirical upper-tail dependence between x = quantity (milli) and
    y = extendedprice (cents): thresholds are the k-th order statistics
    with k = ceil(0.95 n) (exact integer rank arithmetic over the value
    histograms), the tail sets are {x >= tx} and {y >= ty}, and
    lambda_hat = n * |joint| / (|x tail| * |y tail|) (the empirical
    copula ratio; 1 = independence-scaled). One row: n, tx_milli,
    ty_cents, nx_tail, ny_tail, n_joint, lambda_micro.

    Scale shape: pass 1 folds the two bounded marginal histograms to
    fix thresholds; pass 2 is a scalar per-batch joint-count fold —
    no shuffle anywhere."""

    def hists(t: pa.Table) -> pd.DataFrame:
        x = np.floor(
            t["l_quantity"].to_numpy(zero_copy_only=False) * 1000.0 + 0.5
        ).astype(np.int64)
        y = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        hx = pd.Series(x).groupby(x).size()
        hy = pd.Series(y).groupby(y).size()
        return pd.concat(
            [
                pd.DataFrame(
                    {"axis": np.int64(0), "v": hx.index.to_numpy(np.int64),
                     "c": hx.to_numpy(np.int64)}
                ),
                pd.DataFrame(
                    {"axis": np.int64(1), "v": hy.index.to_numpy(np.int64),
                     "c": hy.to_numpy(np.int64)}
                ),
            ],
            ignore_index=True,
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_quantity", "l_extendedprice"]
    )
    h = (
        ds.map_batches(hists, batch_format="pyarrow")
        .to_pandas()
        .groupby(["axis", "v"])["c"]
        .sum()
    )
    cols = [
        "n", "tx_milli", "ty_cents", "nx_tail", "ny_tail", "n_joint",
        "lambda_micro",
    ]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if h.empty:
        return empty

    def threshold(axis: int):
        sub = h.loc[axis].sort_index()
        c = sub.to_numpy(np.int64)
        v = sub.index.to_numpy(np.int64)
        n = int(c.sum())
        k = (19 * n + 19) // 20  # ceil(0.95 n)
        cum = np.cumsum(c)
        i = int(np.searchsorted(cum, k, side="left"))
        return int(v[i]), n

    tx, n = threshold(0)
    ty, _ = threshold(1)

    def joint(t: pa.Table) -> pd.DataFrame:
        x = np.floor(
            t["l_quantity"].to_numpy(zero_copy_only=False) * 1000.0 + 0.5
        ).astype(np.int64)
        y = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "nx": [np.int64((x >= tx).sum())],
                "ny": [np.int64((y >= ty).sum())],
                "nj": [np.int64(((x >= tx) & (y >= ty)).sum())],
            }
        )

    j = ds.map_batches(joint, batch_format="pyarrow").to_pandas().sum()
    nx, ny, nj = int(j["nx"]), int(j["ny"]), int(j["nj"])
    if nx == 0 or ny == 0:
        return empty
    lam = float(n) * float(nj) / (float(nx) * float(ny))
    return pd.DataFrame(
        [
            (
                np.int64(n), np.int64(tx), np.int64(ty), np.int64(nx),
                np.int64(ny), np.int64(nj),
                np.int64(np.floor(lam * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES280["lineitem_tail_dependence"] = """
WITH base AS (
  SELECT CAST(floor(l_quantity * 1000.0 + 0.5) AS BIGINT) AS x,
         CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS y
  FROM lineitem
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
hx AS (SELECT x AS v, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY 1),
hy AS (SELECT y AS v, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY 1),
tx AS (
  SELECT min(v) AS t FROM (
    SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM hx
  ), nn WHERE cum >= (19 * nn.n + 19) // 20
),
ty AS (
  SELECT min(v) AS t FROM (
    SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM hy
  ), nn WHERE cum >= (19 * nn.n + 19) // 20
),
cnt AS (
  SELECT CAST(sum(CASE WHEN x >= tx.t THEN 1 ELSE 0 END) AS BIGINT) AS nx,
         CAST(sum(CASE WHEN y >= ty.t THEN 1 ELSE 0 END) AS BIGINT) AS ny,
         CAST(sum(CASE WHEN x >= tx.t AND y >= ty.t THEN 1 ELSE 0 END)
              AS BIGINT) AS nj
  FROM base, tx, ty
)
SELECT nn.n, tx.t AS tx_milli, ty.t AS ty_cents,
       cnt.nx AS nx_tail, cnt.ny AS ny_tail, cnt.nj AS n_joint,
       CAST(floor(CAST(nn.n AS DOUBLE) * CAST(cnt.nj AS DOUBLE)
                  / (CAST(cnt.nx AS DOUBLE) * CAST(cnt.ny AS DOUBLE))
                  * 1000000.0 + 0.5) AS BIGINT) AS lambda_micro
FROM nn, tx, ty, cnt
WHERE cnt.nx > 0 AND cnt.ny > 0"""


QUERIES280 = {
    "customer_hoover": q_customer_hoover,
    "lineitem_tail_dependence": q_lineitem_tail_dependence,
}
