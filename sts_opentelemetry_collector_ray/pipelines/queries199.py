"""Driver-contract queries, wave 199 — weight-of-evidence / information
value banding (credit-scoring feature audit: active vs inactive customers by
balance band) and Tukey median polish over the (day-of-week × hour-band)
median event-value matrix (2 sweeps, lower-median order statistic — exact,
no float summation anywhere).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES199: dict[str, str] = {}


# ---------------------------------------------------------------------------
# customer_woe_iv — weight of evidence and information value by balance band
# ---------------------------------------------------------------------------


def q_customer_woe_iv(sf_dir: str):
    """Per balance band floor((bal+1000)/2000): counts of 'good' (has ≥1
    order in the LATEST order year — every customer has SOME order by
    construction, so lifetime presence is a constant class) and 'bad'
    customers, WOE = ln((g/G)/(b/B)) and the band's IV
    contribution (g/G − b/B)·WOE in micro units, plus the total IV as a
    constant column (Siddiqi 2006). Bands with zero goods or bads drop.

    Scale shape: order-presence folds via an (o_custkey) combiner against
    the dimension-sized customer table; bands are a bounded grid on the
    driver — no shuffle."""
    import pyarrow.parquet as pq

    def oc_partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["o_custkey"]).to_pandas()
        df["y"] = pd.Series(
            t["o_orderdate"].to_numpy(zero_copy_only=False)
        ).dt.year.astype(np.int64)
        return df.groupby("o_custkey", sort=False, as_index=False)["y"].max()

    ocp = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
        )
        .map_batches(oc_partial, batch_format="pyarrow")
        .to_pandas()
    )
    if ocp.empty:
        active = set()
    else:
        peru = ocp.groupby("o_custkey")["y"].max()
        active = set(peru[peru == peru.max()].index)
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    ).to_pandas()
    cust["band"] = np.floor(
        (cust["c_acctbal"].to_numpy(np.float64) + 1000.0) / 2000.0
    ).astype(np.int64)
    cust["good"] = cust["c_custkey"].isin(active).astype(np.int64)
    g = cust.groupby("band", sort=True).agg(
        n_good=("good", "sum"), n_all=("good", "size")
    )
    g["n_bad"] = g["n_all"] - g["n_good"]
    g = g[(g["n_good"] > 0) & (g["n_bad"] > 0)]
    cols = ["band", "n_good", "n_bad", "woe_micro", "iv_micro"]
    if g.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    G = float(g["n_good"].sum())
    B = float(g["n_bad"].sum())
    pg = g["n_good"].to_numpy(np.float64) / G
    pb = g["n_bad"].to_numpy(np.float64) / B
    woe = np.log(pg / pb)
    iv_total = float(((pg - pb) * woe).sum())
    return pd.DataFrame(
        {
            "band": np.asarray(g.index.to_numpy(np.int64)),
            "n_good": g["n_good"].to_numpy(np.int64),
            "n_bad": g["n_bad"].to_numpy(np.int64),
            "woe_micro": np.floor(woe * 1_000_000.0 + 0.5).astype(np.int64),
            "iv_micro": np.full(
                len(g), np.floor(iv_total * 1_000_000.0 + 0.5), np.int64
            ),
        }
    )


ORACLES199["customer_woe_iv"] = """
WITH ly AS (SELECT max(year(o_orderdate)) AS y FROM orders),
act AS (
  SELECT DISTINCT o_custkey FROM orders, ly WHERE year(o_orderdate) = ly.y
),
c AS (
  SELECT CAST(floor((c_acctbal + 1000.0) / 2000.0) AS BIGINT) AS band,
         CASE WHEN act.o_custkey IS NOT NULL THEN 1 ELSE 0 END AS good
  FROM customer LEFT JOIN act ON c_custkey = act.o_custkey
),
b AS (
  SELECT band, CAST(sum(good) AS BIGINT) AS n_good,
         CAST(count(*) - sum(good) AS BIGINT) AS n_bad
  FROM c GROUP BY 1 HAVING sum(good) > 0 AND count(*) - sum(good) > 0
),
tot AS (SELECT CAST(sum(n_good) AS DOUBLE) AS g, CAST(sum(n_bad) AS DOUBLE) AS bb
        FROM b),
w AS (
  SELECT band, n_good, n_bad,
         ln((n_good / tot.g) / (n_bad / tot.bb)) AS woe,
         (n_good / tot.g - n_bad / tot.bb)
           * ln((n_good / tot.g) / (n_bad / tot.bb)) AS ivc
  FROM b, tot
),
iv AS (SELECT sum(ivc) AS iv FROM w)
SELECT band, n_good, n_bad,
       CAST(floor(woe * 1000000.0 + 0.5) AS BIGINT) AS woe_micro,
       CAST(floor(iv.iv * 1000000.0 + 0.5) AS BIGINT) AS iv_micro
FROM w, iv ORDER BY band"""


# ---------------------------------------------------------------------------
# events_median_polish — Tukey median polish of the dow × hour-band matrix
# ---------------------------------------------------------------------------

_MP_SWEEPS = 2


def q_events_median_polish(sf_dir: str):
    """Tukey median polish (Tukey 1977) over the (day-of-week × 4-hour-band)
    matrix of LOWER-MEDIAN event values: 2 full sweeps (row medians then
    column medians of residuals). Every step is an order statistic on
    exact cell values — no float accumulation, so the replay is bit-exact.
    Output: kind ('row'/'col'), key, effect_micro.

    Scale shape: cell medians come from a bounded (dow, hb, value-rank)
    exchange — per-cell exact order stat via ONE bucket pass; the 7×6
    polish runs on the driver."""
    path = f"{sf_dir}/events.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["ts", "value"]).to_pandas()
        d = df["ts"].dt
        df["dow"] = d.dayofweek.to_numpy(np.int64)
        df["hb"] = (d.hour.to_numpy(np.int64) // 4).astype(np.int64)
        return df[["dow", "hb", "value"]]

    def cell_median(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["value"].to_numpy(np.float64))
        med = v[(len(v) + 1) // 2 - 1]
        return pd.DataFrame(
            {"dow": g["dow"].iloc[:1].to_numpy(np.int64),
             "hb": g["hb"].iloc[:1].to_numpy(np.int64),
             "med": [med]}
        )

    cells = (
        ray.data.read_parquet(path, columns=["ts", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["dow", "hb"])
        .map_groups(cell_median, batch_format="pandas")
        .to_pandas()
    )
    cols = ["kind", "key", "effect_micro"]
    if cells.empty:
        return pd.DataFrame(
            {"kind": pd.Series([], dtype=object),
             "key": pd.Series([], dtype=np.int64),
             "effect_micro": pd.Series([], dtype=np.int64)}
        )
    dows = np.sort(cells["dow"].unique())
    hbs = np.sort(cells["hb"].unique())
    mat = (
        cells.pivot_table(index="dow", columns="hb", values="med", aggfunc="first")
        .reindex(index=dows, columns=hbs)
        .to_numpy(np.float64)
    )

    def lower_median(a: np.ndarray, axis: int) -> np.ndarray:
        s = np.sort(a, axis=axis)
        k = (a.shape[axis] + 1) // 2 - 1
        return np.take(s, k, axis=axis)

    row_eff = np.zeros(len(dows))
    col_eff = np.zeros(len(hbs))
    resid = mat.copy()
    for _ in range(_MP_SWEEPS):
        rm = lower_median(resid, axis=1)
        resid -= rm[:, None]
        row_eff += rm
        cm = lower_median(resid, axis=0)
        resid -= cm[None, :]
        col_eff += cm
    rows = [
        ("row", np.int64(d), np.int64(np.floor(e * 1_000_000.0 + 0.5)))
        for d, e in zip(dows, row_eff)
    ] + [
        ("col", np.int64(h), np.int64(np.floor(e * 1_000_000.0 + 0.5)))
        for h, e in zip(hbs, col_eff)
    ]
    return pd.DataFrame(rows, columns=cols).astype(
        {"key": np.int64, "effect_micro": np.int64}
    )


def _mp_oracle() -> str:
    # dayofweek parity: pandas Monday=0; DuckDB Sunday=0 — remap so the
    # output keys match: (dayofweek(ts) + 6) % 7
    sweeps = []
    prev = "m0"
    for it in range(_MP_SWEEPS):
        sweeps.append(f"""
rm{it} AS (
  SELECT dow, med FROM (
    SELECT dow, med, row_number() OVER (PARTITION BY dow ORDER BY med) AS r,
           count(*) OVER (PARTITION BY dow) AS n
    FROM {prev}
  ) WHERE r = (n + 1) // 2
),
a{it} AS (
  SELECT {prev}.dow, {prev}.hb, {prev}.med - rm{it}.med AS med
  FROM {prev} JOIN rm{it} ON {prev}.dow = rm{it}.dow
),
cm{it} AS (
  SELECT hb, med FROM (
    SELECT hb, med, row_number() OVER (PARTITION BY hb ORDER BY med) AS r,
           count(*) OVER (PARTITION BY hb) AS n
    FROM a{it}
  ) WHERE r = (n + 1) // 2
),
m{it + 1} AS (
  SELECT a{it}.dow, a{it}.hb, a{it}.med - cm{it}.med AS med
  FROM a{it} JOIN cm{it} ON a{it}.hb = cm{it}.hb
)""")
        prev = f"m{it + 1}"
    sweep_sql = ",".join(sweeps)
    row_sum = " + ".join(f"rm{i}.med" for i in range(_MP_SWEEPS))
    col_sum = " + ".join(f"cm{i}.med" for i in range(_MP_SWEEPS))
    row_joins = " ".join(
        f"JOIN rm{i} ON rm0.dow = rm{i}.dow" for i in range(1, _MP_SWEEPS)
    )
    col_joins = " ".join(
        f"JOIN cm{i} ON cm0.hb = cm{i}.hb" for i in range(1, _MP_SWEEPS)
    )
    return f"""
WITH base AS (
  SELECT (dayofweek(ts) + 6) % 7 AS dow, hour(ts) // 4 AS hb, value
  FROM events
),
m0 AS (
  SELECT dow, hb, value AS med FROM (
    SELECT dow, hb, value,
           row_number() OVER (PARTITION BY dow, hb ORDER BY value) AS r,
           count(*) OVER (PARTITION BY dow, hb) AS n
    FROM base
  ) WHERE r = (n + 1) // 2
),{sweep_sql}
SELECT 'row' AS kind, CAST(rm0.dow AS BIGINT) AS key,
       CAST(floor(({row_sum}) * 1000000.0 + 0.5) AS BIGINT) AS effect_micro
FROM rm0 {row_joins}
UNION ALL
SELECT 'col' AS kind, CAST(cm0.hb AS BIGINT) AS key,
       CAST(floor(({col_sum}) * 1000000.0 + 0.5) AS BIGINT) AS effect_micro
FROM cm0 {col_joins}
ORDER BY kind DESC, key"""


ORACLES199["events_median_polish"] = _mp_oracle()


QUERIES199 = {
    "customer_woe_iv": q_customer_woe_iv,
    "events_median_polish": q_events_median_polish,
}
