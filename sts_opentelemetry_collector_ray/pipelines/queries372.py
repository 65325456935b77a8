"""Driver-contract queries, wave 372 — supplier concentration (HHI)
per part brand via a bucketed partkey merge, and an EWMA control-chart
anomaly census over daily event counts with an exactly-mirrored
50-lag truncated smoother. Same contract as queries.py: column names
AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES372: dict[str, str] = {}

_HB_BUCKETS = 64
_DAY_US = 86_400_000_000
_EW_LAGS = 50
_EW_ALPHA = 0.2


# ---------------------------------------------------------------------------
# lineitem_brand_supplier_hhi — supplier concentration per brand
# ---------------------------------------------------------------------------


def q_lineitem_brand_supplier_hhi(sf_dir: str):
    """Supply concentration: per part brand, the HHI of supplier
    quantity shares and the top supplier's share. The partkey -> brand
    dimension joins inside ONE partkey-bucket exchange (bucketed
    pandas merge); the (brand, supplier) quantity table is bounded.
    Per brand: brand, n_suppliers, total_qty, hhi_micro,
    top_share_micro."""

    def l_partial(t: pa.Table) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "pk": t["l_partkey"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
                "sk": t["l_suppkey"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
                "q": np.floor(
                    t["l_quantity"].to_numpy(zero_copy_only=False) + 0.5
                ).astype(np.int64),
            }
        )
        out["_b"] = (out["pk"] % _HB_BUCKETS).astype(np.int64)
        out["_src"] = np.int64(0)
        out["brand"] = ""
        return out[["_b", "_src", "pk", "sk", "q", "brand"]]

    def p_partial(t: pa.Table) -> pd.DataFrame:
        pk = t["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        out = pd.DataFrame(
            {
                "pk": pk,
                "sk": np.zeros(len(pk), np.int64),
                "q": np.zeros(len(pk), np.int64),
                "brand": t["p_brand"].to_numpy(zero_copy_only=False),
            }
        )
        out["_b"] = (out["pk"] % _HB_BUCKETS).astype(np.int64)
        out["_src"] = np.int64(1)
        return out[["_b", "_src", "pk", "sk", "q", "brand"]]

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity"],
    ).map_batches(l_partial, batch_format="pyarrow")
    pt = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    ).map_batches(p_partial, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        zero = pd.DataFrame(
            {
                "brand": pd.Series([], dtype=object),
                "sk": pd.Series([], dtype=np.int64),
                "q": pd.Series([], dtype=np.int64),
            }
        )
        l = g[g["_src"] == 0]
        p = g[g["_src"] == 1]
        if len(l) == 0 or len(p) == 0:
            return zero
        bmap = p.set_index("pk")["brand"]
        l = l.assign(brand=l["pk"].map(bmap)).dropna(subset=["brand"])
        if l.empty:
            return zero
        out = (
            l.groupby(["brand", "sk"], as_index=False)["q"].sum()
        )
        out["q"] = out["q"].astype(np.int64)
        out["sk"] = out["sk"].astype(np.int64)
        return out[["brand", "sk", "q"]]

    table = (
        li.union(pt)
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .groupby(["brand", "sk"])["q"]
        .sum()
        .reset_index()
    )
    cols = ["brand", "n_suppliers", "total_qty", "hhi_micro",
            "top_share_micro"]
    empty = pd.DataFrame(
        {
            "brand": pd.Series([], dtype=object),
            **{c: pd.Series([], dtype=np.int64) for c in cols[1:]},
        }
    )
    if table.empty:
        return empty
    rows = []
    for brand in sorted(table["brand"].unique()):
        sub = table[table["brand"] == brand]
        q = sub["q"].to_numpy(np.int64).astype(object)
        tot = int(q.sum())
        if tot <= 0:
            continue
        sq2 = int((q * q).sum())
        top = int(q.max())
        rows.append(
            (
                brand, np.int64(len(sub)), np.int64(tot),
                np.int64(np.floor(
                    float(sq2) / (float(tot) * float(tot))
                    * 1_000_000.0 + 0.5
                )),
                np.int64(np.floor(
                    float(top) / float(tot) * 1_000_000.0 + 0.5
                )),
            )
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols[1:]}
    )


ORACLES372["lineitem_brand_supplier_hhi"] = """
WITH j AS (
  SELECT p.p_brand AS brand, l.l_suppkey AS sk,
         CAST(floor(l.l_quantity + 0.5) AS BIGINT) AS q
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
per AS (
  SELECT brand, sk, CAST(sum(q) AS BIGINT) AS q FROM j GROUP BY 1, 2
),
agg AS (
  SELECT brand, CAST(count(*) AS BIGINT) AS ns,
         CAST(sum(q) AS BIGINT) AS tot,
         CAST(sum(CAST(q AS HUGEINT) * q) AS HUGEINT) AS sq2,
         CAST(max(q) AS BIGINT) AS top
  FROM per GROUP BY 1
)
SELECT brand, ns AS n_suppliers, tot AS total_qty,
       CAST(floor(CAST(sq2 AS DOUBLE)
                  / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE))
                  * 1000000.0 + 0.5) AS BIGINT) AS hhi_micro,
       CAST(floor(CAST(top AS DOUBLE) / tot * 1000000.0 + 0.5)
            AS BIGINT) AS top_share_micro
FROM agg
WHERE tot > 0
ORDER BY brand"""


# ---------------------------------------------------------------------------
# events_ewma_anomaly_days — truncated-EWMA control chart
# ---------------------------------------------------------------------------


def q_events_ewma_anomaly_days(sf_dir: str):
    """EWMA control chart on the zero-filled daily count series: the
    predictor for day t is the TRUNCATED smoother
    z(t) = alpha * sum_{j=1..min(t,50)} (1-alpha)^(j-1) * x(t-j)
    (a documented 50-lag window so both sides replay bit-equal; terms
    fold in ascending j). A day is anomalous when |x - z| exceeds 3
    global standard deviations (exact variance core). One row:
    n_days, n_scored, n_high, n_low, share_micro."""

    def partial(t: pa.Table) -> pd.DataFrame:
        day = pa.compute.cast(t["ts"], pa.int64()).to_numpy() // _DAY_US
        h = pd.Series(day).groupby(day).size()
        return pd.DataFrame(
            {"d": h.index.to_numpy(np.int64), "c": h.to_numpy(np.int64)}
        )

    daily = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("d")["c"]
        .sum()
    )
    cols = ["n_days", "n_scored", "n_high", "n_low", "share_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if daily.empty:
        return empty
    d0, d1 = int(daily.index.min()), int(daily.index.max())
    n = d1 - d0 + 1
    if n < 10:
        return empty
    x = np.zeros(n, np.int64)
    x[daily.index.to_numpy(np.int64) - d0] = daily.to_numpy(np.int64)
    xo = x.astype(object)
    s = int(xo.sum())
    s2 = int((xo * xo).sum())
    var = (float(s2) - float(s) * float(s) / float(n)) / float(n)
    if var <= 0.0:
        return empty
    sd = float(np.sqrt(var))
    hi = lo = scored = 0
    for t_ in range(1, n):
        z = 0.0
        for j in range(1, min(t_, _EW_LAGS) + 1):
            z = z + _EW_ALPHA * (1.0 - _EW_ALPHA) ** (j - 1) * float(
                int(x[t_ - j])
            )
        scored += 1
        resid = float(int(x[t_])) - z
        if resid > 3.0 * sd:
            hi += 1
        elif resid < -3.0 * sd:
            lo += 1
    return pd.DataFrame(
        [
            (
                np.int64(n), np.int64(scored), np.int64(hi), np.int64(lo),
                np.int64(np.floor(
                    float(hi + lo) / float(scored) * 1_000_000.0 + 0.5
                )),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES372["events_ewma_anomaly_days"] = f"""
WITH h AS (
  SELECT epoch_us(ts) // {_DAY_US} AS d, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
g AS (SELECT min(d) AS d0, max(d) AS d1 FROM h),
grid AS (
  SELECT CAST(r.range AS BIGINT) AS t
  FROM g CROSS JOIN range(0, 100000) r
  WHERE r.range <= g.d1 - g.d0
),
x AS (
  SELECT grid.t, CAST(coalesce(h.c, 0) AS BIGINT) AS y
  FROM grid LEFT JOIN h ON h.d = (SELECT d0 FROM g) + grid.t
),
nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS s,
         CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS s2
  FROM x
),
sd AS (
  SELECT n,
         sqrt((CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / n) AS v
  FROM nn
),
terms AS (
  SELECT a.t, j.j,
         {_EW_ALPHA} * power(1.0 - {_EW_ALPHA}, j.j - 1)
           * CAST(b.y AS DOUBLE) AS term
  FROM x a
  JOIN (SELECT CAST(r.range AS BIGINT) + 1 AS j
        FROM range(0, {_EW_LAGS}) r) j
    ON j.j <= least(a.t, {_EW_LAGS})
  JOIN x b ON b.t = a.t - j.j
  WHERE a.t >= 1
),
z AS (
  SELECT t, list_reduce(list_prepend(0.0, list(term ORDER BY j)),
                        (p, q) -> p + q) AS z
  FROM terms GROUP BY 1
),
cls AS (
  SELECT x.t,
         CASE WHEN CAST(x.y AS DOUBLE) - z.z > 3.0 * sd.v THEN 1
              ELSE 0 END AS hi,
         CASE WHEN CAST(x.y AS DOUBLE) - z.z < -3.0 * sd.v THEN 1
              ELSE 0 END AS lo
  FROM x JOIN z USING (t), sd
),
f AS (
  SELECT sd.n,
         (SELECT CAST(count(*) AS BIGINT) FROM cls) AS scored,
         (SELECT CAST(sum(hi) AS BIGINT) FROM cls) AS nh,
         (SELECT CAST(sum(lo) AS BIGINT) FROM cls) AS nl
  FROM sd
  WHERE sd.n >= 10 AND sd.v > 0
)
SELECT n AS n_days, scored AS n_scored, nh AS n_high, nl AS n_low,
       CAST(floor(CAST(nh + nl AS DOUBLE) / scored * 1000000.0 + 0.5)
            AS BIGINT) AS share_micro
FROM f"""


QUERIES372 = {
    "lineitem_brand_supplier_hhi": q_lineitem_brand_supplier_hhi,
    "events_ewma_anomaly_days": q_events_ewma_anomaly_days,
}
