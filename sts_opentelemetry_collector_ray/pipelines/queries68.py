"""Driver-contract queries, wave 68 — hourly cross-correlation between two
signal types (the lead-lag discovery behind "clicks precede purchases") and
return-rate by part brand (the supplier-quality screen). Same contract as
queries.py: column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES68: dict[str, str] = {}

_XC_A = "click"
_XC_B = "purchase"
_XC_MAX_LAG = 12
_HOUR_US = 3_600_000_000


# ---------------------------------------------------------------------------
# events_xcorr — cross-correlation click→purchase at lags 0..12
# ---------------------------------------------------------------------------


def q_events_xcorr(sf_dir: str):
    """Cross-correlation of the zero-filled hourly 'click' series against
    'purchase' shifted k hours later (k = 0..12): the lag where it peaks is
    the typical click→purchase delay. Same EXACT integer algebra as
    events_acf: with Sₐ = Σa, S_b = Σb over the n-hour grid, the lag-k
    numerator scaled by n² is Σ(n·aᵢ−Sₐ)(n·bᵢ₊ₖ−S_b), divided once by the
    geometric mean of the two scaled variances (single float op per lag).

    Scale shape: one (type, hour) combiner → ONE tiny bounded exchange →
    arbitrary-precision integer folds on the driver grid."""

    def partial(t: pa.Table) -> pa.Table:
        hrs = pa.compute.cast(t["ts"], pa.int64()).to_numpy() // _HOUR_US
        df = pd.DataFrame(
            {"event_type": t["event_type"].to_numpy(zero_copy_only=False), "hr": hrs}
        )
        df = df[df["event_type"].isin([_XC_A, _XC_B])]
        g = df.groupby(["event_type", "hr"], sort=False).size().rename("cnt").reset_index()
        g["cnt"] = g["cnt"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    hist = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: 2 x calendar-hour domain
        .groupby(["event_type", "hr"])["cnt"]
        .sum()
    )
    h0 = int(hist.index.get_level_values("hr").min())
    h1 = int(hist.index.get_level_values("hr").max())
    span = h1 - h0 + 1

    def series(et: str) -> np.ndarray:
        x = np.zeros(span, dtype=np.int64)
        if et in hist.index.get_level_values("event_type"):
            sub = hist.loc[et]
            x[sub.index.to_numpy(np.int64) - h0] = sub.to_numpy(np.int64)
        return x

    a, b = series(_XC_A), series(_XC_B)
    n = span
    sa, sb = int(a.sum()), int(b.sum())
    da = [int(n) * int(v) - sa for v in a]
    db = [int(n) * int(v) - sb for v in b]
    dena = sum(v * v for v in da)
    denb = sum(v * v for v in db)
    den = float(dena) ** 0.5 * float(denb) ** 0.5
    rows = []
    for k in range(_XC_MAX_LAG + 1):
        num = sum(x * y for x, y in zip(da[: n - k], db[k:])) if k < n else 0
        r = float(num) / den if den else 0.0
        rows.append((k, int(np.floor(r * 1e6 + 0.5))))
    return pd.DataFrame(
        {
            "lag": np.array([r[0] for r in rows], np.int64),
            "xcorr_micro": np.array([r[1] for r in rows], np.int64),
            "n_hours": np.full(len(rows), n, np.int64),
        }
    )


ORACLES68["events_xcorr"] = f"""
WITH h AS (
  SELECT event_type, epoch_us(ts) // {_HOUR_US} AS hr,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events WHERE event_type IN ('{_XC_A}', '{_XC_B}') GROUP BY 1, 2
),
g AS (SELECT min(hr) AS h0, max(hr) AS h1 FROM h),
grid AS (
  SELECT g.h0 + CAST(r.range AS BIGINT) AS hr
  FROM g CROSS JOIN range(0, 200000) r
  WHERE r.range <= g.h1 - g.h0
),
x AS (
  SELECT grid.hr,
         CAST(coalesce((SELECT cnt FROM h WHERE h.event_type = '{_XC_A}'
                        AND h.hr = grid.hr), 0) AS HUGEINT) AS a,
         CAST(coalesce((SELECT cnt FROM h WHERE h.event_type = '{_XC_B}'
                        AND h.hr = grid.hr), 0) AS HUGEINT) AS b
  FROM grid
),
m AS (SELECT CAST(count(*) AS HUGEINT) AS n, sum(a) AS sa, sum(b) AS sb FROM x),
d AS (SELECT hr, m.n * a - m.sa AS da, m.n * b - m.sb AS db FROM x, m),
den AS (
  SELECT sqrt(CAST(sum(da * da) AS DOUBLE))
         * sqrt(CAST(sum(db * db) AS DOUBLE)) AS den
  FROM d
),
lags AS (SELECT CAST(r.range AS BIGINT) AS lag FROM range(0, {_XC_MAX_LAG + 1}) r),
num AS (
  SELECT l.lag, coalesce(sum(p.da * q.db), 0) AS num
  FROM lags l
  LEFT JOIN d p ON TRUE
  LEFT JOIN d q ON q.hr = p.hr + l.lag
  GROUP BY l.lag
)
SELECT l.lag,
       CAST(floor(CASE WHEN den.den = 0 THEN 0.0
                       ELSE CAST(n2.num AS DOUBLE) / den.den
                  END * 1000000 + 0.5) AS BIGINT) AS xcorr_micro,
       CAST((SELECT h1 - h0 + 1 FROM g) AS BIGINT) AS n_hours
FROM lags l JOIN num n2 USING (lag) CROSS JOIN den
ORDER BY l.lag"""


# ---------------------------------------------------------------------------
# returns_by_brand — lineitem return rate per part brand
# ---------------------------------------------------------------------------


def q_returns_by_brand(sf_dir: str):
    """Supplier-quality screen: per part brand, lineitem count, returned
    count (l_returnflag = 'R') and the return rate in EXACT integer basis
    points (round-half-up).

    Scale shape: the part→brand map broadcasts once (bounded dimension
    side); per batch one take-by-searchsorted brand assignment + a
    (brand, flag) combiner; bounded |brands|×2 partials, zero shuffles."""
    import ray
    import pyarrow.parquet as pq_mod

    part = pq_mod.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    )
    pk = part["p_partkey"].to_numpy()
    order = np.argsort(pk)
    ref = ray.put(
        (pk[order], part["p_brand"].to_numpy(zero_copy_only=False)[order])
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        keys, brands = ray.get(ref)
        lpk = t["l_partkey"].to_numpy()
        idx = np.searchsorted(keys, lpk)
        b = brands[np.minimum(idx, len(keys) - 1)]
        ret = t["l_returnflag"].to_numpy(zero_copy_only=False) == "R"
        g = (
            pd.DataFrame({"p_brand": b, "ret": ret})
            .groupby("p_brand", sort=False)
            .agg(n_items=("ret", "size"), n_returned=("ret", "sum"))
            .reset_index()
        )
        g["n_items"] = g["n_items"].astype(np.int64)
        g["n_returned"] = g["n_returned"].astype(np.int64)
        return g

    agg = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_returnflag"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: |brands| per block
        .groupby("p_brand")
        .agg(n_items=("n_items", "sum"), n_returned=("n_returned", "sum"))
        .reset_index()
        .sort_values("p_brand", kind="mergesort")
        .reset_index(drop=True)
    )
    n, r = agg["n_items"].to_numpy(np.int64), agg["n_returned"].to_numpy(np.int64)
    agg["return_rate_bp"] = (20_000 * r + n) // (2 * n)
    agg["n_items"] = agg["n_items"].astype(np.int64)
    agg["n_returned"] = agg["n_returned"].astype(np.int64)
    agg["return_rate_bp"] = agg["return_rate_bp"].astype(np.int64)
    return agg


ORACLES68["returns_by_brand"] = """
SELECT p_brand,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(coalesce(count(*) FILTER (l_returnflag = 'R'), 0) AS BIGINT)
         AS n_returned,
       CAST((20000 * coalesce(count(*) FILTER (l_returnflag = 'R'), 0)
             + count(*)) // (2 * count(*)) AS BIGINT) AS return_rate_bp
FROM lineitem JOIN part ON p_partkey = l_partkey
GROUP BY p_brand ORDER BY p_brand"""


QUERIES68 = {
    "events_xcorr": q_events_xcorr,
    "returns_by_brand": q_returns_by_brand,
}
