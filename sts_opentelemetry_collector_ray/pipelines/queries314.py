"""Driver-contract queries, wave 314 — the histogram-binning advisor
(Freedman-Diaconis / Scott / Sturges bin counts for the event value
distribution, exact order-statistic IQR) and the time-irreversibility
of the per-user type-transition chain (entropy production rate — KL
between forward and reversed flows). Same contract as queries.py:
column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES314: dict[str, str] = {}


# ---------------------------------------------------------------------------
# events_histogram_bins_advice — FD / Scott / Sturges bin planning
# ---------------------------------------------------------------------------


def q_events_histogram_bins_advice(sf_dir: str):
    """Binning advisor for the value distribution (cents): IQR from
    exact k = ceil(q n) order statistics, Freedman-Diaconis width
    2 IQR / n^(1/3), Scott width 3.49 sigma / n^(1/3) (sigma from exact
    moments), Sturges count ceil(log2 n) + 1, and the implied FD/Scott
    bin counts over the exact [min, max] range. One row: n, iqr_cents,
    fd_width_milli, n_bins_fd, scott_width_milli, n_bins_scott,
    n_bins_sturges."""

    def partial(t: pa.Table) -> pd.DataFrame:
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        h = pd.Series(cents).groupby(cents).size()
        return pd.DataFrame(
            {"y": h.index.to_numpy(np.int64), "c": h.to_numpy(np.int64)}
        )

    hist = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("y")["c"]
        .sum()
        .sort_index()
    )
    cols = [
        "n", "iqr_cents", "fd_width_milli", "n_bins_fd",
        "scott_width_milli", "n_bins_scott", "n_bins_sturges",
    ]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if hist.empty:
        return empty
    y = hist.index.to_numpy(np.int64)
    c = hist.to_numpy(np.int64)
    n = int(c.sum())
    if n < 4:
        return empty
    cum = np.cumsum(c)

    def order_stat(k: int) -> int:
        return int(y[int(np.searchsorted(cum, k, side="left"))])

    q1 = order_stat((n + 3) // 4)  # ceil(n/4)
    q3 = order_stat((3 * n + 3) // 4)  # ceil(3n/4)
    iqr = q3 - q1
    rng = int(y[-1]) - int(y[0])
    s = int((y.astype(object) * c.astype(object)).sum())
    s2 = int((y.astype(object) * y.astype(object) * c.astype(object)).sum())
    var = (float(s2) - float(s) * float(s) / float(n)) / float(n)
    if var <= 0.0 or iqr <= 0 or rng <= 0:
        return empty
    sigma = float(np.sqrt(var))
    cube = float(n) ** (1.0 / 3.0)
    fd_w = 2.0 * float(iqr) / cube
    sc_w = 3.49 * sigma / cube
    n_fd = int(np.ceil(float(rng) / fd_w))
    n_sc = int(np.ceil(float(rng) / sc_w))
    n_st = int(np.ceil(np.log2(float(n)))) + 1
    return pd.DataFrame(
        [
            (
                np.int64(n), np.int64(iqr),
                np.int64(np.floor(fd_w * 1_000.0 + 0.5)), np.int64(n_fd),
                np.int64(np.floor(sc_w * 1_000.0 + 0.5)), np.int64(n_sc),
                np.int64(n_st),
            )
        ],
        columns=cols,
    ).astype({c_: np.int64 for c_ in cols})


ORACLES314["events_histogram_bins_advice"] = """
WITH b AS (
  SELECT CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS y FROM events
),
h AS (SELECT y, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1),
nn AS (
  SELECT CAST(sum(c) AS BIGINT) AS n, CAST(min(y) AS BIGINT) AS lo,
         CAST(max(y) AS BIGINT) AS hi,
         CAST(sum(y * c) AS BIGINT) AS s,
         CAST(sum(CAST(y AS HUGEINT) * y * c) AS HUGEINT) AS s2
  FROM h
),
cum AS (SELECT y, sum(c) OVER (ORDER BY y) AS cc FROM h),
qs AS (
  SELECT nn.n, nn.lo, nn.hi, nn.s, nn.s2,
         (SELECT min(y) FROM cum, nn WHERE cc >= (nn.n + 3) // 4) AS q1,
         (SELECT min(y) FROM cum, nn WHERE cc >= (3 * nn.n + 3) // 4) AS q3
  FROM nn
),
st AS (
  SELECT n, q3 - q1 AS iqr, hi - lo AS rng,
         sqrt((CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
               / n) / n) AS sigma,
         pow(CAST(n AS DOUBLE), 1.0 / 3.0) AS cube
  FROM qs
  WHERE n >= 4 AND q3 - q1 > 0 AND hi - lo > 0
    AND (CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
        > 0
)
SELECT n, iqr AS iqr_cents,
       CAST(floor(2.0 * iqr / cube * 1000.0 + 0.5) AS BIGINT)
         AS fd_width_milli,
       CAST(ceil(CAST(rng AS DOUBLE) / (2.0 * iqr / cube)) AS BIGINT)
         AS n_bins_fd,
       CAST(floor(3.49 * sigma / cube * 1000.0 + 0.5) AS BIGINT)
         AS scott_width_milli,
       CAST(ceil(CAST(rng AS DOUBLE) / (3.49 * sigma / cube)) AS BIGINT)
         AS n_bins_scott,
       CAST(ceil(log2(CAST(n AS DOUBLE))) + 1 AS BIGINT) AS n_bins_sturges
FROM st"""


# ---------------------------------------------------------------------------
# events_irreversibility — entropy production of the transition chain
# ---------------------------------------------------------------------------


def q_events_irreversibility(sf_dir: str):
    """Time-irreversibility of the per-user type-transition chain
    (the `events_bowker_symmetry` counts): entropy production rate
    EP = sum over ordered pairs i != j with n_ij > 0 and n_ji > 0 of
    (n_ij / N) ln(n_ij / n_ji) — zero iff detailed balance holds; the
    thermodynamic arrow of the event stream. Counting exact, logs
    float. One row: n_trans, n_pairs_used, ep_micro."""

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "u": t["user_id"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
                "ts": pa.compute.cast(t["ts"], pa.int64()).to_numpy(),
                "eid": t["event_id"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
                "et": t["event_type"].to_numpy(zero_copy_only=False),
            }
        )
        df["_b"] = (df["u"] % 64).astype(np.int64)
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        empty_m = pd.DataFrame(
            {
                "f": pd.Series([], dtype=object),
                "t": pd.Series([], dtype=object),
                "c": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty_m
        g = g.sort_values(["u", "ts", "eid"], kind="stable")
        u = g["u"].to_numpy()
        et = g["et"].to_numpy(object)
        same = u[1:] == u[:-1]
        f, t = et[:-1][same], et[1:][same]
        if len(f) == 0:
            return empty_m
        out = (
            pd.DataFrame({"f": f, "t": t})
            .groupby(["f", "t"], sort=False)
            .size()
            .rename("c")
            .reset_index()
        )
        out["c"] = out["c"].astype(np.int64)
        return out

    mat = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "ts", "event_id", "event_type"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .groupby(["f", "t"])["c"]
        .sum()
    )
    cols = ["n_trans", "n_pairs_used", "ep_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if mat.empty:
        return empty
    n_tot = int(mat.sum())
    if n_tot == 0:
        return empty
    ep = 0.0
    used = 0
    for (f, t), c in mat.items():
        if f == t:
            continue
        rev = int(mat.get((t, f), 0))
        if rev == 0 or int(c) == 0:
            continue
        used += 1
        ep += float(int(c)) / float(n_tot) * float(
            np.log(float(int(c)) / float(rev))
        )
    return pd.DataFrame(
        [
            (
                np.int64(n_tot), np.int64(used),
                np.int64(np.floor(ep * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES314["events_irreversibility"] = """
WITH seq AS (
  SELECT event_type AS f,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS t
  FROM events
),
m AS (
  SELECT f, t, CAST(count(*) AS BIGINT) AS c
  FROM seq WHERE t IS NOT NULL GROUP BY 1, 2
),
nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM m),
pairs AS (
  SELECT a.c AS cf, b.c AS cr
  FROM m a JOIN m b ON b.f = a.t AND b.t = a.f
  WHERE a.f <> a.t AND a.c > 0 AND b.c > 0
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS used,
         sum(CAST(cf AS DOUBLE) / nn.n
             * ln(CAST(cf AS DOUBLE) / CAST(cr AS DOUBLE))) AS ep
  FROM pairs, nn
  GROUP BY nn.n
)
SELECT nn.n AS n_trans, coalesce(agg.used, 0) AS n_pairs_used,
       CAST(floor(coalesce(agg.ep, 0.0) * 1000000.0 + 0.5) AS BIGINT)
         AS ep_micro
FROM nn LEFT JOIN agg ON true
WHERE nn.n > 0"""


QUERIES314 = {
    "events_histogram_bins_advice": q_events_histogram_bins_advice,
    "events_irreversibility": q_events_irreversibility,
}
