"""Driver-contract queries, wave 348 — tenure vs diversity correlation
(do long-lived users touch more event types?) and per-type timing
divergence (which types' weekday mixes deviate most from the pooled
profile). Same contract as queries.py: column names AND dtypes match
the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES348: dict[str, str] = {}

_DAY_US = 86_400_000_000
_TD_BUCKETS = 64


# ---------------------------------------------------------------------------
# users_tenure_diversity_corr — active span vs type richness
# ---------------------------------------------------------------------------


def q_users_tenure_diversity_corr(sf_dir: str):
    """Per user: tenure = last event day - first event day + 1 and
    diversity = distinct event types; Pearson r over users from EXACT
    integer moments. One row: n_users, mean_tenure_milli,
    mean_diversity_milli, r_micro.

    Scale shape: per-user (min, max, type-set-size) partials ride one
    user-bucket exchange emitting six scalars per bucket."""

    # NOTE: type sets can split across batches — the merge below must
    # re-reduce with min/max and a DISTINCT type union, so partials carry
    # the raw (u, et) pairs too
    def pair_partial(t: pa.Table) -> pd.DataFrame:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        dy = pa.compute.cast(t["ts"], pa.int64()).to_numpy() // _DAY_US
        df = pd.DataFrame({"u": u, "et": et, "dy": dy})
        g = df.groupby(["u", "et"]).agg(
            mn=("dy", "min"), mx=("dy", "max")
        ).reset_index()
        g["_b"] = (g["u"].to_numpy(np.int64) % _TD_BUCKETS).astype(np.int64)
        return g

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        per_t = g.groupby(["u", "et"]).agg(mn=("mn", "min"), mx=("mx", "max"))
        per = per_t.reset_index().groupby("u").agg(
            mn=("mn", "min"), mx=("mx", "max"), k=("et", "size")
        )
        x = (per["mx"] - per["mn"] + 1).to_numpy(np.int64).astype(object)
        y = per["k"].to_numpy(np.int64).astype(object)
        return pd.DataFrame(
            {
                "n": [np.int64(len(per))],
                "sx": [np.int64(int(x.sum()))],
                "sy": [np.int64(int(y.sum()))],
                "sxx": [np.int64(int((x * x).sum()))],
                "syy": [np.int64(int((y * y).sum()))],
                "sxy": [np.int64(int((x * y).sum()))],
            }
        )

    p = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
        )
        .map_batches(pair_partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .sum()
    )
    cols = ["n_users", "mean_tenure_milli", "mean_diversity_milli",
            "r_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    n = int(p["n"])
    if n < 3:
        return empty
    sx, sy = int(p["sx"]), int(p["sy"])
    sxx, syy, sxy = int(p["sxx"]), int(p["syy"]), int(p["sxy"])
    cx = n * sxx - sx * sx
    cy = n * syy - sy * sy
    if cx <= 0 or cy <= 0:
        return empty
    r = float(n * sxy - sx * sy) / (
        float(np.sqrt(float(cx))) * float(np.sqrt(float(cy)))
    )
    return pd.DataFrame(
        [
            (
                np.int64(n),
                np.int64(np.floor(float(sx) / float(n) * 1_000.0 + 0.5)),
                np.int64(np.floor(float(sy) / float(n) * 1_000.0 + 0.5)),
                np.int64(np.floor(r * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES348["users_tenure_diversity_corr"] = f"""
WITH per AS (
  SELECT user_id,
         CAST(max(epoch_us(ts) // {_DAY_US})
              - min(epoch_us(ts) // {_DAY_US}) + 1 AS BIGINT) AS x,
         CAST(count(DISTINCT event_type) AS BIGINT) AS y
  FROM events GROUP BY 1
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
         CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
  FROM per
)
SELECT n AS n_users,
       CAST(floor(CAST(sx AS DOUBLE) / n * 1000.0 + 0.5) AS BIGINT)
         AS mean_tenure_milli,
       CAST(floor(CAST(sy AS DOUBLE) / n * 1000.0 + 0.5) AS BIGINT)
         AS mean_diversity_milli,
       CAST(floor(CAST(CAST(n AS HUGEINT) * sxy
                       - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                  / (sqrt(CAST(CAST(n AS HUGEINT) * sxx
                               - CAST(sx AS HUGEINT) * sx AS DOUBLE))
                     * sqrt(CAST(CAST(n AS HUGEINT) * syy
                                 - CAST(sy AS HUGEINT) * sy AS DOUBLE)))
                  * 1000000.0 + 0.5) AS BIGINT) AS r_micro
FROM m
WHERE n >= 3
  AND (CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx) > 0
  AND (CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy) > 0"""


# ---------------------------------------------------------------------------
# events_type_timing_divergence — weekday mix vs the pooled profile
# ---------------------------------------------------------------------------


def q_events_type_timing_divergence(sf_dir: str):
    """Timing divergence: per event type the chi-square of its weekday
    counts against expectations from the POOLED weekday profile
    (e = n_type * pooled_share). Counts exact; one float fold per type.
    Per type: event_type, n, chi2_micro, chi2_per_n_micro."""

    def partial(t: pa.Table) -> pd.DataFrame:
        dow = (
            pa.compute.cast(t["ts"], pa.int64()).to_numpy() // _DAY_US
        ) % 7
        df = pd.DataFrame(
            {"et": t["event_type"].to_numpy(zero_copy_only=False),
             "dow": dow}
        )
        g = df.groupby(["et", "dow"]).size().rename("c").reset_index()
        g["c"] = g["c"].astype(np.int64)
        return g

    h = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["et", "dow"])["c"]
        .sum()
    )
    cols = ["event_type", "n", "chi2_micro", "chi2_per_n_micro"]
    empty = pd.DataFrame(
        {
            "event_type": pd.Series([], dtype=object),
            **{c: pd.Series([], dtype=np.int64) for c in cols[1:]},
        }
    )
    if h.empty:
        return empty
    pooled = h.groupby(level=1).sum()
    n_tot = int(pooled.sum())
    rows = []
    for et in sorted(set(h.index.get_level_values(0))):
        sub = h.loc[et]
        n_t = int(sub.sum())
        chi2 = 0.0
        for w in range(7):
            o = float(int(sub.get(w, 0)))
            e = float(n_t) * float(int(pooled.get(w, 0))) / float(n_tot)
            if e > 0.0:
                chi2 += (o - e) * (o - e) / e
        rows.append(
            (
                et, np.int64(n_t),
                np.int64(np.floor(chi2 * 1_000_000.0 + 0.5)),
                np.int64(np.floor(
                    chi2 / float(n_t) * 1_000_000.0 + 0.5
                )),
            )
        )
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols[1:]}
    )


ORACLES348["events_type_timing_divergence"] = f"""
WITH b AS (
  SELECT event_type AS et,
         CAST((epoch_us(ts) // {_DAY_US}) % 7 AS BIGINT) AS dow
  FROM events
),
h AS (
  SELECT et, dow, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1, 2
),
pool AS (SELECT dow, CAST(sum(c) AS BIGINT) AS c FROM h GROUP BY 1),
nt AS (SELECT et, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1),
nn AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM pool),
dows AS (SELECT CAST(r.range AS BIGINT) AS dow FROM range(0, 7) r),
cells AS (
  SELECT nt.et, nt.n, dows.dow,
         CAST(coalesce(h.c, 0) AS BIGINT) AS o,
         CAST(nt.n AS DOUBLE) * coalesce(pool.c, 0) / nn.t AS e
  FROM nt CROSS JOIN dows
  LEFT JOIN h ON h.et = nt.et AND h.dow = dows.dow
  LEFT JOIN pool ON pool.dow = dows.dow, nn
),
chi AS (
  SELECT et, max(n) AS n,
         sum(CASE WHEN e > 0 THEN (o - e) * (o - e) / e ELSE 0 END)
           AS chi2
  FROM cells GROUP BY 1
)
SELECT et AS event_type, CAST(n AS BIGINT) AS n,
       CAST(floor(chi2 * 1000000.0 + 0.5) AS BIGINT) AS chi2_micro,
       CAST(floor(chi2 / n * 1000000.0 + 0.5) AS BIGINT)
         AS chi2_per_n_micro
FROM chi
ORDER BY event_type"""


QUERIES348 = {
    "users_tenure_diversity_corr": q_users_tenure_diversity_corr,
    "events_type_timing_divergence": q_events_type_timing_divergence,
}
