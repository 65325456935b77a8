"""Driver-contract queries, wave 106 — account-sharing screen (users whose
EXACT minute-level activity fingerprints coincide: the duplicate-account /
replayed-traffic detector) and KPI driver tree (week-over-week change in
total value decomposed into active-users × events-per-user ×
value-per-event contributions via exact telescoping rationals — the
metric-tree readout growth reviews run on). Same contract as queries.py:
column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES106: dict[str, str] = {}

_AS_BUCKETS = 32
_MIN_US = 60_000_000
_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# events_account_sharing — identical minute-fingerprint cohorts
# ---------------------------------------------------------------------------


def q_events_account_sharing(sf_dir: str):
    """Duplicate-account screen: two users are suspicious when their entire
    DISTINCT activity-minute sets are identical (replayed or mirrored
    traffic). Emits every user whose fingerprint is shared, with the cohort
    size and fingerprint cardinality.

    Scale shape: per-batch distinct (user, minute) partials → ONE
    user-bucket exchange builds each user's exact sorted minute set and
    folds it to an FNV-1a64 chain fingerprint (order-canonical, collision
    odds ~2⁻⁶⁴); only (user, fp, n_minutes) rows leave; a bounded
    fingerprint-keyed pandas fold on the driver sizes the cohorts. The SQL
    oracle groups by the minute LIST itself — a hash collision would fail
    the value gate, which is the contract check."""
    from ..functions.hashing import fnv1a64

    def partial(t: pa.Table) -> pd.DataFrame:
        u = t["user_id"].to_numpy().astype(np.int64)
        mn = t["ts"].cast(pa.int64()).to_numpy() // _MIN_US
        df = pd.DataFrame({"u": u, "mn": mn}).drop_duplicates()
        df["_b"] = (df["u"] % _AS_BUCKETS).astype(np.int64)
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        m = g.drop_duplicates(["u", "mn"]).sort_values(
            ["u", "mn"], kind="mergesort"
        )
        u = m["u"].to_numpy(np.int64)
        mn = m["mn"].to_numpy(np.int64)
        first = np.r_[True, u[1:] != u[:-1]]
        starts = np.flatnonzero(first)
        ends = np.r_[starts[1:], len(u)]
        rows = []
        for s, e in zip(starts, ends):
            fp = fnv1a64(mn[s:e].tobytes())
            rows.append(
                {"user_id": int(u[s]), "fp": np.int64(fp - (1 << 63)), "n_minutes": int(e - s)}
            )
        return pd.DataFrame(rows).astype(np.int64)

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # one row per user
    )
    size = part.groupby("fp")["user_id"].transform("size")
    out = part.loc[size > 1, ["user_id", "n_minutes"]].copy()
    out["cohort_size"] = size[size > 1].astype(np.int64)
    out = out.sort_values("user_id").reset_index(drop=True)
    return out.astype(np.int64)


ORACLES106["events_account_sharing"] = f"""
WITH m AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_MIN_US} AS mn FROM events
),
fp AS (
  SELECT user_id, list(mn ORDER BY mn) AS f, count(*) AS n_minutes
  FROM m GROUP BY user_id
),
c AS (SELECT f, count(*) AS cohort_size FROM fp GROUP BY f)
SELECT fp.user_id, CAST(fp.n_minutes AS BIGINT) AS n_minutes,
       CAST(c.cohort_size AS BIGINT) AS cohort_size
FROM fp JOIN c USING (f) WHERE c.cohort_size > 1"""


# ---------------------------------------------------------------------------
# events_kpi_tree — WoW value change decomposed into driver contributions
# ---------------------------------------------------------------------------


def q_events_kpi_tree(sf_dir: str):
    """Metric tree: total cents V = U·(E/U)·(V/E). Comparing the last full
    7 days against the 7 before (anchored at the corpus max day), the WoW
    delta telescopes EXACTLY into
    c_users = (U₂−U₁)·V₁/U₁, c_epu = (E₂/U₂ − E₁/U₁)·U₂·V₁/E₁ and
    c_vpe = (V₂/E₂ − V₁/E₁)·E₂ — each released as an independently floored
    micro-cents integer (the three exact rationals sum to V₂−V₁).

    Scale shape: a tiny max-day pre-pass; per-batch (window, Σcents, n,
    user-distinct partials) — distinct users resolve through ONE user-bucket
    exchange (the stickiness precedent); the driver does O(1) rational
    math with Python ints."""
    from fractions import Fraction

    def mx_part(t: pa.Table) -> pd.DataFrame:
        d = t["ts"].cast(pa.int64()).to_numpy() // _DAY_US
        return pd.DataFrame({"mx": [int(d.max())]})

    mx = int(
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        .map_batches(mx_part, batch_format="pyarrow")
        .to_pandas()["mx"]
        .max()
    )
    lo2, lo1 = mx - 6, mx - 13  # window 2 = [mx-6, mx]; window 1 = [mx-13, mx-7]

    def partial(t: pa.Table) -> pd.DataFrame:
        u = t["user_id"].to_numpy().astype(np.int64)
        d = t["ts"].cast(pa.int64()).to_numpy() // _DAY_US
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        w = np.where(d >= lo2, 2, np.where(d >= lo1, 1, 0)).astype(np.int64)
        m = w > 0
        df = pd.DataFrame({"w": w[m], "u": u[m], "v": cents[m]})
        g = (
            df.groupby(["w", "u"], sort=False)["v"]
            .agg(["sum", "size"])
            .reset_index()
        )
        g.columns = ["w", "u", "v", "n"]
        g = g.astype(np.int64)
        g["_b"] = (g["u"] % _AS_BUCKETS).astype(np.int64)
        return g

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby(["w", "u"], sort=False)[["v", "n"]].sum().reset_index()
        out = (
            m.groupby("w", sort=False)
            .agg(v=("v", "sum"), n=("n", "sum"), users=("u", "size"))
            .reset_index()
        )
        return out.astype(np.int64)

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: ≤2 rows per bucket
    )
    agg = part.groupby("w")[["v", "n", "users"]].sum()

    def row(w):
        if w in agg.index:
            r = agg.loc[w]
            return int(r["v"]), int(r["n"]), int(r["users"])
        return 0, 0, 0

    v1, e1, u1 = row(1)
    v2, e2, u2 = row(2)
    if u1 == 0 or e1 == 0 or u2 == 0 or e2 == 0:
        c_users = c_epu = c_vpe = Fraction(0)
    else:
        c_users = (u2 - u1) * Fraction(v1, u1)
        c_epu = (Fraction(e2, u2) - Fraction(e1, u1)) * u2 * Fraction(v1, e1)
        c_vpe = (Fraction(v2, e2) - Fraction(v1, e1)) * e2

    def micro(fr: Fraction) -> int:
        return (fr.numerator * 1_000_000) // fr.denominator

    return pd.DataFrame(
        {
            "v1_cents": np.array([v1], np.int64),
            "v2_cents": np.array([v2], np.int64),
            "delta_cents": np.array([v2 - v1], np.int64),
            "c_users_micro": np.array([micro(c_users)], np.int64),
            "c_epu_micro": np.array([micro(c_epu)], np.int64),
            "c_vpe_micro": np.array([micro(c_vpe)], np.int64),
        }
    )


ORACLES106["events_kpi_tree"] = f"""
WITH b AS (SELECT max(epoch_us(ts) // {_DAY_US}) AS mx FROM events),
e AS (
  SELECT CASE WHEN epoch_us(ts) // {_DAY_US} >= mx - 6 THEN 2
              WHEN epoch_us(ts) // {_DAY_US} >= mx - 13 THEN 1
              ELSE 0 END AS w,
         user_id,
         CAST(floor(value * 100 + 0.5) AS HUGEINT) AS v
  FROM events, b
),
s AS (
  SELECT w, CAST(sum(v) AS HUGEINT) AS v, CAST(count(*) AS HUGEINT) AS n,
         CAST(count(DISTINCT user_id) AS HUGEINT) AS u
  FROM e WHERE w > 0 GROUP BY w
),
p AS (
  SELECT
    coalesce(max(v) FILTER (w = 1), 0) AS v1,
    coalesce(max(n) FILTER (w = 1), 0) AS e1,
    coalesce(max(u) FILTER (w = 1), 0) AS u1,
    coalesce(max(v) FILTER (w = 2), 0) AS v2,
    coalesce(max(n) FILTER (w = 2), 0) AS e2,
    coalesce(max(u) FILTER (w = 2), 0) AS u2
  FROM s
)
SELECT CAST(v1 AS BIGINT) AS v1_cents, CAST(v2 AS BIGINT) AS v2_cents,
       CAST(v2 - v1 AS BIGINT) AS delta_cents,
       -- +OFF offset: DuckDB // truncates while Python floors (the
       -- emb_label_centroids negative-floor-div trick)
       CAST(CASE WHEN u1 = 0 OR e1 = 0 OR u2 = 0 OR e2 = 0 THEN 0
                 ELSE ((u2 - u1) * v1 * 1000000
                       + 1000000000000000000 * u1) // u1
                      - 1000000000000000000 END AS BIGINT)
         AS c_users_micro,
       CAST(CASE WHEN u1 = 0 OR e1 = 0 OR u2 = 0 OR e2 = 0 THEN 0
                 ELSE ((e2 * u1 - e1 * u2) * v1 * 1000000
                       + 1000000000000000000 * (u1 * e1)) // (u1 * e1)
                      - 1000000000000000000 END AS BIGINT) AS c_epu_micro,
       CAST(CASE WHEN u1 = 0 OR e1 = 0 OR u2 = 0 OR e2 = 0 THEN 0
                 ELSE ((v2 * e1 - v1 * e2) * 1000000
                       + 1000000000000000000 * e1) // e1
                      - 1000000000000000000 END AS BIGINT) AS c_vpe_micro
FROM p"""


QUERIES106 = {
    "events_account_sharing": q_events_account_sharing,
    "events_kpi_tree": q_events_kpi_tree,
}
