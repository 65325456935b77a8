"""Driver-contract queries, wave 358 — monetization skew (how users'
revenue shares diverge from their activity shares) and discount depth
by ship weekday (pricing-operations calendar). Same contract as
queries.py: column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES358: dict[str, str] = {}

_MS_BUCKETS = 64
_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# users_monetization_skew — revenue share vs activity share
# ---------------------------------------------------------------------------


def q_users_monetization_skew(sf_dir: str):
    """Monetization divergence: per user the event-count share and the
    value-cents share; the total-variation distance
    TV = sum |p_i - q_i| / 2 between the two distributions, and how
    many users monetize ABOVE their activity (value share > count
    share, decided by the EXACT cross-multiplication
    v_i * N_total > n_i * V_total). One row: n_users, tv_micro,
    n_over_monetized, over_share_micro.

    Scale shape: per-user (n, cents) reduce on a user-bucket exchange;
    TV folds per bucket against broadcast totals — two passes, all
    scalars."""
    import ray as _ray

    def partial(t: pa.Table) -> pd.DataFrame:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame({"u": u, "n": 1, "v": cents})
            .groupby("u", as_index=False)
            .sum()
        )
        g["_b"] = (g["u"].to_numpy(np.int64) % _MS_BUCKETS).astype(np.int64)
        return g.astype(np.int64)

    per_bucket = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "value"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(
            lambda g: g.groupby("u")[["n", "v"]].sum().reset_index(),
            batch_format="pandas",
        )
        .materialize()  # corpus-reduced per-user table, reused twice
    )
    tot = (
        per_bucket.map_batches(
            lambda df: pd.DataFrame(
                {
                    "n": [np.int64(int(df["n"].sum()))],
                    "v": [np.int64(int(df["v"].sum()))],
                }
            ),
            batch_format="pandas",
        )
        .to_pandas()
        .sum()
    )
    cols = ["n_users", "tv_micro", "n_over_monetized", "over_share_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    n_tot, v_tot = int(tot["n"]), int(tot["v"])
    if n_tot == 0 or v_tot <= 0:
        return empty
    tref = _ray.put((n_tot, v_tot))

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        nt, vt = _ray.get(tref)
        n = df["n"].to_numpy(np.int64).astype(object)
        v = df["v"].to_numpy(np.int64).astype(object)
        # |v/vt - n/nt| = |v*nt - n*vt| / (vt*nt) — exact numerators
        num = np.array(
            [abs(int(a) * nt - int(b) * vt) for a, b in zip(v, n)],
            dtype=object,
        )
        over = sum(
            1 for a, b in zip(v, n) if int(a) * nt > int(b) * vt
        )
        return pd.DataFrame(
            {
                "k": [np.int64(len(df))],
                "s": [int(num.sum())],
                "o": [np.int64(int(over))],
            }
        )

    p = (
        per_bucket.map_batches(fold, batch_format="pandas")
        .to_pandas()
    )
    k = int(p["k"].sum())
    s = int(sum(int(x) for x in p["s"]))
    o = int(p["o"].sum())
    tv = float(s) / (2.0 * float(v_tot) * float(n_tot))
    return pd.DataFrame(
        [
            (
                np.int64(k),
                np.int64(np.floor(tv * 1_000_000.0 + 0.5)),
                np.int64(o),
                np.int64(np.floor(
                    float(o) / float(k) * 1_000_000.0 + 0.5
                )),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES358["users_monetization_skew"] = """
WITH per AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS v
  FROM events GROUP BY 1
),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(sum(v) AS BIGINT) AS vt
  FROM per
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         CAST(sum(abs(CAST(per.v AS HUGEINT) * tot.nt
                      - CAST(per.n AS HUGEINT) * tot.vt)) AS HUGEINT)
           AS s,
         CAST(sum(CASE WHEN CAST(per.v AS HUGEINT) * tot.nt
                            > CAST(per.n AS HUGEINT) * tot.vt
                       THEN 1 ELSE 0 END) AS BIGINT) AS o
  FROM per, tot
),
f AS (SELECT agg.k, agg.s, agg.o, tot.nt, tot.vt FROM agg, tot)
SELECT k AS n_users,
       CAST(floor(CAST(s AS DOUBLE)
                  / (2.0 * CAST(vt AS DOUBLE) * CAST(nt AS DOUBLE))
                  * 1000000.0 + 0.5) AS BIGINT) AS tv_micro,
       o AS n_over_monetized,
       CAST(floor(CAST(o AS DOUBLE) / k * 1000000.0 + 0.5) AS BIGINT)
         AS over_share_micro
FROM f
WHERE nt > 0 AND vt > 0"""


# ---------------------------------------------------------------------------
# lineitem_discount_by_dow — discount depth calendar
# ---------------------------------------------------------------------------


def q_lineitem_discount_by_dow(sf_dir: str):
    """Pricing calendar: mean discount (milli) per ship epoch-weekday,
    with each day's deviation from the overall mean. Exact integer
    sums, mirrored float means. Per dow: dow, n, mean_disc_milli,
    dev_milli."""

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        dow = (
            df["l_shipdate"].to_numpy("datetime64[us]").astype(np.int64)
            // _DAY_US
        ) % 7
        disc = np.floor(
            df["l_discount"].to_numpy(np.float64) * 1000.0 + 0.5
        ).astype(np.int64)
        g = pd.DataFrame({"dow": dow, "n": 1, "s": disc}).groupby(
            "dow", as_index=False
        ).sum()
        return g.astype(np.int64)

    m = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_shipdate", "l_discount"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("dow")[["n", "s"]]
        .sum()
        .sort_index()
    )
    cols = ["dow", "n", "mean_disc_milli", "dev_milli"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if m.empty:
        return empty
    n_tot = int(m["n"].sum())
    s_tot = int(m["s"].sum())
    overall = float(s_tot) / float(n_tot)
    rows = []
    for dow, r in m.iterrows():
        n, s = int(r["n"]), int(r["s"])
        mean = float(s) / float(n)
        rows.append(
            (
                np.int64(int(dow)), np.int64(n),
                np.int64(np.floor(mean * 1_000.0 + 0.5)),
                np.int64(np.floor((mean - overall) * 1_000.0 + 0.5)),
            )
        )
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols}
    )


ORACLES358["lineitem_discount_by_dow"] = f"""
WITH b AS (
  SELECT CAST((epoch_us(l_shipdate) // {_DAY_US}) % 7 AS BIGINT) AS dow,
         CAST(floor(l_discount * 1000.0 + 0.5) AS BIGINT) AS d
  FROM lineitem
),
m AS (
  SELECT dow, CAST(count(*) AS BIGINT) AS n, CAST(sum(d) AS BIGINT) AS s
  FROM b GROUP BY 1
),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(sum(s) AS BIGINT) AS st
  FROM m
)
SELECT m.dow, m.n,
       CAST(floor(CAST(m.s AS DOUBLE) / m.n * 1000.0 + 0.5) AS BIGINT)
         AS mean_disc_milli,
       CAST(floor((CAST(m.s AS DOUBLE) / m.n
                   - CAST(tot.st AS DOUBLE) / tot.nt) * 1000.0 + 0.5)
            AS BIGINT) AS dev_milli
FROM m, tot
ORDER BY m.dow"""


QUERIES358 = {
    "users_monetization_skew": q_users_monetization_skew,
    "lineitem_discount_by_dow": q_lineitem_discount_by_dow,
}
