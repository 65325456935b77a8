"""Driver-contract queries, wave 341 — the activity-tercile mobility
matrix (where first-half light/medium/heavy users land in the second
half) and rockets-and-feathers price asymmetry (do brand price levels
rise faster than they fall?). Same contract as queries.py: column names
AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES341: dict[str, str] = {}

_AM_BUCKETS = 64


# ---------------------------------------------------------------------------
# users_activity_mobility — tercile transition matrix across halves
# ---------------------------------------------------------------------------


def q_users_activity_mobility(sf_dir: str):
    """Mobility: users active in BOTH halves (midpoint split, second
    half inclusive) are terciled within each half by activity
    (boundaries k = ceil(n/3), ceil(2n/3) over the half's activity
    histogram — exact order statistics; ties share a tercile by value).
    Per cell: from_tercile, to_tercile, n_users, row_share_micro.

    Scale shape: per-user half counts ride one user-bucket exchange;
    tercile boundaries come off bounded histograms; the census is a
    second bounded fold."""

    meta = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        .map_batches(
            lambda t: pd.DataFrame(
                {
                    "mn": [np.int64(
                        pa.compute.cast(t["ts"], pa.int64()).to_numpy().min()
                    )],
                    "mx": [np.int64(
                        pa.compute.cast(t["ts"], pa.int64()).to_numpy().max()
                    )],
                }
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    cols = ["from_tercile", "to_tercile", "n_users", "row_share_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if meta.empty:
        return empty
    mid = (int(meta["mn"].min()) + int(meta["mx"].max())) // 2

    def partial(t: pa.Table) -> pd.DataFrame:
        us = pa.compute.cast(t["ts"], pa.int64()).to_numpy()
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = (us >= mid).astype(np.int64)
        g = (
            pd.DataFrame({"u": u, "n1": 1 - h, "n2": h})
            .groupby("u", as_index=False)
            .sum()
        )
        g["_b"] = (g["u"].to_numpy(np.int64) % _AM_BUCKETS).astype(np.int64)
        return g.astype(np.int64)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby("u")[["n1", "n2"]].sum().reset_index()
        return per.astype(np.int64)

    per = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # corpus-reduced small side (|users|)
    )
    both = per[(per["n1"] > 0) & (per["n2"] > 0)]
    n = len(both)
    if n < 3:
        return empty

    def tercile(v: np.ndarray) -> np.ndarray:
        s = np.sort(v)
        k1 = (n + 2) // 3  # ceil(n/3)
        k2 = (2 * n + 2) // 3  # ceil(2n/3)
        b1, b2 = int(s[k1 - 1]), int(s[k2 - 1])
        return np.where(v <= b1, 0, np.where(v <= b2, 1, 2)).astype(
            np.int64
        )

    t1 = tercile(both["n1"].to_numpy(np.int64))
    t2 = tercile(both["n2"].to_numpy(np.int64))
    h = (
        pd.DataFrame({"f": t1, "t": t2})
        .groupby(["f", "t"])
        .size()
        .rename("n")
        .reset_index()
    )
    row_tot = h.groupby("f")["n"].transform("sum")
    h["row_share_micro"] = np.floor(
        h["n"].to_numpy(np.float64) / row_tot.to_numpy(np.float64)
        * 1_000_000.0 + 0.5
    ).astype(np.int64)
    h = h.rename(
        columns={"f": "from_tercile", "t": "to_tercile", "n": "n_users"}
    )
    return (
        h.sort_values(["from_tercile", "to_tercile"])
        .reset_index(drop=True)
        .astype({c: np.int64 for c in cols})
    )[cols]


ORACLES341["users_activity_mobility"] = """
WITH span AS (
  SELECT (CAST(min(epoch_us(ts)) AS BIGINT)
          + CAST(max(epoch_us(ts)) AS BIGINT)) // 2 AS mid
  FROM events
),
per AS (
  SELECT user_id,
         CAST(sum(CASE WHEN epoch_us(ts) < span.mid THEN 1 ELSE 0 END)
              AS BIGINT) AS n1,
         CAST(sum(CASE WHEN epoch_us(ts) >= span.mid THEN 1 ELSE 0 END)
              AS BIGINT) AS n2
  FROM events, span GROUP BY 1
),
actv AS (SELECT * FROM per WHERE n1 > 0 AND n2 > 0),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM actv),
b1 AS (
  SELECT
    (SELECT n1 FROM actv ORDER BY n1
     LIMIT 1 OFFSET (SELECT (n + 2) // 3 - 1 FROM nn)) AS q1,
    (SELECT n1 FROM actv ORDER BY n1
     LIMIT 1 OFFSET (SELECT (2 * n + 2) // 3 - 1 FROM nn)) AS q2
),
b2 AS (
  SELECT
    (SELECT n2 FROM actv ORDER BY n2
     LIMIT 1 OFFSET (SELECT (n + 2) // 3 - 1 FROM nn)) AS q1,
    (SELECT n2 FROM actv ORDER BY n2
     LIMIT 1 OFFSET (SELECT (2 * n + 2) // 3 - 1 FROM nn)) AS q2
),
cls AS (
  SELECT CASE WHEN n1 <= b1.q1 THEN 0 WHEN n1 <= b1.q2 THEN 1 ELSE 2 END
           AS f,
         CASE WHEN n2 <= b2.q1 THEN 0 WHEN n2 <= b2.q2 THEN 1 ELSE 2 END
           AS t
  FROM actv, b1, b2
),
h AS (
  SELECT CAST(f AS BIGINT) AS from_tercile, CAST(t AS BIGINT) AS to_tercile,
         CAST(count(*) AS BIGINT) AS n_users
  FROM cls GROUP BY 1, 2
),
rt AS (
  SELECT from_tercile, CAST(sum(n_users) AS BIGINT) AS tot
  FROM h GROUP BY 1
)
SELECT h.from_tercile, h.to_tercile, h.n_users,
       CAST(floor(CAST(h.n_users AS DOUBLE) / rt.tot * 1000000.0 + 0.5)
            AS BIGINT) AS row_share_micro
FROM h JOIN rt USING (from_tercile), nn
WHERE nn.n >= 3
ORDER BY h.from_tercile, h.to_tercile"""


# ---------------------------------------------------------------------------
# part_price_asymmetry — rockets and feathers on brand price levels
# ---------------------------------------------------------------------------


def q_part_price_asymmetry(sf_dir: str):
    """Rockets and feathers: over consecutive observed months of each
    brand's integer price level (the `part_price_synchronization`
    convention), compare up-moves and down-moves: counts and mean
    magnitudes (cents). Asymmetry = mean_up / mean_down. One row:
    n_ups, n_downs, mean_up_milli, mean_down_milli, asym_micro."""
    import ray as _ray
    import pyarrow.parquet as pq_mod

    part_t = pq_mod.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    )
    p2b = dict(zip(part_t["p_partkey"].to_pylist(), part_t["p_brand"].to_pylist()))
    dims_ref = _ray.put(p2b)

    def partial(t: pa.Table) -> pd.DataFrame:
        p2b_ = _ray.get(dims_ref)
        df = t.to_pandas()
        cents = np.floor(
            df["l_extendedprice"].to_numpy(np.float64)
            / df["l_quantity"].to_numpy(np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        ym = (
            df["l_shipdate"].dt.year.to_numpy(np.int64) * 12
            + df["l_shipdate"].dt.month.to_numpy(np.int64) - 1
        )
        brand = df["l_partkey"].map(p2b_).to_numpy(object)
        g = (
            pd.DataFrame({"brand": brand, "ym": ym, "n": 1, "s": cents})
            .groupby(["brand", "ym"], as_index=False)
            .sum()
        )
        return g.astype({"ym": np.int64, "n": np.int64, "s": np.int64})

    m = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_shipdate", "l_quantity",
                     "l_extendedprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["brand", "ym"])[["n", "s"]]
        .sum()
        .reset_index()
    )
    cols = ["n_ups", "n_downs", "mean_up_milli", "mean_down_milli",
            "asym_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if m.empty:
        return empty
    m["lvl"] = (m["s"] // m["n"]).astype(np.int64)
    ups = 0
    downs = 0
    up_sum = 0
    dn_sum = 0
    for _, sub in m.groupby("brand"):
        sub = sub.sort_values("ym")
        ym = sub["ym"].to_numpy(np.int64)
        lvl = sub["lvl"].to_numpy(np.int64)
        adj = ym[1:] == ym[:-1] + 1
        d = (lvl[1:] - lvl[:-1])[adj]
        ups += int((d > 0).sum())
        downs += int((d < 0).sum())
        up_sum += int(d[d > 0].sum())
        dn_sum += int((-d[d < 0]).sum())
    if ups == 0 or downs == 0:
        return empty
    mu = float(up_sum) / float(ups)
    md = float(dn_sum) / float(downs)
    if md <= 0.0:
        return empty
    return pd.DataFrame(
        [
            (
                np.int64(ups), np.int64(downs),
                np.int64(np.floor(mu * 1_000.0 + 0.5)),
                np.int64(np.floor(md * 1_000.0 + 0.5)),
                np.int64(np.floor(mu / md * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES341["part_price_asymmetry"] = """
WITH base AS (
  SELECT p.p_brand AS brand,
         CAST(year(l.l_shipdate) * 12 + month(l.l_shipdate) - 1 AS BIGINT)
           AS ym,
         CAST(floor(l.l_extendedprice / l.l_quantity * 100.0 + 0.5)
              AS BIGINT) AS cents
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
lvl AS (
  SELECT brand, ym, CAST(sum(cents) // count(*) AS BIGINT) AS lvl
  FROM base GROUP BY 1, 2
),
d AS (
  SELECT lvl - lag(lvl) OVER (PARTITION BY brand ORDER BY ym) AS dv,
         ym - lag(ym) OVER (PARTITION BY brand ORDER BY ym) AS gap
  FROM lvl
),
dd AS (SELECT dv FROM d WHERE gap = 1),
agg AS (
  SELECT CAST(sum(CASE WHEN dv > 0 THEN 1 ELSE 0 END) AS BIGINT) AS ups,
         CAST(sum(CASE WHEN dv < 0 THEN 1 ELSE 0 END) AS BIGINT) AS downs,
         CAST(coalesce(sum(CASE WHEN dv > 0 THEN dv END), 0) AS BIGINT)
           AS up_sum,
         CAST(coalesce(sum(CASE WHEN dv < 0 THEN -dv END), 0) AS BIGINT)
           AS dn_sum
  FROM dd
)
SELECT ups AS n_ups, downs AS n_downs,
       CAST(floor(CAST(up_sum AS DOUBLE) / ups * 1000.0 + 0.5) AS BIGINT)
         AS mean_up_milli,
       CAST(floor(CAST(dn_sum AS DOUBLE) / downs * 1000.0 + 0.5) AS BIGINT)
         AS mean_down_milli,
       CAST(floor((CAST(up_sum AS DOUBLE) / ups)
                  / (CAST(dn_sum AS DOUBLE) / downs) * 1000000.0 + 0.5)
            AS BIGINT) AS asym_micro
FROM agg
WHERE ups > 0 AND downs > 0 AND dn_sum > 0"""


QUERIES341 = {
    "users_activity_mobility": q_users_activity_mobility,
    "part_price_asymmetry": q_part_price_asymmetry,
}
