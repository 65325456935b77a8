"""Driver-contract queries, wave 379 — the log-rank test comparing
time-to-next-event survival between high- and low-activity user halves
and exact quantile bands of customer balances per market segment.
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES379: dict[str, str] = {}

_LR_BUCKETS = 64


# ---------------------------------------------------------------------------
# events_logrank_activity_split — log-rank between activity halves
# ---------------------------------------------------------------------------


def q_events_logrank_activity_split(sf_dir: str):
    """Log-rank: users split at the lower-median total event count
    (group A = count > median); per-user inter-event gaps are the
    survival times (no censoring here — every gap is an event). At
    each distinct gap t: d_g deaths and n_g at-risk per group (exact
    integers); E_A = sum d * nA/n and V = sum d (nA/n)(1 - nA/n)
    (n - d)/(n - 1) fold in ascending t; chi2 = (O_A - E_A)^2 / V.
    One row: n_users_a, n_users_b, obs_a, exp_a_milli, chi2_micro."""

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
            }
        )
        df["_b"] = (df["u"] % _LR_BUCKETS).astype(np.int64)
        return df

    raw = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .materialize()
    )
    counts = (
        raw.map_batches(
            lambda df: df.groupby("u", as_index=False).size().rename(
                columns={"size": "n"}
            ),
            batch_format="pandas",
        )
        .to_pandas()
        .groupby("u")["n"]
        .sum()
    )
    cols = ["n_users_a", "n_users_b", "obs_a", "exp_a_milli",
            "chi2_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if counts.empty:
        return empty
    cv = np.sort(counts.to_numpy(np.int64))
    med = int(cv[(len(cv) - 1) // 2])
    grp_a = set(
        int(u) for u, n in counts.items() if int(n) > med
    )
    n_a_users = len(grp_a)
    n_b_users = len(counts) - n_a_users
    if n_a_users == 0 or n_b_users == 0:
        return empty
    import ray as _ray

    ga_ref = _ray.put(grp_a)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        zero = pd.DataFrame(
            {
                "t": pd.Series([], dtype=np.int64),
                "da": pd.Series([], dtype=np.int64),
                "db": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return zero
        ga = _ray.get(ga_ref)
        g = g.sort_values(["u", "ts", "eid"], kind="stable")
        u = g["u"].to_numpy(np.int64)
        ts = g["ts"].to_numpy(np.int64)
        same = u[1:] == u[:-1]
        gaps = (ts[1:] - ts[:-1])[same]
        owner = u[1:][same]
        in_a = np.array([int(x) in ga for x in owner], bool)
        dh_a = pd.Series(gaps[in_a]).groupby(gaps[in_a]).size()
        dh_b = pd.Series(gaps[~in_a]).groupby(gaps[~in_a]).size()
        out = pd.DataFrame(
            {
                "t": np.concatenate(
                    [dh_a.index.to_numpy(np.int64),
                     dh_b.index.to_numpy(np.int64)]
                ),
                "da": np.concatenate(
                    [dh_a.to_numpy(np.int64),
                     np.zeros(len(dh_b), np.int64)]
                ),
                "db": np.concatenate(
                    [np.zeros(len(dh_a), np.int64),
                     dh_b.to_numpy(np.int64)]
                ),
            }
        )
        return out.groupby("t", as_index=False).sum().astype(np.int64)

    tab = (
        raw.groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .groupby("t")[["da", "db"]]
        .sum()
        .sort_index()
    )
    if tab.empty:
        return empty
    da = tab["da"].to_numpy(np.int64)
    db = tab["db"].to_numpy(np.int64)
    tot_a = int(da.sum())
    tot_b = int(db.sum())
    exits = np.cumsum(da + db)
    n_at = (tot_a + tot_b) - np.concatenate([[0], exits[:-1]])
    a_exits = np.cumsum(da)
    na_at = tot_a - np.concatenate([[0], a_exits[:-1]])
    e_a = 0.0
    v = 0.0
    for dai, dbi, ni, nai in zip(da, db, n_at, na_at):
        d = int(dai) + int(dbi)
        n = int(ni)
        if d == 0 or n <= 1:
            continue
        p = float(int(nai)) / float(n)
        e_a = e_a + float(d) * p
        v = v + float(d) * p * (1.0 - p) * float(n - d) / float(n - 1)
    if v <= 0.0:
        return empty
    chi2 = (float(tot_a) - e_a) * (float(tot_a) - e_a) / v
    return pd.DataFrame(
        [
            (
                np.int64(n_a_users), np.int64(n_b_users),
                np.int64(tot_a),
                np.int64(np.floor(e_a * 1_000.0 + 0.5)),
                np.int64(np.floor(chi2 * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES379["events_logrank_activity_split"] = """
WITH per AS (
  SELECT user_id AS u, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS k FROM per),
med AS (
  SELECT min(n) AS m
  FROM (SELECT n, row_number() OVER (ORDER BY n) AS rn FROM per), nn
  WHERE rn >= (nn.k + 1) // 2
),
grp AS (
  SELECT per.u, CASE WHEN per.n > med.m THEN 1 ELSE 0 END AS a
  FROM per, med
),
sizes AS (
  SELECT CAST(sum(a) AS BIGINT) AS na,
         CAST(sum(1 - a) AS BIGINT) AS nb
  FROM grp
),
seq AS (
  SELECT user_id AS u,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
),
deaths AS (
  SELECT CAST(seq.gap AS BIGINT) AS t,
         CAST(sum(grp.a) AS BIGINT) AS da,
         CAST(sum(1 - grp.a) AS BIGINT) AS db
  FROM seq JOIN grp ON grp.u = seq.u
  WHERE seq.gap IS NOT NULL
  GROUP BY 1
),
tots AS (
  SELECT CAST(sum(da) AS BIGINT) AS ta, CAST(sum(db) AS BIGINT) AS tb
  FROM deaths
),
risk AS (
  SELECT t, da, db,
         tots.ta + tots.tb - coalesce(sum(da + db) OVER (
           ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
           AND 1 PRECEDING), 0) AS n_at,
         tots.ta - coalesce(sum(da) OVER (
           ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
           AND 1 PRECEDING), 0) AS na_at
  FROM deaths, tots
),
terms AS (
  SELECT t,
         CAST(da + db AS DOUBLE)
           * (CAST(na_at AS DOUBLE) / n_at) AS e_term,
         CAST(da + db AS DOUBLE)
           * (CAST(na_at AS DOUBLE) / n_at)
           * (1.0 - CAST(na_at AS DOUBLE) / n_at)
           * CAST(n_at - da - db AS DOUBLE) / (n_at - 1) AS v_term
  FROM risk
  WHERE da + db > 0 AND n_at > 1
),
folds AS (
  SELECT list_reduce(list_prepend(0.0, list(e_term ORDER BY t)),
                     (a, b) -> a + b) AS e_a,
         list_reduce(list_prepend(0.0, list(v_term ORDER BY t)),
                     (a, b) -> a + b) AS v
  FROM terms
)
SELECT sizes.na AS n_users_a, sizes.nb AS n_users_b,
       tots.ta AS obs_a,
       CAST(floor(folds.e_a * 1000.0 + 0.5) AS BIGINT) AS exp_a_milli,
       CAST(floor((CAST(tots.ta AS DOUBLE) - folds.e_a)
                  * (CAST(tots.ta AS DOUBLE) - folds.e_a) / folds.v
                  * 1000000.0 + 0.5) AS BIGINT) AS chi2_micro
FROM sizes, tots, folds
WHERE sizes.na > 0 AND sizes.nb > 0 AND folds.v > 0"""


# ---------------------------------------------------------------------------
# customer_balance_quantiles_by_segment — exact quantile bands
# ---------------------------------------------------------------------------


def q_customer_balance_quantiles_by_segment(sf_dir: str):
    """Per market segment the exact ceil-rank P10/P50/P90 of balance
    cents (order statistics off the per-segment histogram). Per
    segment: mktsegment, n, p10_cents, p50_cents, p90_cents."""

    def partial(t: pa.Table) -> pd.DataFrame:
        cents = np.floor(
            t["c_acctbal"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame(
                {"seg": t["c_mktsegment"].to_numpy(zero_copy_only=False),
                 "y": cents}
            )
            .groupby(["seg", "y"])
            .size()
            .rename("c")
            .reset_index()
        )
        g["c"] = g["c"].astype(np.int64)
        return g

    hist = (
        ray.data.read_parquet(
            f"{sf_dir}/customer.parquet",
            columns=["c_mktsegment", "c_acctbal"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["seg", "y"])["c"]
        .sum()
        .reset_index()
    )
    cols = ["mktsegment", "n", "p10_cents", "p50_cents", "p90_cents"]
    empty = pd.DataFrame(
        {
            "mktsegment": pd.Series([], dtype=object),
            **{c: pd.Series([], dtype=np.int64) for c in cols[1:]},
        }
    )
    if hist.empty:
        return empty
    rows = []
    for seg in sorted(hist["seg"].unique()):
        sub = hist[hist["seg"] == seg].sort_values("y")
        y = sub["y"].to_numpy(np.int64)
        c = sub["c"].to_numpy(np.int64)
        n = int(c.sum())
        cum = np.cumsum(c)

        def pick(num: int, den: int) -> int:
            need = (num * n + den - 1) // den
            return int(y[int(np.searchsorted(cum, need, side="left"))])

        rows.append(
            (
                seg, np.int64(n), np.int64(pick(1, 10)),
                np.int64(pick(1, 2)), np.int64(pick(9, 10)),
            )
        )
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols[1:]}
    )


ORACLES379["customer_balance_quantiles_by_segment"] = """
WITH b AS (
  SELECT c_mktsegment AS seg,
         CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS y
  FROM customer
),
h AS (
  SELECT seg, y, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1, 2
),
nn AS (SELECT seg, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1),
cum AS (
  SELECT seg, y, sum(c) OVER (PARTITION BY seg ORDER BY y) AS cc
  FROM h
),
p10 AS (
  SELECT cum.seg, min(cum.y) AS v
  FROM cum JOIN nn USING (seg)
  WHERE cum.cc >= (nn.n + 9) // 10 GROUP BY 1
),
p50 AS (
  SELECT cum.seg, min(cum.y) AS v
  FROM cum JOIN nn USING (seg)
  WHERE cum.cc >= (nn.n + 1) // 2 GROUP BY 1
),
p90 AS (
  SELECT cum.seg, min(cum.y) AS v
  FROM cum JOIN nn USING (seg)
  WHERE cum.cc >= (9 * nn.n + 9) // 10 GROUP BY 1
)
SELECT nn.seg AS mktsegment, nn.n, p10.v AS p10_cents,
       p50.v AS p50_cents, p90.v AS p90_cents
FROM nn
JOIN p10 USING (seg) JOIN p50 USING (seg) JOIN p90 USING (seg)
ORDER BY mktsegment"""


QUERIES379 = {
    "events_logrank_activity_split": q_events_logrank_activity_split,
    "customer_balance_quantiles_by_segment":
        q_customer_balance_quantiles_by_segment,
}
