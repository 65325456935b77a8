"""Driver-contract queries, wave 200 — theta-sketch set operations (KMV
k-minimum-values sketches per event type; union/intersection estimates vs
exact, Dasgupta et al. 2016) and an approximate-query-processing audit (1%
deterministic hash sample answering a SUM with CLT error bounds).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES200: dict[str, str] = {}

_TH_K = 128
_TH_BUCKETS = 64
_P1 = 0x9E3779B97F4A7C15
_P2 = 0xBF58476D1CE4E5B9
_TWO64 = 18446744073709551616


def _mix64(uid: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        h = (uid.astype(np.uint64) ^ np.uint64(_P2)) * np.uint64(_P1)
        return h ^ (h >> np.uint64(33))


def _mix64_sql(col: str) -> str:
    bh, bl = _P1 >> 32, _P1 & 0xFFFFFFFF
    u = f"xor(CAST({col} AS HUGEINT), CAST({_P2} AS HUGEINT))"
    h = (
        f"((({u} * {bl}) % {_TWO64}"
        f" + (({u} * {bh}) % 4294967296) * 4294967296) % {_TWO64})"
    )
    return f"xor({h}, {h} // 8589934592)"


# ---------------------------------------------------------------------------
# events_theta_setops — sketch union/intersection estimates vs exact
# ---------------------------------------------------------------------------


def q_events_theta_setops(sf_dir: str):
    """For every event-type pair (ta < tb) over their user sets: exact
    |A∪B| and |A∩B|, and the theta-sketch estimates from k = 128 KMV
    sketches — θ = min((k+1)-th smallest hash of A, of B) (2⁶⁴ when a side
    has ≤ k users, making the sketch exact), R = sketch hashes < θ,
    est = ⌊|R| · 2⁶⁴/θ⌋. Output: ta, tb, exact_union, est_union,
    exact_inter, est_inter.

    Scale shape: ONE user-bucket exchange makes per-(type,user) distinct
    global; each bucket emits per-type (k+1)-smallest hash candidates,
    per-type counts and pair intersection counts (|types|² bounded);
    driver folds buckets × bounded rows."""
    path = f"{sf_dir}/events.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["event_type", "user_id"]).to_pandas().drop_duplicates()
        df["_b"] = (df["user_id"].to_numpy(np.int64) % _TH_BUCKETS).astype(np.int32)
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["event_type", "user_id"])
        hv = _mix64(d["user_id"].to_numpy(np.int64))
        d = d.assign(hv=hv)
        outs = []
        # k+1 smallest hashes per type (kind='k'); per-type count (kind='c')
        for et, sub in d.groupby("event_type", sort=False):
            h = np.sort(sub["hv"].to_numpy(np.uint64))
            outs.append(
                pd.DataFrame(
                    {"ta": et, "tb": "", "kind": "k",
                     "hv": h[: _TH_K + 1],
                     "n": np.zeros(min(len(h), _TH_K + 1), np.int64)}
                )
            )
            outs.append(
                pd.DataFrame(
                    {"ta": [et], "tb": [""], "kind": ["c"],
                     "hv": [np.uint64(0)], "n": [np.int64(len(h))]}
                )
            )
        # pair intersections within bucket (user sets are bucket-complete)
        sets = d.groupby("event_type")["user_id"].agg(set)
        types = sorted(sets.index)
        for i, ta in enumerate(types):
            for tb in types[i + 1 :]:
                outs.append(
                    pd.DataFrame(
                        {"ta": [ta], "tb": [tb], "kind": ["i"],
                         "hv": [np.uint64(0)],
                         "n": [np.int64(len(sets[ta] & sets[tb]))]}
                    )
                )
        return pd.concat(outs, ignore_index=True).astype(
            {"hv": np.uint64, "n": np.int64}
        )

    part = (
        ray.data.read_parquet(path, columns=["event_type", "user_id"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    cols = ["ta", "tb", "exact_union", "est_union", "exact_inter", "est_inter"]
    if part.empty:
        return pd.DataFrame(
            {c: pd.Series([], dtype=(object if c in ("ta", "tb") else np.int64))
             for c in cols}
        )
    counts = part[part["kind"] == "c"].groupby("ta")["n"].sum()
    inters = part[part["kind"] == "i"].groupby(["ta", "tb"])["n"].sum()
    kmins = {
        et: np.sort(sub["hv"].to_numpy(np.uint64))[: _TH_K + 1]
        for et, sub in part[part["kind"] == "k"].groupby("ta")
    }
    types = sorted(counts.index)
    rows = []
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            na, nb = int(counts[ta]), int(counts[tb])
            ninter = int(inters.get((ta, tb), 0))
            nunion = na + nb - ninter
            ha, hb = kmins[ta], kmins[tb]
            tha = float(ha[_TH_K]) if len(ha) > _TH_K else float(_TWO64)
            thb = float(hb[_TH_K]) if len(hb) > _TH_K else float(_TWO64)
            theta = min(tha, thb)
            sa = ha[: _TH_K][ha[: _TH_K].astype(np.float64) < theta]
            sb = hb[: _TH_K][hb[: _TH_K].astype(np.float64) < theta]
            r_union = np.union1d(sa, sb)
            r_inter = np.intersect1d(sa, sb)
            scale = float(_TWO64) / theta
            rows.append(
                (
                    ta, tb,
                    np.int64(nunion),
                    np.int64(np.floor(len(r_union) * scale)),
                    np.int64(ninter),
                    np.int64(np.floor(len(r_inter) * scale)),
                )
            )
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols[2:]}
    )


ORACLES200["events_theta_setops"] = f"""
WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
h AS (SELECT event_type, user_id, {_mix64_sql('user_id')} AS hv FROM d),
r AS (
  SELECT event_type, hv,
         row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rk
  FROM h
),
th AS (
  SELECT event_type,
         coalesce(max(CASE WHEN rk = {_TH_K + 1} THEN CAST(hv AS DOUBLE) END),
                  {_TWO64}.0) AS theta
  FROM r GROUP BY 1
),
sk AS (SELECT event_type, hv FROM r WHERE rk <= {_TH_K}),
cnt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
prs AS (
  SELECT a.event_type AS ta, b.event_type AS tb,
         least(tha.theta, thb.theta) AS theta
  FROM cnt a JOIN cnt b ON a.event_type < b.event_type
  JOIN th tha ON tha.event_type = a.event_type
  JOIN th thb ON thb.event_type = b.event_type
),
ru AS (
  SELECT prs.ta, prs.tb, CAST(count(DISTINCT sk.hv) AS BIGINT) AS nr
  FROM prs JOIN sk ON (sk.event_type = prs.ta OR sk.event_type = prs.tb)
                  AND CAST(sk.hv AS DOUBLE) < prs.theta
  GROUP BY 1, 2
),
ri AS (
  SELECT prs.ta, prs.tb, CAST(count(*) AS BIGINT) AS nr
  FROM prs JOIN (
    SELECT x.hv, x.event_type AS ta, y.event_type AS tb
    FROM sk x JOIN sk y ON x.hv = y.hv AND x.event_type < y.event_type
  ) b ON b.ta = prs.ta AND b.tb = prs.tb
       AND CAST(b.hv AS DOUBLE) < prs.theta
  GROUP BY 1, 2
),
xi AS (
  SELECT a.event_type AS ta, b.event_type AS tb,
         CAST(count(*) AS BIGINT) AS ninter
  FROM d a JOIN d b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT prs.ta, prs.tb,
       ca.n + cb.n - coalesce(xi.ninter, 0) AS exact_union,
       CAST(floor(coalesce(ru.nr, 0) * ({_TWO64}.0 / prs.theta)) AS BIGINT)
         AS est_union,
       coalesce(xi.ninter, 0) AS exact_inter,
       CAST(floor(coalesce(ri.nr, 0) * ({_TWO64}.0 / prs.theta)) AS BIGINT)
         AS est_inter
FROM prs
JOIN cnt ca ON ca.event_type = prs.ta
JOIN cnt cb ON cb.event_type = prs.tb
LEFT JOIN xi ON xi.ta = prs.ta AND xi.tb = prs.tb
LEFT JOIN ru ON ru.ta = prs.ta AND ru.tb = prs.tb
LEFT JOIN ri ON ri.ta = prs.ta AND ri.tb = prs.tb
ORDER BY prs.ta, prs.tb"""


# ---------------------------------------------------------------------------
# lineitem_aqp_audit — 1% hash-sample SUM with CLT bounds vs exact
# ---------------------------------------------------------------------------


def q_lineitem_aqp_audit(sf_dir: str):
    """AQP audit per return flag: exact revenue Σ price·(1−disc) vs the
    expansion estimate from the deterministic 1% sample mix64(orderkey) %
    100 = 0 (est = 100·Σ_sample), with the CLT 95% half-width 1.96·100·
    √(n_s·var_s) and whether the exact value is covered. Output:
    l_returnflag, n_pop, n_sample, exact_sum, est_sum, err_micro,
    halfwidth, covered.

    Scale shape: one per-batch combiner carrying (flag, n, Σy) population
    sums and (n_s, Σy_s, Σy²_s) sample sums; driver folds |flags|×blocks
    rows — no shuffle."""
    path = f"{sf_dir}/lineitem.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(
            ["l_returnflag", "l_orderkey", "l_extendedprice", "l_discount"]
        ).to_pandas()
        y = df["l_extendedprice"].to_numpy(np.float64) * (
            1.0 - df["l_discount"].to_numpy(np.float64)
        )
        samp = (
            _mix64(df["l_orderkey"].to_numpy(np.int64)) % np.uint64(100)
            == np.uint64(0)
        )
        df2 = pd.DataFrame(
            {
                "l_returnflag": df["l_returnflag"].to_numpy(object),
                "n": 1,
                "sy": y,
                "ns": samp.astype(np.int64),
                "sys": np.where(samp, y, 0.0),
                "sys2": np.where(samp, y * y, 0.0),
            }
        )
        return df2.groupby("l_returnflag", sort=False, as_index=False).sum().astype(
            {"n": np.int64, "ns": np.int64}
        )

    part = (
        ray.data.read_parquet(
            path,
            columns=["l_returnflag", "l_orderkey", "l_extendedprice", "l_discount"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = [
        "l_returnflag", "n_pop", "n_sample", "exact_sum", "est_sum",
        "err_micro", "halfwidth", "covered",
    ]
    if part.empty:
        return pd.DataFrame(
            {c: pd.Series([], dtype=(object if c == "l_returnflag" else np.int64))
             for c in cols}
        )
    g = part.groupby("l_returnflag").sum().sort_index()
    rows = []
    for et, row in g.iterrows():
        ns = int(row["ns"])
        if ns < 2:
            continue
        exact = float(row["sy"])
        est = 100.0 * row["sys"]
        ms = row["sys"] / ns
        var_s = row["sys2"] / ns - ms * ms
        hw = 1.96 * 100.0 * np.sqrt(ns * var_s)
        rows.append(
            (
                et, np.int64(row["n"]), np.int64(ns),
                np.int64(np.floor(exact + 0.5)),
                np.int64(np.floor(est + 0.5)),
                np.int64(
                    np.floor(abs(est - exact) / exact * 1_000_000.0 + 0.5)
                ),
                np.int64(np.floor(hw + 0.5)),
                np.int64(1 if abs(est - exact) <= hw else 0),
            )
        )
    return pd.DataFrame(rows, columns=cols).astype({c: np.int64 for c in cols[1:]})


ORACLES200["lineitem_aqp_audit"] = f"""
WITH base AS (
  SELECT l_returnflag,
         l_extendedprice * (1.0 - l_discount) AS y,
         CASE WHEN {_mix64_sql('l_orderkey')} % 100 = 0 THEN 1 ELSE 0 END AS s
  FROM lineitem
),
g AS (
  SELECT l_returnflag,
         CAST(count(*) AS BIGINT) AS n,
         sum(y) AS sy,
         CAST(sum(s) AS BIGINT) AS ns,
         sum(CASE WHEN s = 1 THEN y ELSE 0.0 END) AS sys,
         sum(CASE WHEN s = 1 THEN y * y ELSE 0.0 END) AS sys2
  FROM base GROUP BY 1 HAVING sum(s) >= 2
)
SELECT l_returnflag, n AS n_pop, ns AS n_sample,
       CAST(floor(sy + 0.5) AS BIGINT) AS exact_sum,
       CAST(floor(100.0 * sys + 0.5) AS BIGINT) AS est_sum,
       CAST(floor(abs(100.0 * sys - sy) / sy * 1000000.0 + 0.5) AS BIGINT)
         AS err_micro,
       CAST(floor(1.96 * 100.0
                  * sqrt(ns * (sys2 / ns - (sys / ns) * (sys / ns))) + 0.5)
            AS BIGINT) AS halfwidth,
       CAST(CASE WHEN abs(100.0 * sys - sy)
                      <= 1.96 * 100.0
                         * sqrt(ns * (sys2 / ns - (sys / ns) * (sys / ns)))
                 THEN 1 ELSE 0 END AS BIGINT) AS covered
FROM g ORDER BY l_returnflag"""


QUERIES200 = {
    "events_theta_setops": q_events_theta_setops,
    "lineitem_aqp_audit": q_lineitem_aqp_audit,
}
