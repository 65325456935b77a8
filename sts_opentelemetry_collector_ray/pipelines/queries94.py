"""Driver-contract queries, wave 94 — TPC-H Q8 market share (a supplier
nation's revenue share within one customer region for one part type, by
order year: the classic 8-table join re-shaped as broadcast dimensions plus
ONE tagged orderkey-bucket exchange) and SCD type-2 dimension build (collapse
an event change stream into per-user validity intervals — the
slowly-changing-dimension primitive every warehouse load needs). Same
contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES94: dict[str, str] = {}

_Q8_BUCKETS = 64
_Q8_REGION = "ASIA"
_Q8_NATION = "NATION_2"
_Q8_PTYPE = "ECONOMY"
_Q8_LO = "1996-01-01"
_Q8_HI = "1998-01-01"
_SCD2_BUCKETS = 16
# open-interval sentinel for the current SCD2 version (keeps valid_to_us a
# non-null int64 on both sides instead of a NULL that pandas would float-ify)
_SCD2_OPEN = 4_611_686_018_427_387_904  # 2**62


def _us(date_str: str) -> int:
    return int(np.datetime64(date_str, "us").astype(np.int64))


def _sorted_lookup(keys: np.ndarray, vals: np.ndarray):
    """Return a vectorized key→value mapper over a sorted key array."""
    order = np.argsort(keys, kind="mergesort")
    kk, vv = keys[order], vals[order]

    def look(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        idx = np.searchsorted(kk, x)
        idx = np.minimum(idx, len(kk) - 1)
        hit = kk[idx] == x
        return vv[idx], hit

    return look


# ---------------------------------------------------------------------------
# q8_market_share — supplier-nation revenue share by order year
# ---------------------------------------------------------------------------


def q8_market_share(sf_dir: str):
    """TPC-H Q8 (adapted to the fixture schema): among '{PT}'-type parts
    ordered by '{R}'-region customers in [{LO}, {HI}), the share of lineitem
    revenue supplied by nation '{N}' per order year. Revenue is EXACT integer
    micro-dollars (cents × (100−disc%) × 100); share_micro is an exact
    floor-division nation·1e6 // total.

    Scale shape: part/supplier/customer/nation/region are the broadcast
    dimension side (`ray.put` once, searchsorted lookups per batch — no
    per-row dict hashing); lineitem pre-aggregates per (orderkey, is_target)
    inside each batch so only orderkey partials enter the ONE tagged
    orderkey-bucket exchange (the nation_flow_matrix shape); each bucket
    emits bounded (year, total, target) scalars and the driver folds them
    with Python ints (no int64 overflow at any scale).""".format(
        PT=_Q8_PTYPE, R=_Q8_REGION, N=_Q8_NATION, LO=_Q8_LO, HI=_Q8_HI
    )
    import ray
    import pyarrow.parquet as pq_mod

    part = pq_mod.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    )
    pk = part["p_partkey"].to_numpy().astype(np.int64)
    elig = np.sort(pk[np.asarray(part["p_type"].to_numpy(zero_copy_only=False)) == _Q8_PTYPE])

    supp = pq_mod.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    nat = pq_mod.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"]
    )
    reg = pq_mod.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    )
    cust = pq_mod.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    nk = nat["n_nationkey"].to_numpy().astype(np.int64)
    nname = np.asarray(nat["n_name"].to_numpy(zero_copy_only=False))
    nreg = nat["n_regionkey"].to_numpy().astype(np.int64)
    rk = reg["r_regionkey"].to_numpy().astype(np.int64)
    rname = np.asarray(reg["r_name"].to_numpy(zero_copy_only=False))
    region_key = int(rk[rname == _Q8_REGION][0])
    asia_nations = np.sort(nk[nreg == region_key])
    target_nk = int(nk[nname == _Q8_NATION][0])

    # target-nation supplier keys (sorted membership array)
    sk = supp["s_suppkey"].to_numpy().astype(np.int64)
    snk = supp["s_nationkey"].to_numpy().astype(np.int64)
    target_supp = np.sort(sk[snk == target_nk])
    # region-qualified customer keys
    ck = cust["c_custkey"].to_numpy().astype(np.int64)
    cnk = cust["c_nationkey"].to_numpy().astype(np.int64)
    region_cust = np.sort(ck[np.isin(cnk, asia_nations)])
    dims_ref = ray.put((elig, target_supp, region_cust))
    lo_us, hi_us = _us(_Q8_LO), _us(_Q8_HI)

    def li_rows(t: pa.Table) -> pd.DataFrame:
        elig_, target_supp_, _ = ray.get(dims_ref)
        k = t["l_orderkey"].to_numpy().astype(np.int64)
        p = t["l_partkey"].to_numpy().astype(np.int64)
        s = t["l_suppkey"].to_numpy().astype(np.int64)
        m = elig_[np.minimum(np.searchsorted(elig_, p), len(elig_) - 1)] == p
        if len(elig_) == 0:
            m = np.zeros(len(p), bool)
        cents = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        dpct = np.floor(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        rev = cents * (100 - dpct) * 100
        k, s, rev = k[m], s[m], rev[m]
        is_t = np.zeros(len(s), bool)
        if len(target_supp_):
            is_t = (
                target_supp_[
                    np.minimum(np.searchsorted(target_supp_, s), len(target_supp_) - 1)
                ]
                == s
            )
        df = (
            pd.DataFrame({"k": k, "total": rev, "target": np.where(is_t, rev, 0)})
            .groupby("k", sort=False)
            .sum()
            .reset_index()
        )
        df["yr"] = np.int64(-1)
        df["_b"] = (df["k"] % _Q8_BUCKETS).astype(np.int64)
        return df[["k", "yr", "total", "target", "_b"]]

    def o_rows(t: pa.Table) -> pd.DataFrame:
        _, _, region_cust_ = ray.get(dims_ref)
        d = t["o_orderdate"].cast(pa.int64()).to_numpy()
        k = t["o_orderkey"].to_numpy().astype(np.int64)
        c = t["o_custkey"].to_numpy().astype(np.int64)
        m = (d >= lo_us) & (d < hi_us)
        if len(region_cust_):
            m &= (
                region_cust_[
                    np.minimum(np.searchsorted(region_cust_, c), len(region_cust_) - 1)
                ]
                == c
            )
        else:
            m[:] = False
        k, d = k[m], d[m]
        yr = d.astype("datetime64[us]").astype("datetime64[Y]").astype(np.int64) + 1970
        return pd.DataFrame(
            {
                "k": k,
                "yr": yr,
                "total": np.zeros(len(k), np.int64),
                "target": np.zeros(len(k), np.int64),
                "_b": (k % _Q8_BUCKETS).astype(np.int64),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        is_o = (g["yr"] >= 0).to_numpy()
        o = g.loc[is_o, ["k", "yr"]]
        li = g.loc[~is_o, ["k", "total", "target"]]
        m = li.merge(o, on="k")
        if m.empty:
            return pd.DataFrame(
                {
                    "yr": pd.Series([], dtype=np.int64),
                    "total": pd.Series([], dtype=np.int64),
                    "target": pd.Series([], dtype=np.int64),
                }
            )
        h = m.groupby("yr", sort=False)[["total", "target"]].sum().reset_index()
        return h

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            "l_extendedprice",
            "l_discount",
        ],
    ).map_batches(li_rows, batch_format="pyarrow")
    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(o_rows, batch_format="pyarrow")
    part_df = (
        li.union(o).groupby("_b").map_groups(merge, batch_format="pandas").to_pandas()
    )  # bounded: |years| rows per bucket
    rows = []
    for yr, grp in sorted(part_df.groupby("yr")):
        total = int(sum(int(v) for v in grp["total"]))
        target = int(sum(int(v) for v in grp["target"]))
        rows.append(
            {
                "year": int(yr),
                "total_micro": total,
                "nation_micro": target,
                "share_micro": target * 1_000_000 // max(total, 1),
            }
        )
    out = pd.DataFrame(rows, columns=["year", "total_micro", "nation_micro", "share_micro"])
    return out.astype(np.int64)


ORACLES94["q8_market_share"] = f"""
WITH rev AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
           * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) * 100 AS r,
         (sn.n_name = '{_Q8_NATION}') AS is_t
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation cn ON cn.n_nationkey = c_nationkey
  JOIN region ON r_regionkey = cn.n_regionkey
  JOIN nation sn ON sn.n_nationkey = s_nationkey
  WHERE p_type = '{_Q8_PTYPE}' AND r_name = '{_Q8_REGION}'
    AND o_orderdate >= TIMESTAMP '{_Q8_LO}'
    AND o_orderdate < TIMESTAMP '{_Q8_HI}'
)
SELECT yr AS year,
       CAST(sum(r) AS BIGINT) AS total_micro,
       CAST(coalesce(sum(r) FILTER (is_t), 0) AS BIGINT) AS nation_micro,
       CAST(coalesce(sum(r) FILTER (is_t), 0) * 1000000
            // greatest(sum(r), 1) AS BIGINT) AS share_micro
FROM rev GROUP BY 1 ORDER BY 1"""


# ---------------------------------------------------------------------------
# events_scd2 — slowly-changing-dimension type-2 validity intervals
# ---------------------------------------------------------------------------


def q_events_scd2(sf_dir: str):
    """SCD type-2 build: treat each user's event stream (ordered by ts then
    event_id) as status observations (status = event_type); collapse
    consecutive repeats and emit one row per status RUN with
    [valid_from_us, valid_to_us) validity, a 1-based per-user version, and
    is_current on the open interval (valid_to = 2^62 sentinel instead of
    NULL so the column stays int64 on both sides).

    Scale shape: ONE user-bucket exchange (rows must co-locate per user for
    run detection — the sessionize shape); per-bucket kernel is a single
    lexsort + vectorized run-start masks + per-user arange versions; no
    per-row Python anywhere."""

    def partial(t: pa.Table) -> pd.DataFrame:
        u = t["user_id"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "u": u,
                "ts": t["ts"].cast(pa.int64()).to_numpy(),
                "eid": t["event_id"].to_numpy().astype(np.int64),
                "st": np.asarray(t["event_type"].to_numpy(zero_copy_only=False)),
                "_b": (u % _SCD2_BUCKETS).astype(np.int64),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(np.int64)
        ts = g["ts"].to_numpy(np.int64)
        eid = g["eid"].to_numpy(np.int64)
        st = g["st"].to_numpy(object)
        order = np.lexsort((eid, ts, u))
        u, ts, st = u[order], ts[order], st[order]
        newu = np.empty(len(u), bool)
        newu[0] = True
        newu[1:] = u[1:] != u[:-1]
        change = newu.copy()
        change[1:] |= st[1:] != st[:-1]
        idx = np.flatnonzero(change)
        users, vfrom, statuses = u[idx], ts[idx], st[idx]
        nxt_user = np.append(users[1:], np.int64(-1))
        nxt_from = np.append(vfrom[1:], np.int64(_SCD2_OPEN))
        vto = np.where(nxt_user == users, nxt_from, np.int64(_SCD2_OPEN))
        first = np.flatnonzero(np.r_[True, users[1:] != users[:-1]])
        starts = np.repeat(first, np.diff(np.r_[first, len(users)]))
        version = np.arange(len(users), dtype=np.int64) - starts + 1
        return pd.DataFrame(
            {
                "user_id": users,
                "version": version,
                "status": statuses,
                "valid_from_us": vfrom,
                "valid_to_us": vto,
                "is_current": (vto == _SCD2_OPEN).astype(np.int64),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "ts", "user_id", "event_type"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
    )


ORACLES94["events_scd2"] = f"""
WITH e AS (
  SELECT user_id, event_type AS status, epoch_us(ts) AS ts_us, event_id
  FROM events
),
ordered AS (
  SELECT *, lag(status) OVER w AS prev
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
changes AS (
  SELECT user_id, status, ts_us, event_id
  FROM ordered WHERE prev IS NULL OR prev <> status
),
v AS (
  SELECT user_id, status, ts_us AS valid_from_us,
         coalesce(lead(ts_us) OVER w, {_SCD2_OPEN}) AS valid_to_us,
         row_number() OVER w AS version
  FROM changes WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
)
SELECT user_id, CAST(version AS BIGINT) AS version, status,
       valid_from_us, CAST(valid_to_us AS BIGINT) AS valid_to_us,
       CAST(CASE WHEN valid_to_us = {_SCD2_OPEN} THEN 1 ELSE 0 END AS BIGINT)
         AS is_current
FROM v"""


QUERIES94 = {
    "q8_market_share": q8_market_share,
    "events_scd2": q_events_scd2,
}
