"""Driver-contract queries, wave 275 — Theil-T inequality decomposition
of per-customer order spend into between-nation and within-nation parts,
and weighted reciprocity of the DIRECTED nation trade graph (exact
integer min-flow matching). Same contract as queries.py: column names
AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES275: dict[str, str] = {}

_TH_BUCKETS = 64


# ---------------------------------------------------------------------------
# customer_theil_decomposition — between/within nation inequality
# ---------------------------------------------------------------------------


def q_customer_theil_decomposition(sf_dir: str):
    """Theil-T decomposition of per-customer order spend (cents) grouped
    by nation: T_g = (sum y ln y)/S_g - ln(S_g/N_g) per nation,
    T_between = sum_g (S_g/S) ln(mu_g/mu), T_within = sum_g (S_g/S) T_g,
    T_total = T_between + T_within (exact identity). Counts and cent
    sums are EXACT integers; only the logs are float. Per nation:
    nation, n_cust, sum_cents, t_g_micro, t_between_micro,
    t_within_micro, t_total_micro (last three repeated).

    Scale shape: per-customer spend reduces via ONE custkey-bucket
    exchange (the `customer_rfm` idiom) with the custkey->nation map
    broadcast via ray.put; each bucket emits |nations| scalar partials
    (N_g, S_g, sum y ln y)."""
    import ray
    import pyarrow.parquet as pq_mod

    cust = pq_mod.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    nat = pq_mod.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    c2n = dict(zip(cust["c_custkey"].to_pylist(), cust["c_nationkey"].to_pylist()))
    dims_ref = ray.put(c2n)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(
            df["o_totalprice"].to_numpy(np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame(
                {"k": df["o_custkey"].to_numpy(np.int64), "s": cents}
            )
            .groupby("k", sort=False)["s"]
            .sum()
            .reset_index()
        )
        g["s"] = g["s"].astype(np.int64)
        g["_b"] = (g["k"].to_numpy(np.int64) % _TH_BUCKETS).astype(np.int64)
        return g

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        c2n_ = ray.get(dims_ref)
        per = g.groupby("k", sort=False)["s"].sum()
        y = per.to_numpy(np.int64)
        keep = y > 0
        y = y[keep]
        nk = per.index.to_numpy(np.int64)[keep]
        nation = pd.Series(nk).map(c2n_).to_numpy(np.int64)
        yl = y.astype(np.float64) * np.log(y.astype(np.float64))
        out = (
            pd.DataFrame({"nk": nation, "n": 1, "s": y, "ylny": yl})
            .groupby("nk", sort=False, as_index=False)
            .sum()
        )
        return out.astype({"n": np.int64, "s": np.int64})

    parts = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
        )
        .map_batches(partial, batch_format="pandas")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: |nations| x buckets
        .groupby("nk")[["n", "s", "ylny"]]
        .sum()
    )
    cols = [
        "nation", "n_cust", "sum_cents", "t_g_micro",
        "t_between_micro", "t_within_micro", "t_total_micro",
    ]
    empty = pd.DataFrame(
        {
            "nation": pd.Series([], dtype=object),
            **{c: pd.Series([], dtype=np.int64) for c in cols[1:]},
        }
    )
    if parts.empty:
        return empty
    names = dict(zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist()))
    ng = parts["n"].to_numpy(np.int64)
    sg = parts["s"].to_numpy(np.int64)
    yl = parts["ylny"].to_numpy(np.float64)
    N, S = int(ng.sum()), int(sg.sum())
    mu = float(S) / float(N)
    mug = sg.astype(np.float64) / ng.astype(np.float64)
    tg = yl / sg.astype(np.float64) - np.log(mug)
    share = sg.astype(np.float64) / float(S)
    t_between = float((share * np.log(mug / mu)).sum())
    t_within = float((share * tg).sum())
    t_total = t_between + t_within

    def micro(v) -> np.int64:
        return np.int64(np.floor(v * 1_000_000.0 + 0.5))

    out = pd.DataFrame(
        {
            "nation": [names[int(k)] for k in parts.index],
            "n_cust": ng,
            "sum_cents": sg,
            "t_g_micro": np.floor(tg * 1_000_000.0 + 0.5).astype(np.int64),
            "t_between_micro": micro(t_between),
            "t_within_micro": micro(t_within),
            "t_total_micro": micro(t_total),
        }
    )
    return out.sort_values("nation").reset_index(drop=True)[cols].astype(
        {c: np.int64 for c in cols[1:]}
    )


ORACLES275["customer_theil_decomposition"] = """
WITH spend AS (
  SELECT o.o_custkey AS k, c.c_nationkey AS nk,
         CAST(sum(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS y
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
),
pos AS (SELECT * FROM spend WHERE y > 0),
grp AS (
  SELECT nk, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS s,
         sum(CAST(y AS DOUBLE) * ln(CAST(y AS DOUBLE))) AS ylny
  FROM pos GROUP BY 1
),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(s) AS BIGINT) AS ss
  FROM grp
),
per AS (
  SELECT g.nk, g.n, g.s,
         g.ylny / CAST(g.s AS DOUBLE)
           - ln(CAST(g.s AS DOUBLE) / CAST(g.n AS DOUBLE)) AS tg,
         CAST(g.s AS DOUBLE) / CAST(tot.ss AS DOUBLE) AS share,
         ln((CAST(g.s AS DOUBLE) / CAST(g.n AS DOUBLE))
            / (CAST(tot.ss AS DOUBLE) / CAST(tot.nn AS DOUBLE))) AS lnr
  FROM grp g, tot
),
dec AS (
  SELECT sum(share * lnr) AS t_between, sum(share * tg) AS t_within
  FROM per
)
SELECT n.n_name AS nation, per.n AS n_cust, per.s AS sum_cents,
       CAST(floor(per.tg * 1000000.0 + 0.5) AS BIGINT) AS t_g_micro,
       CAST(floor(dec.t_between * 1000000.0 + 0.5) AS BIGINT)
         AS t_between_micro,
       CAST(floor(dec.t_within * 1000000.0 + 0.5) AS BIGINT)
         AS t_within_micro,
       CAST(floor((dec.t_between + dec.t_within) * 1000000.0 + 0.5)
            AS BIGINT) AS t_total_micro
FROM per JOIN nation n ON n.n_nationkey = per.nk, dec
ORDER BY nation"""


# ---------------------------------------------------------------------------
# nation_trade_reciprocity — weighted directed reciprocity
# ---------------------------------------------------------------------------


def q_nation_trade_reciprocity(sf_dir: str):
    """Weighted reciprocity of the directed nation trade graph
    (w(s->c) = lineitems shipped from supplier-nation s to
    customer-nation c, s != c): per unordered pair the reciprocated flow
    is min(w_ab, w_ba); globally r = sum min / sum w — all EXACT
    integers, one division. Per pair: nation_a, nation_b, w_ab, w_ba,
    w_min, recip_micro (repeated).

    Scale shape: the tagged orderkey-bucket exchange of
    `nation_harmonic_centrality`, but folding COUNTS per (s,c) pair;
    the driver sees |nations|^2 scalars per bucket."""
    import ray
    import pyarrow.parquet as pq_mod

    cust = pq_mod.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    supp = pq_mod.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    nat = pq_mod.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    c2n = dict(zip(cust["c_custkey"].to_pylist(), cust["c_nationkey"].to_pylist()))
    s2n = dict(zip(supp["s_suppkey"].to_pylist(), supp["s_nationkey"].to_pylist()))
    dims_ref = ray.put((c2n, s2n))

    def li_rows(t: pa.Table) -> pd.DataFrame:
        k = t["l_orderkey"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "k": k,
                "supp": t["l_suppkey"].to_numpy().astype(np.int64),
                "cust": np.int64(-1),
                "_b": (k % _TH_BUCKETS).astype(np.int64),
            }
        )

    def o_rows(t: pa.Table) -> pd.DataFrame:
        k = t["o_orderkey"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "k": k,
                "supp": np.int64(-1),
                "cust": t["o_custkey"].to_numpy().astype(np.int64),
                "_b": (k % _TH_BUCKETS).astype(np.int64),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        c2n_, s2n_ = ray.get(dims_ref)
        is_o = (g["cust"] >= 0).to_numpy()
        o = g.loc[is_o, ["k", "cust"]]
        li = g.loc[~is_o, ["k", "supp"]]
        m = li.merge(o, on="k")
        s = m["supp"].map(s2n_).to_numpy(np.int64)
        c = m["cust"].map(c2n_).to_numpy(np.int64)
        keep = s != c
        out = (
            pd.DataFrame({"s": s[keep], "c": c[keep]})
            .groupby(["s", "c"], sort=False)
            .size()
            .rename("w")
            .reset_index()
        )
        out["w"] = out["w"].astype(np.int64)
        return out

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    ).map_batches(li_rows, batch_format="pyarrow")
    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(o_rows, batch_format="pyarrow")
    w = (
        li.union(o)
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .groupby(["s", "c"])["w"]
        .sum()
    )
    cols = [
        "nation_a", "nation_b", "w_ab", "w_ba", "w_min", "recip_micro",
    ]
    empty = pd.DataFrame(
        {
            **{c: pd.Series([], dtype=object) for c in cols[:2]},
            **{c: pd.Series([], dtype=np.int64) for c in cols[2:]},
        }
    )
    if w.empty:
        return empty
    names = dict(zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist()))
    keys = sorted({k for pair in w.index for k in pair})
    total = int(w.sum())
    min_sum = 0
    rows = []
    for i, a in enumerate(keys):
        for b in keys[i + 1:]:
            wab = int(w.get((a, b), 0))
            wba = int(w.get((b, a), 0))
            if wab + wba == 0:
                continue
            mn = min(wab, wba)
            min_sum += 2 * mn
            rows.append((names[a], names[b], wab, wba, mn))
    recip = float(min_sum) / float(total)
    rm = np.int64(np.floor(recip * 1_000_000.0 + 0.5))
    out = pd.DataFrame(
        [(a, b, np.int64(x), np.int64(y), np.int64(mn), rm)
         for a, b, x, y, mn in rows],
        columns=cols,
    ).astype({c: np.int64 for c in cols[2:]})
    return out.sort_values(["nation_a", "nation_b"]).reset_index(drop=True)


ORACLES275["nation_trade_reciprocity"] = """
WITH w AS (
  SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
         CAST(count(*) AS BIGINT) AS w
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE c.c_nationkey <> s.s_nationkey
  GROUP BY 1, 2
),
keys AS (SELECT DISTINCT src AS k FROM w UNION SELECT DISTINCT dst FROM w),
pairs AS (
  SELECT a.k AS ka, b.k AS kb FROM keys a JOIN keys b ON a.k < b.k
),
cells AS (
  SELECT p.ka, p.kb,
         CAST(coalesce(ab.w, 0) AS BIGINT) AS w_ab,
         CAST(coalesce(ba.w, 0) AS BIGINT) AS w_ba
  FROM pairs p
  LEFT JOIN w ab ON ab.src = p.ka AND ab.dst = p.kb
  LEFT JOIN w ba ON ba.src = p.kb AND ba.dst = p.ka
),
nz AS (SELECT * FROM cells WHERE w_ab + w_ba > 0),
tot AS (
  SELECT CAST(sum(w) AS BIGINT) AS total FROM w
),
ms AS (
  SELECT CAST(sum(2 * least(w_ab, w_ba)) AS BIGINT) AS min_sum FROM nz
)
SELECT na.n_name AS nation_a, nb.n_name AS nation_b,
       nz.w_ab, nz.w_ba, least(nz.w_ab, nz.w_ba) AS w_min,
       CAST(floor(CAST(ms.min_sum AS DOUBLE) / CAST(tot.total AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS recip_micro
FROM nz
JOIN nation na ON na.n_nationkey = nz.ka
JOIN nation nb ON nb.n_nationkey = nz.kb, tot, ms
ORDER BY nation_a, nation_b"""


QUERIES275 = {
    "customer_theil_decomposition": q_customer_theil_decomposition,
    "nation_trade_reciprocity": q_nation_trade_reciprocity,
}
