"""Driver-contract queries, wave 323 — cyclic trade-triangle flow (the
circular component of the directed nation trade graph) and brand
cannibalization (the distribution of pairwise correlations between
brand monthly volumes). Same contract as queries.py: column names AND
dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES323: dict[str, str] = {}


# ---------------------------------------------------------------------------
# nation_trade_triangles — circular flow on directed triads
# ---------------------------------------------------------------------------


def q_nation_trade_triangles(sf_dir: str):
    """Cyclic flow: for each ordered nation triad a < b < c, the
    directed cycle a->b->c->a carries min(w_ab, w_bc, w_ca) units and
    the reverse cycle min(w_ac, w_cb, w_ba); the triangle's cyclic flow
    is their sum. Pure integer counting on the bounded flow matrix.
    One row: n_triads, n_cyclic (flow > 0), total_cyclic_flow,
    max_cyclic_flow.

    Scale shape: the `nation_trade_reciprocity` tagged count exchange;
    the |nations|^3 scan runs on the bounded driver matrix."""
    import ray as _ray
    import pyarrow.parquet as pq_mod

    cust = pq_mod.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    supp = pq_mod.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    c2n = dict(zip(cust["c_custkey"].to_pylist(), cust["c_nationkey"].to_pylist()))
    s2n = dict(zip(supp["s_suppkey"].to_pylist(), supp["s_nationkey"].to_pylist()))
    dims_ref = _ray.put((c2n, s2n))

    def li_rows(t: pa.Table) -> pd.DataFrame:
        k = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pd.DataFrame(
            {
                "k": k,
                "supp": t["l_suppkey"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
                "cust": np.int64(-1),
                "_b": (k % 64).astype(np.int64),
            }
        )

    def o_rows(t: pa.Table) -> pd.DataFrame:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pd.DataFrame(
            {
                "k": k,
                "supp": np.int64(-1),
                "cust": t["o_custkey"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
                "_b": (k % 64).astype(np.int64),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        c2n_, s2n_ = _ray.get(dims_ref)
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
    cols = ["n_triads", "n_cyclic", "total_cyclic_flow", "max_cyclic_flow"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if w.empty:
        return empty
    nodes = sorted({k for pair in w.index for k in pair})

    def wv(a: int, b: int) -> int:
        return int(w.get((a, b), 0))

    n_triads = 0
    n_cyc = 0
    total = 0
    mx = 0
    for i, a in enumerate(nodes):
        for j in range(i + 1, len(nodes)):
            b = nodes[j]
            for k in range(j + 1, len(nodes)):
                c = nodes[k]
                n_triads += 1
                fwd = min(wv(a, b), wv(b, c), wv(c, a))
                rev = min(wv(a, c), wv(c, b), wv(b, a))
                f = fwd + rev
                if f > 0:
                    n_cyc += 1
                    total += f
                    mx = max(mx, f)
    return pd.DataFrame(
        [
            (
                np.int64(n_triads), np.int64(n_cyc), np.int64(total),
                np.int64(mx),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES323["nation_trade_triangles"] = """
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
nodes AS (SELECT DISTINCT src AS v FROM w UNION SELECT DISTINCT dst FROM w),
tri AS (
  SELECT a.v AS a, b.v AS b, c.v AS c
  FROM nodes a JOIN nodes b ON a.v < b.v JOIN nodes c ON b.v < c.v
),
fl AS (
  SELECT tri.a, tri.b, tri.c,
         least(coalesce(ab.w, 0), coalesce(bc.w, 0), coalesce(ca.w, 0))
           + least(coalesce(ac.w, 0), coalesce(cb.w, 0),
                   coalesce(ba.w, 0)) AS f
  FROM tri
  LEFT JOIN w ab ON ab.src = tri.a AND ab.dst = tri.b
  LEFT JOIN w bc ON bc.src = tri.b AND bc.dst = tri.c
  LEFT JOIN w ca ON ca.src = tri.c AND ca.dst = tri.a
  LEFT JOIN w ac ON ac.src = tri.a AND ac.dst = tri.c
  LEFT JOIN w cb ON cb.src = tri.c AND cb.dst = tri.b
  LEFT JOIN w ba ON ba.src = tri.b AND ba.dst = tri.a
)
SELECT CAST(count(*) AS BIGINT) AS n_triads,
       CAST(sum(CASE WHEN f > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_cyclic,
       CAST(coalesce(sum(CASE WHEN f > 0 THEN f END), 0) AS BIGINT)
         AS total_cyclic_flow,
       CAST(coalesce(max(f), 0) AS BIGINT) AS max_cyclic_flow
FROM fl"""


# ---------------------------------------------------------------------------
# part_brand_cannibalization — negative volume-correlation pairs
# ---------------------------------------------------------------------------


def q_part_brand_cannibalization(sf_dir: str):
    """Cannibalization scan: Pearson correlation between every brand
    pair's monthly shipped quantities over the shared calendar-month
    grid (zero-filled, exact integer moments); the summary reports how
    many pairs co-move negatively. One row: n_brands, n_pairs,
    n_negative, min_r_micro, mean_r_micro.

    Scale shape: (brand, month) quantity fold via the broadcast map;
    the bounded |brands|^2 pair scan runs on the driver."""
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
        ym = (
            df["l_shipdate"].dt.year.to_numpy(np.int64) * 12
            + df["l_shipdate"].dt.month.to_numpy(np.int64) - 1
        )
        q = np.floor(
            df["l_quantity"].to_numpy(np.float64) * 1000.0 + 0.5
        ).astype(np.int64)
        brand = df["l_partkey"].map(p2b_).to_numpy(object)
        g = (
            pd.DataFrame({"brand": brand, "ym": ym, "q": q})
            .groupby(["brand", "ym"], as_index=False)["q"]
            .sum()
        )
        return g.astype({"ym": np.int64, "q": np.int64})

    m = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_shipdate", "l_quantity"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["brand", "ym"])["q"]
        .sum()
    )
    cols = ["n_brands", "n_pairs", "n_negative", "min_r_micro",
            "mean_r_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if m.empty:
        return empty
    ym0 = int(m.index.get_level_values(1).min())
    ym1 = int(m.index.get_level_values(1).max())
    n_m = ym1 - ym0 + 1
    if n_m < 3:
        return empty
    brands = sorted(set(m.index.get_level_values(0)))
    vecs = {}
    for b in brands:
        v = np.zeros(n_m, np.int64)
        sub = m.loc[b]
        v[sub.index.to_numpy(np.int64) - ym0] = sub.to_numpy(np.int64)
        vecs[b] = v.astype(object)
    rs = []
    for i, a in enumerate(brands):
        for b in brands[i + 1:]:
            va, vb = vecs[a], vecs[b]
            sa, sb = int(va.sum()), int(vb.sum())
            saa = int((va * va).sum())
            sbb = int((vb * vb).sum())
            sab = int((va * vb).sum())
            ca = n_m * saa - sa * sa
            cb = n_m * sbb - sb * sb
            if ca <= 0 or cb <= 0:
                continue
            r = float(n_m * sab - sa * sb) / (
                float(np.sqrt(float(ca))) * float(np.sqrt(float(cb)))
            )
            rs.append(r)
    if not rs:
        return empty
    arr = np.array(rs, np.float64)
    return pd.DataFrame(
        [
            (
                np.int64(len(brands)), np.int64(len(arr)),
                np.int64(int((arr < 0.0).sum())),
                np.int64(np.floor(float(arr.min()) * 1_000_000.0 + 0.5)),
                np.int64(np.floor(float(arr.mean()) * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES323["part_brand_cannibalization"] = """
WITH base AS (
  SELECT p.p_brand AS brand,
         CAST(year(l.l_shipdate) * 12 + month(l.l_shipdate) - 1 AS BIGINT)
           AS ym,
         CAST(floor(l.l_quantity * 1000.0 + 0.5) AS BIGINT) AS q
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
g AS (SELECT min(ym) AS m0, max(ym) AS m1 FROM base),
mth AS (
  SELECT brand, ym, CAST(sum(q) AS BIGINT) AS q FROM base GROUP BY 1, 2
),
brands AS (SELECT DISTINCT brand FROM mth),
grid AS (
  SELECT b.brand, g.m0 + CAST(r.range AS BIGINT) AS ym
  FROM brands b, g CROSS JOIN range(0, 4000) r
  WHERE r.range <= g.m1 - g.m0
),
vec AS (
  SELECT grid.brand, grid.ym, CAST(coalesce(mth.q, 0) AS BIGINT) AS q
  FROM grid LEFT JOIN mth ON mth.brand = grid.brand AND mth.ym = grid.ym
),
mom AS (
  SELECT a.brand AS ba, b.brand AS bb,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(a.q) AS BIGINT) AS sa, CAST(sum(b.q) AS BIGINT) AS sb,
         CAST(sum(CAST(a.q AS HUGEINT) * a.q) AS HUGEINT) AS saa,
         CAST(sum(CAST(b.q AS HUGEINT) * b.q) AS HUGEINT) AS sbb,
         CAST(sum(CAST(a.q AS HUGEINT) * b.q) AS HUGEINT) AS sab
  FROM vec a JOIN vec b ON b.ym = a.ym AND a.brand < b.brand
  GROUP BY 1, 2
),
r AS (
  SELECT CAST(CAST(n AS HUGEINT) * sab - CAST(sa AS HUGEINT) * sb
              AS DOUBLE)
           / (sqrt(CAST(CAST(n AS HUGEINT) * saa
                        - CAST(sa AS HUGEINT) * sa AS DOUBLE))
              * sqrt(CAST(CAST(n AS HUGEINT) * sbb
                          - CAST(sb AS HUGEINT) * sb AS DOUBLE))) AS v
  FROM mom
  WHERE (CAST(n AS HUGEINT) * saa - CAST(sa AS HUGEINT) * sa) > 0
    AND (CAST(n AS HUGEINT) * sbb - CAST(sb AS HUGEINT) * sb) > 0
),
nb AS (SELECT CAST(count(*) AS BIGINT) AS n FROM brands),
nm AS (SELECT CAST(m1 - m0 + 1 AS BIGINT) AS n FROM g)
SELECT nb.n AS n_brands, CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(CASE WHEN v < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_negative,
       CAST(floor(min(v) * 1000000.0 + 0.5) AS BIGINT) AS min_r_micro,
       CAST(floor(avg(v) * 1000000.0 + 0.5) AS BIGINT) AS mean_r_micro
FROM r, nb, nm
WHERE nm.n >= 3
GROUP BY nb.n
HAVING count(*) > 0"""


QUERIES323 = {
    "nation_trade_triangles": q_nation_trade_triangles,
    "part_brand_cannibalization": q_part_brand_cannibalization,
}
