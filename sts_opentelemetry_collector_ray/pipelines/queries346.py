"""Driver-contract queries, wave 346 — directed transitivity of the
nation trade graph (feed-forward closure of 2-paths) and the Qn-style
robust scale of the daily series (lower median of all pairwise absolute
differences, exact over the value histogram). Same contract as
queries.py: column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES346: dict[str, str] = {}

_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# nation_transitivity — feed-forward closure of directed 2-paths
# ---------------------------------------------------------------------------


def q_nation_transitivity(sf_dir: str):
    """Directed transitivity: among 2-paths a -> b -> c (a, b, c
    distinct), the share where the shortcut a -> c also exists. Pure
    integer counting on the bounded edge set. One row: n_paths,
    n_closed, transitivity_micro.

    Scale shape: the tagged edge exchange; the |nations|^3 path scan
    runs on the driver."""
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
        return (
            pd.DataFrame({"s": s[keep], "c": c[keep]})
            .drop_duplicates()
            .astype(np.int64)
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    ).map_batches(li_rows, batch_format="pyarrow")
    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(o_rows, batch_format="pyarrow")
    e = (
        li.union(o)
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    cols = ["n_paths", "n_closed", "transitivity_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if e.empty:
        return empty
    edges = set(zip(e["s"].tolist(), e["c"].tolist()))
    succs: dict[int, list[int]] = {}
    for a, b in edges:
        succs.setdefault(a, []).append(b)
    n_paths = 0
    n_closed = 0
    for a, bs in succs.items():
        for b in bs:
            for c in succs.get(b, ()):
                if c == a or c == b:
                    continue
                n_paths += 1
                if (a, c) in edges:
                    n_closed += 1
    if n_paths == 0:
        return empty
    return pd.DataFrame(
        [
            (
                np.int64(n_paths), np.int64(n_closed),
                np.int64(np.floor(
                    float(n_closed) / float(n_paths) * 1_000_000.0 + 0.5
                )),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES346["nation_transitivity"] = """
WITH e AS (
  SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE c.c_nationkey <> s.s_nationkey
),
paths AS (
  SELECT a.src AS pa, a.dst AS pb, b.dst AS pc
  FROM e a JOIN e b ON b.src = a.dst
  WHERE b.dst <> a.src AND b.dst <> a.dst
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_paths,
         CAST(sum(CASE WHEN EXISTS (
                 SELECT 1 FROM e cl
                 WHERE cl.src = paths.pa AND cl.dst = paths.pc
               ) THEN 1 ELSE 0 END) AS BIGINT) AS n_closed
  FROM paths
)
SELECT n_paths, n_closed,
       CAST(floor(CAST(n_closed AS DOUBLE) / n_paths * 1000000.0 + 0.5)
            AS BIGINT) AS transitivity_micro
FROM agg
WHERE n_paths > 0"""


# ---------------------------------------------------------------------------
# events_qn_scale — median of pairwise absolute differences
# ---------------------------------------------------------------------------


def q_events_qn_scale(sf_dir: str):
    """Qn-style robust scale of the daily series: the LOWER median of
    the multiset {|y_i - y_j| : i < j} over all day pairs, computed
    EXACTLY from the value histogram (pair weights c_a c_b, same-value
    pairs contribute zero diffs with weight C(c,2)); compared with the
    MAD-from-median for reference. One row: n_days, n_pairs,
    qn_scale, mad_scale."""
    from sts_opentelemetry_collector_ray.pipelines.queries264 import (
        _daily_counts,
        _grid,
    )
    from sts_opentelemetry_collector_ray.pipelines.queries265 import (
        _lower_median,
    )

    days = _daily_counts(sf_dir)
    cols = ["n_days", "n_pairs", "qn_scale", "mad_scale"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if days.empty:
        return empty
    y = _grid(days)
    n = len(y)
    if n < 3:
        return empty
    vals, cnts = np.unique(y, return_counts=True)
    # pairwise |diff| multiset over the histogram
    diffs: dict[int, int] = {}
    for i in range(len(vals)):
        ci = int(cnts[i])
        if ci >= 2:
            diffs[0] = diffs.get(0, 0) + ci * (ci - 1) // 2
        for j in range(i + 1, len(vals)):
            d = int(vals[j] - vals[i])
            diffs[d] = diffs.get(d, 0) + ci * int(cnts[j])
    total = n * (n - 1) // 2
    k = (total + 1) // 2
    cum = 0
    qn = 0
    for d in sorted(diffs):
        cum += diffs[d]
        if cum >= k:
            qn = d
            break
    med = _lower_median(y)
    mad = _lower_median(np.abs(y - med))
    return pd.DataFrame(
        [
            (
                np.int64(n), np.int64(total), np.int64(qn), np.int64(mad),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES346["events_qn_scale"] = f"""
WITH h AS (
  SELECT epoch_us(ts) // {_DAY_US} AS dy, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
),
g AS (SELECT min(dy) AS d0, max(dy) AS d1 FROM h),
grid AS (
  SELECT g.d0 + CAST(r.range AS BIGINT) AS dy
  FROM g CROSS JOIN range(0, 20000) r
  WHERE r.range <= g.d1 - g.d0
),
x AS (
  SELECT CAST(coalesce(h.cnt, 0) AS BIGINT) AS y
  FROM grid LEFT JOIN h USING (dy)
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM x),
vc AS (SELECT y, CAST(count(*) AS BIGINT) AS c FROM x GROUP BY 1),
dpairs AS (
  SELECT CAST(0 AS BIGINT) AS d, CAST(c * (c - 1) // 2 AS BIGINT) AS w
  FROM vc WHERE c >= 2
  UNION ALL
  SELECT CAST(b.y - a.y AS BIGINT) AS d, CAST(a.c * b.c AS BIGINT) AS w
  FROM vc a JOIN vc b ON b.y > a.y
),
dd AS (SELECT d, CAST(sum(w) AS BIGINT) AS w FROM dpairs GROUP BY 1),
tot AS (SELECT CAST(sum(w) AS BIGINT) AS p FROM dd),
qn AS (
  SELECT min(d) AS v FROM (
    SELECT d, sum(w) OVER (ORDER BY d) AS cum FROM dd
  ), tot WHERE cum >= (tot.p + 1) // 2
),
med AS (
  SELECT min(y) AS m FROM (
    SELECT y, sum(c) OVER (ORDER BY y) AS cum FROM vc
  ), nn WHERE cum >= (nn.n + 1) // 2
),
ad AS (
  SELECT abs(x.y - med.m) AS a FROM x, med
),
ac AS (SELECT a, CAST(count(*) AS BIGINT) AS c FROM ad GROUP BY 1),
mad AS (
  SELECT min(a) AS v FROM (
    SELECT a, sum(c) OVER (ORDER BY a) AS cum FROM ac
  ), nn WHERE cum >= (nn.n + 1) // 2
)
SELECT nn.n AS n_days, tot.p AS n_pairs,
       CAST(qn.v AS BIGINT) AS qn_scale,
       CAST(mad.v AS BIGINT) AS mad_scale
FROM nn, tot, qn, mad
WHERE nn.n >= 3"""


QUERIES346 = {
    "nation_transitivity": q_nation_transitivity,
    "events_qn_scale": q_events_qn_scale,
}
