"""Driver-contract queries, wave 271 — articulation points (cut
vertices) of the cross-nation trade graph by exact component counting,
and Bowker's test of symmetry on the per-user event-type transition
matrix (exact rational chi-square terms). Same contract as queries.py:
column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES271: dict[str, str] = {}

_AP_BUCKETS = 64


# ---------------------------------------------------------------------------
# nation_articulation — cut vertices of the trade graph
# ---------------------------------------------------------------------------


def q_nation_articulation(sf_dir: str):
    """Articulation points of the UNDIRECTED nation trade graph (edge
    (a,b) iff some lineitem ships supplier-nation b -> customer-nation a,
    a != b): v is a cut vertex iff components(G - v) > components(G) —
    pure integer component counting on the bounded nation vertex set, no
    floats at all. Per graph vertex: nation, deg, n_comp_after,
    n_comp_base, is_cut.

    Scale shape: the lineitem x orders custkey resolution is ONE tagged
    orderkey-bucket exchange emitting only DISTINCT nation pairs (the
    `nation_harmonic_centrality` pattern); the |nations|-bounded removal
    sweep runs on the driver; SQL replays it with a removal-tagged
    recursive closure."""
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
                "_b": (k % _AP_BUCKETS).astype(np.int64),
            }
        )

    def o_rows(t: pa.Table) -> pd.DataFrame:
        k = t["o_orderkey"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "k": k,
                "supp": np.int64(-1),
                "cust": t["o_custkey"].to_numpy().astype(np.int64),
                "_b": (k % _AP_BUCKETS).astype(np.int64),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        c2n_, s2n_ = ray.get(dims_ref)
        is_o = (g["cust"] >= 0).to_numpy()
        o = g.loc[is_o, ["k", "cust"]]
        li = g.loc[~is_o, ["k", "supp"]]
        m = li.merge(o, on="k")
        a = m["cust"].map(c2n_).to_numpy(np.int64)
        b = m["supp"].map(s2n_).to_numpy(np.int64)
        keep = a != b
        return (
            pd.DataFrame({"a": a[keep], "b": b[keep]})
            .drop_duplicates()
            .astype(np.int64)
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    ).map_batches(li_rows, batch_format="pyarrow")
    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(o_rows, batch_format="pyarrow")
    pairs = (
        li.union(o)
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    cols = ["nation", "deg", "n_comp_after", "n_comp_base", "is_cut"]
    empty = pd.DataFrame(
        {
            "nation": pd.Series([], dtype=object),
            **{c: pd.Series([], dtype=np.int64) for c in cols[1:]},
        }
    )
    if pairs.empty:
        return empty
    adj: dict[int, set[int]] = {}
    for a, b in zip(pairs["a"].to_numpy(), pairs["b"].to_numpy()):
        adj.setdefault(int(a), set()).add(int(b))
        adj.setdefault(int(b), set()).add(int(a))
    verts = sorted(adj)

    def n_components(removed: int | None) -> int:
        seen: set[int] = set()
        comps = 0
        for v in verts:
            if v == removed or v in seen:
                continue
            comps += 1
            stack = [v]
            seen.add(v)
            while stack:
                u = stack.pop()
                for w in adj[u]:
                    if w != removed and w not in seen:
                        seen.add(w)
                        stack.append(w)
        return comps

    base = n_components(None)
    names = dict(zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist()))
    rows = []
    for v in verts:
        after = n_components(v)
        rows.append(
            (
                names[v], np.int64(len(adj[v])), np.int64(after),
                np.int64(base), np.int64(1 if after > base else 0),
            )
        )
    out = pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols[1:]}
    )
    return out.sort_values("nation").reset_index(drop=True)


ORACLES271["nation_articulation"] = """
WITH RECURSIVE e0 AS (
  SELECT DISTINCT c.c_nationkey AS a, s.s_nationkey AS b
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE c.c_nationkey <> s.s_nationkey
),
e AS (SELECT a AS src, b AS dst FROM e0 UNION SELECT b, a FROM e0),
verts AS (SELECT DISTINCT src AS v FROM e),
-- removal-tagged edge set: r = -1 is the intact graph
rm AS (SELECT CAST(-1 AS BIGINT) AS r UNION ALL SELECT CAST(v AS BIGINT) FROM verts),
er AS (
  SELECT rm.r, e.src, e.dst
  FROM rm JOIN e ON e.src <> rm.r AND e.dst <> rm.r
),
reach(r, src, dst) AS (
  SELECT r, src, dst FROM er
  UNION
  SELECT p.r, p.src, er.dst
  FROM reach p JOIN er ON er.r = p.r AND er.src = p.dst
),
-- component label of each surviving vertex = min(self, reachable)
lab AS (
  SELECT rm.r, v.v,
         least(v.v, coalesce(min(reach.dst), v.v)) AS lbl
  FROM rm JOIN verts v ON v.v <> rm.r
  LEFT JOIN reach ON reach.r = rm.r AND reach.src = v.v
  GROUP BY 1, 2
),
ncomp AS (
  SELECT r, CAST(count(DISTINCT lbl) AS BIGINT) AS nc FROM lab GROUP BY 1
),
base AS (SELECT nc FROM ncomp WHERE r = -1),
deg AS (
  SELECT src AS v, CAST(count(DISTINCT dst) AS BIGINT) AS deg
  FROM e GROUP BY 1
)
SELECT n.n_name AS nation, deg.deg,
       ncomp.nc AS n_comp_after, base.nc AS n_comp_base,
       CAST(CASE WHEN ncomp.nc > base.nc THEN 1 ELSE 0 END AS BIGINT)
         AS is_cut
FROM verts v
JOIN nation n ON n.n_nationkey = v.v
JOIN deg ON deg.v = v.v
JOIN ncomp ON ncomp.r = v.v
CROSS JOIN base
ORDER BY nation"""


# ---------------------------------------------------------------------------
# events_bowker_symmetry — transition-matrix symmetry chi-square
# ---------------------------------------------------------------------------


def q_events_bowker_symmetry(sf_dir: str):
    """Bowker's test of symmetry on the per-user consecutive event-type
    transition matrix (events ordered by (ts, event_id) within user):
    for every unordered type pair a < b with n_ab + n_ba > 0 the term
    (n_ab - n_ba)^2 / (n_ab + n_ba) is an exact rational; chi2 is their
    sum and n_pairs the degrees of freedom. Per pair: type_a, type_b,
    n_ab, n_ba, term_micro, chi2_micro, n_pairs (last two repeated).

    Scale shape: ONE user-bucket exchange; per-bucket vectorized sort +
    shifted-pair counting (the sessionize idiom); the driver folds the
    bounded |types|^2 matrix."""

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
                "et": t["event_type"].to_numpy(zero_copy_only=False),
            }
        )
        df["_b"] = (df["u"] % _AP_BUCKETS).astype(np.int64)
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "f": pd.Series([], dtype=object),
                "t": pd.Series([], dtype=object),
                "c": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(["u", "ts", "eid"], kind="stable")
        u = g["u"].to_numpy()
        et = g["et"].to_numpy(object)
        same = u[1:] == u[:-1]
        f, t = et[:-1][same], et[1:][same]
        if len(f) == 0:
            return empty
        out = (
            pd.DataFrame({"f": f, "t": t})
            .groupby(["f", "t"], sort=False)
            .size()
            .rename("c")
            .reset_index()
        )
        out["c"] = out["c"].astype(np.int64)
        return out

    mat = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "ts", "event_id", "event_type"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: |types|^2 x buckets
        .groupby(["f", "t"])["c"]
        .sum()
    )
    cols = [
        "type_a", "type_b", "n_ab", "n_ba", "term_micro", "chi2_micro",
        "n_pairs",
    ]
    empty = pd.DataFrame(
        {
            **{c: pd.Series([], dtype=object) for c in cols[:2]},
            **{c: pd.Series([], dtype=np.int64) for c in cols[2:]},
        }
    )
    if mat.empty:
        return empty
    types = sorted(set(mat.index.get_level_values(0))
                   | set(mat.index.get_level_values(1)))
    rows = []
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            nab = int(mat.get((a, b), 0))
            nba = int(mat.get((b, a), 0))
            if nab + nba == 0:
                continue
            term = float((nab - nba) ** 2) / float(nab + nba)
            rows.append((a, b, nab, nba, term))
    if not rows:
        return empty
    chi2 = float(sum(r[4] for r in rows))
    c_micro = np.int64(np.floor(chi2 * 1_000_000.0 + 0.5))
    k = np.int64(len(rows))
    return pd.DataFrame(
        [
            (
                a, b, np.int64(nab), np.int64(nba),
                np.int64(np.floor(term * 1_000_000.0 + 0.5)), c_micro, k,
            )
            for a, b, nab, nba, term in rows
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols[2:]})


ORACLES271["events_bowker_symmetry"] = """
WITH seq AS (
  SELECT event_type AS f,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS t
  FROM events
),
m AS (
  SELECT f, t, CAST(count(*) AS BIGINT) AS c
  FROM seq WHERE t IS NOT NULL GROUP BY 1, 2
),
types AS (
  SELECT DISTINCT f AS ty FROM m UNION SELECT DISTINCT t FROM m
),
pairs AS (
  SELECT a.ty AS type_a, b.ty AS type_b
  FROM types a JOIN types b ON a.ty < b.ty
),
cells AS (
  SELECT p.type_a, p.type_b,
         CAST(coalesce(ab.c, 0) AS BIGINT) AS n_ab,
         CAST(coalesce(ba.c, 0) AS BIGINT) AS n_ba
  FROM pairs p
  LEFT JOIN m ab ON ab.f = p.type_a AND ab.t = p.type_b
  LEFT JOIN m ba ON ba.f = p.type_b AND ba.t = p.type_a
),
nz AS (SELECT * FROM cells WHERE n_ab + n_ba > 0),
tot AS (
  SELECT sum(CAST((n_ab - n_ba) * (n_ab - n_ba) AS DOUBLE)
             / CAST(n_ab + n_ba AS DOUBLE)) AS chi2,
         CAST(count(*) AS BIGINT) AS n_pairs
  FROM nz
)
SELECT nz.type_a, nz.type_b, nz.n_ab, nz.n_ba,
       CAST(floor(CAST((nz.n_ab - nz.n_ba) * (nz.n_ab - nz.n_ba) AS DOUBLE)
                  / CAST(nz.n_ab + nz.n_ba AS DOUBLE) * 1000000.0 + 0.5)
            AS BIGINT) AS term_micro,
       CAST(floor(tot.chi2 * 1000000.0 + 0.5) AS BIGINT) AS chi2_micro,
       tot.n_pairs
FROM nz, tot
ORDER BY nz.type_a, nz.type_b"""


QUERIES271 = {
    "nation_articulation": q_nation_articulation,
    "events_bowker_symmetry": q_events_bowker_symmetry,
}
