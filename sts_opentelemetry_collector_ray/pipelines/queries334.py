"""Driver-contract queries, wave 334 — eccentricity / diameter / radius
of the undirected nation trade graph (exact BFS integers) and peak
60-second concurrency of the event stream (the burst-sizing number for
ingestion capacity). Same contract as queries.py: column names AND
dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES334: dict[str, str] = {}

_PC_WINDOW_US = 60_000_000
_HC_MAX_D = 24


# ---------------------------------------------------------------------------
# nation_eccentricity — per-node eccentricity, diameter and radius
# ---------------------------------------------------------------------------


def q_nation_eccentricity(sf_dir: str):
    """Eccentricity of each nation on the UNDIRECTED trade graph (max
    BFS distance to any reachable nation), with the graph diameter
    (max ecc) and radius (min ecc) — all exact integers on the bounded
    vertex set. Per graph vertex: nation, ecc, n_reach, diameter,
    radius (last two repeated).

    Scale shape: the `nation_harmonic_centrality` tagged pair exchange;
    BFS on the driver; SQL replays via the bounded recursive closure."""
    import ray as _ray
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
    cols = ["nation", "ecc", "n_reach", "diameter", "radius"]
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
    names = dict(zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist()))
    eccs = {}
    reach = {}
    for v in sorted(adj):
        dist = {v: 0}
        frontier = [v]
        d = 0
        while frontier and d < _HC_MAX_D:
            d += 1
            nxt = []
            for u in frontier:
                for w in adj[u]:
                    if w not in dist:
                        dist[w] = d
                        nxt.append(w)
            frontier = nxt
        eccs[v] = max(dist.values())
        reach[v] = len(dist) - 1
    diameter = max(eccs.values())
    radius = min(eccs.values())
    rows = [
        (
            names[v], np.int64(eccs[v]), np.int64(reach[v]),
            np.int64(diameter), np.int64(radius),
        )
        for v in sorted(adj)
    ]
    return (
        pd.DataFrame(rows, columns=cols)
        .sort_values("nation")
        .reset_index(drop=True)
        .astype({c: np.int64 for c in cols[1:]})
    )


ORACLES334["nation_eccentricity"] = f"""
WITH RECURSIVE e0 AS (
  SELECT DISTINCT c.c_nationkey AS a, s.s_nationkey AS b
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE c.c_nationkey <> s.s_nationkey
),
e AS (SELECT a AS src, b AS dst FROM e0 UNION SELECT b, a FROM e0),
paths(src, dst, d) AS (
  SELECT src, dst, 1 FROM e
  UNION
  SELECT p.src, e.dst, p.d + 1
  FROM paths p JOIN e ON e.src = p.dst
  WHERE p.d < {_HC_MAX_D} AND e.dst <> p.src
),
sp AS (SELECT src, dst, min(d) AS d FROM paths GROUP BY 1, 2),
ecc AS (
  SELECT src, CAST(max(d) AS BIGINT) AS ecc,
         CAST(count(*) AS BIGINT) AS n_reach
  FROM sp GROUP BY 1
),
gl AS (
  SELECT CAST(max(ecc) AS BIGINT) AS diameter,
         CAST(min(ecc) AS BIGINT) AS radius
  FROM ecc
)
SELECT n.n_name AS nation, ecc.ecc, ecc.n_reach, gl.diameter, gl.radius
FROM ecc JOIN nation n ON n.n_nationkey = ecc.src, gl
ORDER BY nation"""


# ---------------------------------------------------------------------------
# events_peak_concurrency — busiest 60-second window
# ---------------------------------------------------------------------------


def q_events_peak_concurrency(sf_dir: str):
    """Burst sizing: the maximum number of events in any window
    [t_i, t_i + 60s) anchored at an event, and the earliest anchor
    achieving it. Pure integer counting via sorted timestamps. One row:
    n_events, peak_count, peak_start_us.

    Scale shape: each event lands in bucket ts // 60s twice (home +
    neighbor, the `events_ripley_k` exchange) so every window is
    co-bucketed; per-bucket searchsorted counting; the driver takes the
    max with the earliest-anchor tie-break."""

    def partial(t: pa.Table) -> pd.DataFrame:
        us = pa.compute.cast(t["ts"], pa.int64()).to_numpy()
        b = us // _PC_WINDOW_US
        frames = [
            pd.DataFrame({"bk": b, "home": 1, "us": us}),
            pd.DataFrame({"bk": b - 1, "home": 0, "us": us}),
        ]
        out = pd.concat(frames, ignore_index=True)
        out["_b"] = (out["bk"] % 256).astype(np.int64)
        return out.astype(
            {"bk": np.int64, "home": np.int64, "us": np.int64}
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        zero = pd.DataFrame(
            {
                "peak": pd.Series([], dtype=np.int64),
                "anchor": pd.Series([], dtype=np.int64),
            }
        )
        rows = []
        for bk, sub in g.groupby("bk", sort=False):
            all_us = np.sort(sub["us"].to_numpy(np.int64))
            home = np.sort(
                sub.loc[sub["home"] == 1, "us"].to_numpy(np.int64)
            )
            if len(home) == 0:
                continue
            hi = np.searchsorted(all_us, home + _PC_WINDOW_US, side="left")
            lo = np.searchsorted(all_us, home, side="left")
            cnt = hi - lo
            best = int(cnt.max())
            anchor = int(home[int(np.argmax(cnt))])  # earliest max
            rows.append((np.int64(best), np.int64(anchor)))
        if not rows:
            return zero
        return pd.DataFrame(rows, columns=["peak", "anchor"])

    parts = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )
    n = int(
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        .count()
    )
    cols = ["n_events", "peak_count", "peak_start_us"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if parts.empty or n == 0:
        return empty
    best = int(parts["peak"].max())
    anchor = int(parts.loc[parts["peak"] == best, "anchor"].min())
    return pd.DataFrame(
        [(np.int64(n), np.int64(best), np.int64(anchor))],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES334["events_peak_concurrency"] = f"""
WITH ev AS (SELECT epoch_us(ts) AS us FROM events),
cnt AS (
  SELECT a.us AS anchor, CAST(count(*) AS BIGINT) AS c
  FROM ev a JOIN ev b
    ON b.us >= a.us AND b.us < a.us + {_PC_WINDOW_US}
  GROUP BY 1
),
best AS (SELECT max(c) AS m FROM cnt),
pick AS (
  SELECT min(anchor) AS a FROM cnt, best WHERE cnt.c = best.m
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ev)
SELECT nn.n AS n_events, CAST(best.m AS BIGINT) AS peak_count,
       CAST(pick.a AS BIGINT) AS peak_start_us
FROM nn, best, pick
WHERE nn.n > 0"""


QUERIES334 = {
    "nation_eccentricity": q_nation_eccentricity,
    "events_peak_concurrency": q_events_peak_concurrency,
}
