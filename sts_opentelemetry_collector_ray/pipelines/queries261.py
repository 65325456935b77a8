"""Driver-contract queries, wave 261 — Moran's I spatial autocorrelation of
supplier revenue over the nation trade graph (Moran 1950; EXACT rational via
scaled deviations) and the Engle–Granger two-step cointegration probe
(Engle & Granger 1987) between the two dominant event types' daily series.
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES261: dict[str, str] = {}

_MI_BUCKETS = 64
_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# nation_moran_i — Moran's I of supplier revenue on the trade graph
# ---------------------------------------------------------------------------


def q_nation_moran_i(sf_dir: str):
    """Moran's I with binary weights from the undirected nation trade graph
    (edge iff some lineitem links a customer nation to a different supplier
    nation) and x = per-supplier-nation revenue in EXACT integer
    micro-dollars (Σ cents·(100−discount%)·100). With scaled deviations
    dᵢ = n·xᵢ − S (exact ints): I = (n·Σ_{ij∈W} dᵢdⱼ) / (W·Σ dᵢ²) — ONE
    division of two exact integers (HUGEINT in SQL, bignum here). One row:
    n_nations, w_pairs, expected_micro (−1/(n−1)), moran_micro.

    Scale shape: revenue is a per-batch (suppkey-nation → Σ) combiner via
    the broadcast supplier dim; edges reuse the `nation_flow_matrix`
    tagged orderkey-bucket exchange; the quadratic form runs on the
    bounded |nations| vector."""
    import ray
    import pyarrow.parquet as pq_mod

    cust = pq_mod.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    supp = pq_mod.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    nat = pq_mod.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey"])
    c2n = dict(zip(cust["c_custkey"].to_pylist(), cust["c_nationkey"].to_pylist()))
    s2n = dict(zip(supp["s_suppkey"].to_pylist(), supp["s_nationkey"].to_pylist()))
    dims_ref = ray.put((c2n, s2n))

    def li_rows(t: pa.Table) -> pd.DataFrame:
        k = t["l_orderkey"].to_numpy().astype(np.int64)
        cents = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        dpct = np.floor(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "k": k,
                "supp": t["l_suppkey"].to_numpy().astype(np.int64),
                "rev": cents * (100 - dpct) * 100,
                "cust": np.int64(-1),
                "_b": (k % _MI_BUCKETS).astype(np.int64),
            }
        )

    def o_rows(t: pa.Table) -> pd.DataFrame:
        k = t["o_orderkey"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "k": k,
                "supp": np.int64(-1),
                "rev": np.int64(0),
                "cust": t["o_custkey"].to_numpy().astype(np.int64),
                "_b": (k % _MI_BUCKETS).astype(np.int64),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        c2n_, s2n_ = ray.get(dims_ref)
        is_o = (g["cust"] >= 0).to_numpy()
        o = g.loc[is_o, ["k", "cust"]]
        li = g.loc[~is_o, ["k", "supp", "rev"]]
        m = li.merge(o, on="k")
        a = m["cust"].map(c2n_).to_numpy(np.int64)
        b = m["supp"].map(s2n_).to_numpy(np.int64)
        edges = (
            pd.DataFrame({"a": a[a != b], "b": b[a != b]})
            .drop_duplicates()
            .assign(rev=np.int64(0), kind=np.int64(0))
        )
        srev = (
            pd.DataFrame({"a": b, "b": np.int64(-1), "rev": m["rev"].to_numpy()})
            .groupby("a", as_index=False)["rev"]
            .sum()
            .assign(b=np.int64(-1), kind=np.int64(1))
        )
        return pd.concat([edges, srev[["a", "b", "rev", "kind"]]]).astype(np.int64)

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(li_rows, batch_format="pyarrow")
    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(o_rows, batch_format="pyarrow")
    part = (
        li.union(o)
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: |nations|² pairs + |nations| revenue partials
    )
    cols = ["n_nations", "w_pairs", "expected_micro", "moran_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if part.empty:
        return empty
    edges = (
        part[part["kind"] == 0][["a", "b"]].drop_duplicates()
    )
    rev = part[part["kind"] == 1].groupby("a")["rev"].sum()
    keys = sorted(int(v) for v in nat["n_nationkey"].to_pylist())
    n = len(keys)
    if n < 2:
        return empty
    x = {k: int(rev.get(k, 0)) for k in keys}
    S = sum(x.values())
    d = {k: n * x[k] - S for k in keys}
    den = sum(v * v for v in d.values())
    if den == 0:
        return empty
    und = set()
    for a, b in zip(edges["a"].to_numpy(), edges["b"].to_numpy()):
        und.add((int(a), int(b)))
        und.add((int(b), int(a)))
    w = len(und)
    if w == 0:
        return empty
    num = sum(d[i] * d[j] for i, j in und)
    moran = float(n * num) / float(w * den)
    expected = -1.0 / float(n - 1)
    return pd.DataFrame(
        {
            "n_nations": [np.int64(n)],
            "w_pairs": [np.int64(w)],
            "expected_micro": [np.int64(np.floor(expected * 1_000_000.0 + 0.5))],
            "moran_micro": [np.int64(np.floor(moran * 1_000_000.0 + 0.5))],
        }
    )


ORACLES261["nation_moran_i"] = """
WITH e0 AS (
  SELECT DISTINCT c.c_nationkey AS a, s.s_nationkey AS b
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE c.c_nationkey <> s.s_nationkey
),
e AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
rv AS (
  SELECT s.s_nationkey AS nk,
         CAST(sum(CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT)
                  * (100 - CAST(floor(l.l_discount * 100.0 + 0.5) AS BIGINT))
                  * 100) AS HUGEINT) AS rev
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1
),
x AS (
  SELECT n.n_nationkey AS nk, coalesce(rv.rev, 0) AS xv
  FROM nation n LEFT JOIN rv ON rv.nk = n.n_nationkey
),
m AS (SELECT CAST(count(*) AS HUGEINT) AS n, sum(xv) AS s FROM x),
d AS (SELECT nk, m.n * xv - m.s AS dv FROM x, m),
den AS (SELECT sum(dv * dv) AS den FROM d),
num AS (
  SELECT sum(da.dv * db.dv) AS num
  FROM e JOIN d da ON da.nk = e.a JOIN d db ON db.nk = e.b
),
w AS (SELECT CAST(count(*) AS HUGEINT) AS w FROM e)
SELECT CAST(m.n AS BIGINT) AS n_nations,
       CAST(w.w AS BIGINT) AS w_pairs,
       CAST(floor(-1.0 / CAST(m.n - 1 AS DOUBLE) * 1000000.0 + 0.5)
            AS BIGINT) AS expected_micro,
       CAST(floor(CAST(m.n * num.num AS DOUBLE)
                  / CAST(w.w * den.den AS DOUBLE) * 1000000.0 + 0.5)
            AS BIGINT) AS moran_micro
FROM m, w, num, den
WHERE m.n >= 2 AND den.den <> 0 AND w.w > 0"""


# ---------------------------------------------------------------------------
# events_engle_granger — two-step cointegration of the top-2 type series
# ---------------------------------------------------------------------------


def q_events_engle_granger(sf_dir: str):
    """Engle–Granger two-step: OLS y = α + β·x between the zero-filled
    daily count series of the two most frequent event types (x = rank 1,
    y = rank 2; ties break lexicographically), then the no-constant ADF
    coefficient ρ = Σ eₜ₋₁Δeₜ / Σ eₜ₋₁² on the residuals. β and α are
    single divisions of exact integer moment algebra; residuals and the
    two ρ sums use IDENTICAL sequential folds on both sides (Python loop /
    `list_reduce` over ordered 3-lists), so the floats replay bit-for-bit.
    One row: n_days, beta_micro, alpha_micro, rho_micro.

    Scale shape: one (day,type → count) combiner per batch; the bounded
    calendar grid folds on the driver."""

    def tpart(t: pa.Table) -> pd.DataFrame:
        df = t.select(["event_type"]).to_pandas()
        out = df.groupby("event_type", as_index=False).size().rename(
            columns={"size": "c"}
        )
        return out.astype({"c": np.int64})

    types = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type"])
        .map_batches(tpart, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["n_days", "beta_micro", "alpha_micro", "rho_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if types.empty:
        return empty
    agg = types.groupby("event_type")["c"].sum()
    ordered = agg.sort_index().sort_values(kind="mergesort", ascending=False)
    if len(ordered) < 2:
        return empty
    t1, t2 = str(ordered.index[0]), str(ordered.index[1])

    def dpart(t: pa.Table) -> pd.DataFrame:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        day = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False) // _DAY_US
        df = pd.DataFrame({"dy": day, "et": et})
        df = df[(df["et"] == t1) | (df["et"] == t2)]
        out = (
            df.groupby(["dy", "et"], as_index=False)
            .size()
            .rename(columns={"size": "c"})
        )
        return out.astype({"dy": np.int64, "c": np.int64})

    daily = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])
        .map_batches(dpart, batch_format="pyarrow")
        .to_pandas()  # bounded: calendar-day × 2 types
        .groupby(["dy", "et"])["c"]
        .sum()
        .unstack(fill_value=0)
        .reindex(columns=[t1, t2], fill_value=0)
    )
    d0, d1 = int(daily.index.min()), int(daily.index.max())
    n = d1 - d0 + 1
    if n < 3:
        return empty
    x = np.zeros(n, np.int64)
    y = np.zeros(n, np.int64)
    idx = daily.index.to_numpy(np.int64) - d0
    x[idx] = daily[t1].to_numpy(np.int64)
    y[idx] = daily[t2].to_numpy(np.int64)
    sx = int(x.sum()); sy = int(y.sum())
    sxx = sum(int(v) * int(v) for v in x)
    sxy = sum(int(a) * int(b) for a, b in zip(x, y))
    D = n * sxx - sx * sx
    if D == 0:
        return empty
    Nb = n * sxy - sx * sy
    Anum = D * sy - Nb * sx
    beta = float(Nb) / float(D)
    alpha = float(Anum) / float(n * D)
    e = [(float(yv) - alpha) - beta * float(xv) for xv, yv in zip(x, y)]
    prev = e[0]
    num = 0.0
    den = 0.0
    for v in e[1:]:
        num = num + prev * (v - prev)
        den = den + prev * prev
        prev = v
    if den == 0.0:
        return empty
    rho = num / den
    return pd.DataFrame(
        {
            "n_days": [np.int64(n)],
            "beta_micro": [np.int64(np.floor(beta * 1_000_000.0 + 0.5))],
            "alpha_micro": [np.int64(np.floor(alpha * 1_000_000.0 + 0.5))],
            "rho_micro": [np.int64(np.floor(rho * 1_000_000.0 + 0.5))],
        }
    )


ORACLES261["events_engle_granger"] = f"""
WITH tc AS (
  SELECT event_type, count(*) AS c FROM events GROUP BY 1
),
pick AS (
  SELECT event_type, row_number() OVER (ORDER BY c DESC, event_type) AS r
  FROM tc
),
t1 AS (SELECT event_type FROM pick WHERE r = 1),
t2 AS (SELECT event_type FROM pick WHERE r = 2),
h AS (
  SELECT epoch_us(ts) // {_DAY_US} AS dy,
         CAST(sum(CASE WHEN event_type = (SELECT event_type FROM t1)
                       THEN 1 ELSE 0 END) AS BIGINT) AS cx,
         CAST(sum(CASE WHEN event_type = (SELECT event_type FROM t2)
                       THEN 1 ELSE 0 END) AS BIGINT) AS cy
  FROM events
  WHERE event_type IN ((SELECT event_type FROM t1),
                       (SELECT event_type FROM t2))
  GROUP BY 1
),
g AS (SELECT min(dy) AS d0, max(dy) AS d1
      FROM (SELECT epoch_us(ts) // {_DAY_US} AS dy FROM events)),
grid AS (
  SELECT g.d0 + CAST(r.range AS BIGINT) AS dy
  FROM g CROSS JOIN range(0, 20000) r
  WHERE r.range <= g.d1 - g.d0
),
xy AS (
  SELECT grid.dy,
         CAST(coalesce(h.cx, 0) AS HUGEINT) AS x,
         CAST(coalesce(h.cy, 0) AS HUGEINT) AS y
  FROM grid LEFT JOIN h USING (dy)
),
m AS (
  SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(x * y) AS sxy
  FROM xy
),
co AS (
  SELECT n, m.n * sxx - sx * sx AS dd, m.n * sxy - sx * sy AS nb,
         (m.n * sxx - sx * sx) * sy - (m.n * sxy - sx * sy) * sx AS anum
  FROM m
),
ab AS (
  SELECT n, CAST(nb AS DOUBLE) / CAST(dd AS DOUBLE) AS beta,
         CAST(anum AS DOUBLE) / CAST(n * dd AS DOUBLE) AS alpha
  FROM co WHERE dd <> 0
),
es AS (
  SELECT ab.n, ab.beta, ab.alpha,
         list([(CAST(xy.y AS DOUBLE) - ab.alpha)
                 - ab.beta * CAST(xy.x AS DOUBLE),
               CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)]
              ORDER BY xy.dy) AS el
  FROM xy, ab GROUP BY ab.n, ab.beta, ab.alpha
),
fold AS (
  SELECT n, beta, alpha,
         list_reduce(el,
           (acc, x) -> [x[1],
                        acc[2] + acc[1] * (x[1] - acc[1]),
                        acc[3] + acc[1] * acc[1]]) AS z
  FROM es
)
SELECT CAST(n AS BIGINT) AS n_days,
       CAST(floor(beta * 1000000.0 + 0.5) AS BIGINT) AS beta_micro,
       CAST(floor(alpha * 1000000.0 + 0.5) AS BIGINT) AS alpha_micro,
       CAST(floor(z[2] / z[3] * 1000000.0 + 0.5) AS BIGINT) AS rho_micro
FROM fold WHERE n >= 3 AND z[3] <> 0.0"""


QUERIES261 = {
    "nation_moran_i": q_nation_moran_i,
    "events_engle_granger": q_events_engle_granger,
}
