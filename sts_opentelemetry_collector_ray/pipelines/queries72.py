"""Driver-contract queries, wave 72 — supplier ship-latency spread (which
suppliers are ERRATIC, not just slow: exact variance, top-10) and 2-core
graph decomposition (iterative degree peeling — the standard prune before
community/cycle analysis). Same contract as queries.py: column names AND
dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES72: dict[str, str] = {}

_SPREAD_BUCKETS = 64
_SPREAD_TOPK = 10
_KCORE_K = 2
_KCORE_ROUNDS = 5


# ---------------------------------------------------------------------------
# supplier_latency_spread — top-10 suppliers by ship-latency variance
# ---------------------------------------------------------------------------


def q_supplier_latency_spread(sf_dir: str):
    """Erratic-supplier screen: per supplier, the variance of
    (ship day − order day) across its lineitems — computed from EXACT
    integer sums as (m·Σd² − (Σd)²) / m², one float division per supplier —
    top-10 by (variance DESC, suppkey ASC); suppliers with < 2 shipments
    excluded.

    Scale shape: lineitem (orderkey, suppkey, shipday) rows + order
    (orderkey, orderday) rows share ONE orderkey-bucket exchange (the
    ship-latency big×big pattern); per-bucket merge emits per-(supplier)
    integer partials (m, Σd, Σd²) — |suppliers| bounded rows; driver
    re-reduce + top-k."""

    def li_rows(t: pa.Table) -> pd.DataFrame:
        day = pa.compute.cast(t["l_shipdate"], pa.int64()).to_numpy() // 86_400_000_000
        k = t["l_orderkey"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "k": k,
                "supp": t["l_suppkey"].to_numpy().astype(np.int64),
                "sday": day.astype(np.int64),
                "oday": np.int64(-1),
                "_b": (k % _SPREAD_BUCKETS).astype(np.int64),
            }
        )

    def o_rows(t: pa.Table) -> pd.DataFrame:
        k = t["o_orderkey"].to_numpy().astype(np.int64)
        day = pa.compute.cast(t["o_orderdate"], pa.int64()).to_numpy() // 86_400_000_000
        return pd.DataFrame(
            {
                "k": k,
                "supp": np.int64(-1),
                "sday": np.int64(-1),
                "oday": day.astype(np.int64),
                "_b": (k % _SPREAD_BUCKETS).astype(np.int64),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        is_o = (g["oday"] >= 0).to_numpy()
        o = g.loc[is_o, ["k", "oday"]]
        li = g.loc[~is_o, ["k", "supp", "sday"]]
        m = li.merge(o, on="k")
        d = m["sday"].to_numpy(np.int64) - m["oday"].to_numpy(np.int64)
        out = (
            pd.DataFrame({"supp": m["supp"].to_numpy(np.int64), "d": d, "d2": d * d})
            .groupby("supp", sort=False)
            .agg(m=("d", "size"), sd=("d", "sum"), sd2=("d2", "sum"))
            .reset_index()
        )
        for c in ("m", "sd", "sd2"):
            out[c] = out[c].astype(np.int64)
        return out

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    ).map_batches(li_rows, batch_format="pyarrow")
    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    ).map_batches(o_rows, batch_format="pyarrow")
    agg = (
        li.union(o)
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: |suppliers| per bucket
        .groupby("supp")
        .agg(m=("m", "sum"), sd=("sd", "sum"), sd2=("sd2", "sum"))
        .reset_index()
    )
    agg = agg[agg["m"] >= 2]
    m = agg["m"].to_numpy(np.int64)
    sd = agg["sd"].to_numpy(np.int64)
    sd2 = agg["sd2"].to_numpy(np.int64)
    num = m.astype(object) * sd2.astype(object) - sd.astype(object) * sd.astype(object)
    var = np.array(
        [float(a) / float(b * b) for a, b in zip(num, m.astype(object))], np.float64
    )
    agg = agg.assign(
        var_micro=np.floor(var * 1e6 + 0.5).astype(np.int64)
    ).sort_values(["var_micro", "supp"], ascending=[False, True], kind="mergesort")
    top = agg.head(_SPREAD_TOPK)
    return pd.DataFrame(
        {
            "s_suppkey": top["supp"].to_numpy(np.int64),
            "n_items": top["m"].to_numpy(np.int64),
            "var_micro": top["var_micro"].to_numpy(np.int64),
        }
    )


ORACLES72["supplier_latency_spread"] = f"""
WITH d AS (
  SELECT l_suppkey AS s_suppkey,
         CAST(epoch_us(l_shipdate) // 86400000000
              - epoch_us(o_orderdate) // 86400000000 AS HUGEINT) AS d
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
),
a AS (
  SELECT s_suppkey, CAST(count(*) AS HUGEINT) AS m, sum(d) AS sd,
         sum(d * d) AS sd2
  FROM d GROUP BY 1 HAVING count(*) >= 2
),
v AS (
  SELECT s_suppkey, CAST(m AS BIGINT) AS n_items,
         CAST(floor(CAST(m * sd2 - sd * sd AS DOUBLE)
                    / CAST(m * m AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
           AS var_micro
  FROM a
)
SELECT s_suppkey, n_items, var_micro
FROM v ORDER BY var_micro DESC, s_suppkey ASC LIMIT {_SPREAD_TOPK}"""


# ---------------------------------------------------------------------------
# graph_kcore — 2-core membership after 5 synchronous peel rounds
# ---------------------------------------------------------------------------


def q_graph_kcore(sf_dir: str):
    """2-core decomposition of the symmetrized customer↔supplier graph (the
    LPA wave-57 encoding: customer c → 2c, supplier s → 2s+1): repeatedly
    drop nodes whose degree among SURVIVING nodes is < 2 — 5 synchronous
    rounds (documented fixed-round contract, like the repo's other iterative
    graph ops). Returns the surviving nodes.

    Scale shape: symmetric edges bucket-materialized ONCE by dst; each round
    is two BOUNDED bucket exchanges — (1) dst-side filter: edges meet the
    alive set where their dst lives; (2) src-side count: surviving edges
    re-bucket by src, degree ≥ k among alive srcs. Nothing reaches the
    driver."""
    import ray
    from ray.data.aggregate import Count

    B = np.uint64(32)

    def hb(a: np.ndarray) -> np.ndarray:
        return (a.astype(np.uint64) % B).astype(np.int32)

    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    l = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    )
    pairs = (
        l.join(o, join_type="inner", num_partitions=8,
               on=("l_orderkey",), right_on=("o_orderkey",))
        .groupby(["o_custkey", "l_suppkey"])
        .aggregate(Count(alias_name="_n"))
    )

    def symmetrize(t: pa.Table) -> pd.DataFrame:
        c = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64) * 2
        s = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64) * 2 + 1
        src = np.concatenate([c, s])
        dst = np.concatenate([s, c])
        return pd.DataFrame(
            {"src": src, "dst": dst, "alive": np.int64(-1), "_b": hb(dst)}
        )

    edges_b = pairs.map_batches(symmetrize, batch_format="pyarrow").materialize()

    def node_rows(df: pd.DataFrame) -> pd.DataFrame:
        n = np.unique(df["src"].to_numpy())
        return pd.DataFrame({"node": n.astype(np.int64), "_b": hb(n)})

    alive = (
        edges_b.map_batches(node_rows, batch_format="pandas")
        .groupby("_b")
        .map_groups(
            lambda g: pd.DataFrame({"node": np.unique(g["node"].to_numpy())}),
            batch_format="pandas",
        )
        .materialize()
    )

    def alive_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": np.int64(-1),
                "dst": df["node"].astype(np.int64),
                "alive": np.int64(1),
                "_b": hb(df["node"].to_numpy()),
            }
        )

    def dst_filter(g: pd.DataFrame) -> pd.DataFrame:
        ok = set(g.loc[(g["alive"] == 1).to_numpy(), "dst"].tolist())
        ed = g.loc[(g["alive"] == -1).to_numpy(), ["src", "dst"]]
        keep = ed[ed["dst"].isin(ok)]
        return pd.DataFrame(
            {
                "node": keep["src"].astype(np.int64),
                "deg": np.int64(1),
                "alive": np.int64(-1),
            }
        )

    def src_count(g: pd.DataFrame) -> pd.DataFrame:
        ok = g.loc[(g["alive"] == 1).to_numpy(), "node"]
        deg = (
            g.loc[(g["alive"] == -1).to_numpy()]
            .groupby("node", sort=False)["deg"]
            .sum()
        )
        surv = deg[(deg >= _KCORE_K) & deg.index.isin(ok)].index
        return pd.DataFrame({"node": np.sort(surv.to_numpy(np.int64))})

    def alive_rows2(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": df["node"].astype(np.int64),
                "deg": np.int64(0),
                "alive": np.int64(1),
                "_b": hb(df["node"].to_numpy()),
            }
        )

    for _ in range(_KCORE_ROUNDS):
        contrib = (
            edges_b.union(alive.map_batches(alive_rows, batch_format="pandas"))
            .groupby("_b")
            .map_groups(
                lambda g: dst_filter(g.drop(columns=["_b"])), batch_format="pandas"
            )
            .map_batches(
                lambda df: df.assign(_b=hb(df["node"].to_numpy())),
                batch_format="pandas",
            )
        )
        alive = (
            contrib.union(alive.map_batches(alive_rows2, batch_format="pandas"))
            .groupby("_b")
            .map_groups(
                lambda g: src_count(g.drop(columns=["_b"])), batch_format="pandas"
            )
            .materialize()
        )

    return alive.map_batches(
        lambda df: pd.DataFrame({"node": np.sort(df["node"].to_numpy(np.int64))}),
        batch_format="pandas",
    )


def _kcore_oracle(rounds: int = _KCORE_ROUNDS, k: int = _KCORE_K) -> str:
    steps = []
    prev = "a0"
    for r in range(1, rounds + 1):
        steps.append(
            f"""a{r} AS (
  SELECT e.src AS node
  FROM e JOIN {prev} x ON x.node = e.src JOIN {prev} y ON y.node = e.dst
  GROUP BY e.src HAVING count(*) >= {k}
)"""
        )
        prev = f"a{r}"
    chained = ",\n".join(steps)
    return f"""
WITH p AS (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
e AS (
  SELECT 2 * c AS src, 2 * s + 1 AS dst FROM p
  UNION ALL
  SELECT 2 * s + 1, 2 * c FROM p
),
a0 AS (SELECT DISTINCT src AS node FROM e),
{chained}
SELECT node FROM {prev}"""


ORACLES72["graph_kcore"] = _kcore_oracle()


QUERIES72 = {
    "supplier_latency_spread": q_supplier_latency_spread,
    "graph_kcore": q_graph_kcore,
}
