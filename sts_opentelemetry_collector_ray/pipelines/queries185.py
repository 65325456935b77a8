"""Driver-contract queries, wave 185 — bipartite link prediction (Jaccard /
common-neighbor supplier pairs via shared parts) and a System-R join-size
estimation audit (estimated vs actual self-join cardinality per return flag).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES185: dict[str, str] = {}

_LP_PART_BUCKETS = 64  # co-location of a part's supplier set
_LP_PAIR_BUCKETS = 64  # pair-sum exchange
_JS_BUCKETS = 64  # per-partkey stats exchange


def _pair_bucket(a: np.ndarray, b: np.ndarray, nb: int) -> np.ndarray:
    return (
        ((a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) ^ b.astype(np.uint64))
        % np.uint64(nb)
    ).astype(np.int32)


# ---------------------------------------------------------------------------
# supplier_link_prediction — Jaccard link scores between suppliers via parts
# ---------------------------------------------------------------------------


def q_supplier_link_prediction(sf_dir: str):
    """Top-20 supplier pairs by Jaccard similarity of their part sets
    (common-neighbor link prediction over the part–supplier bipartite graph,
    Liben-Nowell & Kleinberg 2003): common parts, union size, and the Jaccard
    score in micro units; ORDER BY jacc_micro DESC, s1, s2.

    Scale shape: distinct (part, supplier) edges ride ONE part-bucket
    exchange (a part's supplier set co-locates, pairs enumerate with the
    bounded lag loop); pair partials ride a second pair-hash exchange with
    per-bucket exact sums + local top-k (a pair lives in exactly one
    bucket); supplier degrees are dimension-sized and broadcast via a
    sorted-key searchsorted array. Driver residue: buckets × 20 rows."""
    path = f"{sf_dir}/lineitem.parquet"

    def edge_partial(t: pa.Table) -> pd.DataFrame:
        df = (
            t.select(["l_partkey", "l_suppkey"]).to_pandas().drop_duplicates()
        )
        df["_b"] = (df["l_partkey"].to_numpy() % _LP_PART_BUCKETS).astype(np.int32)
        return df

    edges = (
        ray.data.read_parquet(path, columns=["l_partkey", "l_suppkey"])
        .map_batches(edge_partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(lambda g: g.drop_duplicates(), batch_format="pandas")
        .materialize()  # E rows × 20 B; consumed by degrees AND pairs
    )

    # degrees: suppliers are dimension-sized → driver fold + searchsorted
    def degree_partial(t: pa.Table) -> pa.Table:
        s, c = np.unique(t["l_suppkey"].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({"s": pa.array(s), "c": pa.array(c.astype(np.int64))})

    degp = edges.map_batches(degree_partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "s1": pd.Series([], dtype=np.int64),
            "s2": pd.Series([], dtype=np.int64),
            "common": pd.Series([], dtype=np.int64),
            "n_union": pd.Series([], dtype=np.int64),
            "jacc_micro": pd.Series([], dtype=np.int64),
        }
    )
    if degp.empty:
        return empty
    deg = degp.groupby("s")["c"].sum().sort_index()
    deg_keys = deg.index.to_numpy(np.int64)
    deg_vals = deg.to_numpy(np.int64)

    # pairs: each part's (sorted) supplier list is contiguous in one bucket;
    # enumeration MUST see a whole bucket (map_groups, never map_batches)
    def part_pairs(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["l_partkey", "l_suppkey"], kind="mergesort")
        pk = d["l_partkey"].to_numpy()
        sk = d["l_suppkey"].to_numpy()
        us, vs = [], []
        _, counts = np.unique(pk, return_counts=True)
        for lag in range(1, int(counts.max()) if len(counts) else 1):
            same = pk[lag:] == pk[:-lag]
            if not same.any():
                break
            us.append(sk[:-lag][same])  # sorted within part ⇒ s1 < s2
            vs.append(sk[lag:][same])
        if not us:
            return pd.DataFrame(
                {
                    "s1": np.array([], np.int64),
                    "s2": np.array([], np.int64),
                    "common": np.array([], np.int64),
                    "_pb": np.array([], np.int32),
                }
            )
        out = (
            pd.DataFrame({"s1": np.concatenate(us), "s2": np.concatenate(vs)})
            .groupby(["s1", "s2"], sort=False, as_index=False)
            .size()
            .rename(columns={"size": "common"})
        )
        out["_pb"] = _pair_bucket(
            out["s1"].to_numpy(), out["s2"].to_numpy(), _LP_PAIR_BUCKETS
        )
        return out.astype({"common": np.int64})

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        agg = (
            g.groupby(["s1", "s2"], sort=False, as_index=False)["common"]
            .sum()
            .astype({"common": np.int64})
        )
        d1 = deg_vals[np.searchsorted(deg_keys, agg["s1"].to_numpy(np.int64))]
        d2 = deg_vals[np.searchsorted(deg_keys, agg["s2"].to_numpy(np.int64))]
        agg["n_union"] = (d1 + d2 - agg["common"].to_numpy()).astype(np.int64)
        agg["jacc_micro"] = np.floor(
            agg["common"].to_numpy(np.float64)
            / agg["n_union"].to_numpy(np.float64)
            * 1_000_000.0
            + 0.5
        ).astype(np.int64)
        return agg.sort_values(
            ["jacc_micro", "s1", "s2"], ascending=[False, True, True], kind="mergesort"
        ).head(20)

    part = (
        edges.groupby("_b")
        .map_groups(part_pairs, batch_format="pandas")
        .groupby("_pb")
        .map_groups(bucket_topk, batch_format="pandas")
        .to_pandas()
    )
    if part.empty:
        return empty
    out = part.sort_values(
        ["jacc_micro", "s1", "s2"], ascending=[False, True, True], kind="mergesort"
    ).head(20)
    cols = ["s1", "s2", "common", "n_union", "jacc_micro"]
    return out[cols].reset_index(drop=True).astype(np.int64)


ORACLES185["supplier_link_prediction"] = """
WITH ps AS (SELECT DISTINCT l_partkey AS pk, l_suppkey AS s FROM lineitem),
deg AS (SELECT s, count(*) AS d FROM ps GROUP BY 1),
pairs AS (
  SELECT a.s AS s1, b.s AS s2, count(*) AS common
  FROM ps a JOIN ps b ON a.pk = b.pk AND a.s < b.s GROUP BY 1, 2
),
j AS (
  SELECT s1, s2, common, d1.d + d2.d - common AS n_union
  FROM pairs
  JOIN deg d1 ON pairs.s1 = d1.s
  JOIN deg d2 ON pairs.s2 = d2.s
)
SELECT CAST(s1 AS BIGINT) AS s1, CAST(s2 AS BIGINT) AS s2,
       CAST(common AS BIGINT) AS common, CAST(n_union AS BIGINT) AS n_union,
       CAST(floor(CAST(common AS DOUBLE) / CAST(n_union AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS jacc_micro
FROM j ORDER BY jacc_micro DESC, s1 ASC, s2 ASC LIMIT 20"""


# ---------------------------------------------------------------------------
# join_size_estimate — System-R join-cardinality estimation audit
# ---------------------------------------------------------------------------


def q_join_size_estimate(sf_dir: str):
    """Optimizer-statistics audit: for each l_returnflag, the System-R
    estimate of |lineitem_flag ⋈_partkey lineitem| (n_R·n_S / max(V_R, V_S),
    Selinger et al. 1979) versus the ACTUAL self-join cardinality, plus the
    relative error in micro units.

    Scale shape: per-batch (flag, partkey, n) combiner → ONE partkey-bucket
    exchange (a part's counts co-locate, so per-flag Σ n_f(pk)·n(pk) and the
    distinct-part tallies are exact per bucket) → driver folds buckets ×
    (|flags|+1) summary rows."""
    path = f"{sf_dir}/lineitem.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        df = (
            t.select(["l_returnflag", "l_partkey"])
            .to_pandas()
            .groupby(["l_returnflag", "l_partkey"], sort=False, as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        df["_b"] = (df["l_partkey"].to_numpy() % _JS_BUCKETS).astype(np.int32)
        return df.astype({"n": np.int64})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        c = (
            g.groupby(["l_returnflag", "l_partkey"], sort=False, as_index=False)["n"]
            .sum()
        )
        tot = c.groupby("l_partkey")["n"].sum()
        nt = tot.loc[c["l_partkey"]].to_numpy(np.int64)
        c["actual"] = c["n"].to_numpy(np.int64) * nt
        per_f = c.groupby("l_returnflag", as_index=False).agg(
            n_rows=("n", "sum"), v=("l_partkey", "size"), actual=("actual", "sum")
        )
        allr = pd.DataFrame(
            {
                "l_returnflag": ["\x00all"],
                "n_rows": [int(tot.sum())],
                "v": [len(tot)],
                "actual": [0],
            }
        )
        return pd.concat([per_f, allr], ignore_index=True).astype(
            {"n_rows": np.int64, "v": np.int64, "actual": np.int64}
        )

    part = (
        ray.data.read_parquet(path, columns=["l_returnflag", "l_partkey"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    empty = pd.DataFrame(
        {
            "l_returnflag": pd.Series([], dtype=object),
            "n_rows": pd.Series([], dtype=np.int64),
            "n_distinct_pk": pd.Series([], dtype=np.int64),
            "actual_rows": pd.Series([], dtype=np.int64),
            "est_rows": pd.Series([], dtype=np.int64),
            "err_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    g = part.groupby("l_returnflag", as_index=False).sum()
    allrow = g[g["l_returnflag"] == "\x00all"]
    n_all = int(allrow["n_rows"].iloc[0])
    v_all = int(allrow["v"].iloc[0])
    g = g[g["l_returnflag"] != "\x00all"].sort_values("l_returnflag").reset_index(
        drop=True
    )
    vmax = np.maximum(g["v"].to_numpy(np.int64), v_all).astype(np.float64)
    est = np.floor(
        g["n_rows"].to_numpy(np.float64) * np.float64(n_all) / vmax
    ).astype(np.int64)
    actual = g["actual"].to_numpy(np.int64)
    err = np.floor(
        np.abs(est - actual).astype(np.float64)
        / actual.astype(np.float64)
        * 1_000_000.0
        + 0.5
    ).astype(np.int64)
    return pd.DataFrame(
        {
            "l_returnflag": g["l_returnflag"].to_numpy(object),
            "n_rows": g["n_rows"].to_numpy(np.int64),
            "n_distinct_pk": g["v"].to_numpy(np.int64),
            "actual_rows": actual,
            "est_rows": est,
            "err_micro": err,
        }
    )


ORACLES185["join_size_estimate"] = """
WITH c AS (
  SELECT l_returnflag, l_partkey AS pk, count(*) AS n
  FROM lineitem GROUP BY 1, 2
),
tot AS (SELECT pk, sum(n) AS nt FROM c GROUP BY 1),
g AS (SELECT CAST(sum(nt) AS BIGINT) AS n_all, CAST(count(*) AS BIGINT) AS v_all FROM tot),
per AS (
  SELECT c.l_returnflag,
         CAST(sum(c.n) AS BIGINT) AS n_rows,
         CAST(count(*) AS BIGINT) AS v,
         CAST(sum(c.n * tot.nt) AS BIGINT) AS actual
  FROM c JOIN tot ON c.pk = tot.pk GROUP BY 1
),
e AS (
  SELECT per.l_returnflag, per.n_rows, per.v AS n_distinct_pk, per.actual,
         CAST(floor(CAST(per.n_rows AS DOUBLE) * CAST(g.n_all AS DOUBLE)
                    / CAST(greatest(per.v, g.v_all) AS DOUBLE)) AS BIGINT) AS est
  FROM per, g
)
SELECT l_returnflag, n_rows, n_distinct_pk,
       actual AS actual_rows, est AS est_rows,
       CAST(floor(abs(CAST(est - actual AS DOUBLE))
                  / CAST(actual AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS err_micro
FROM e ORDER BY l_returnflag"""


QUERIES185 = {
    "supplier_link_prediction": q_supplier_link_prediction,
    "join_size_estimate": q_join_size_estimate,
}
