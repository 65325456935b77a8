"""Driver-contract queries, wave 86 — sequential purchase pairs (part A in
an earlier order → part B in a strictly later order of the same customer,
counted by distinct customers: the sequential-pattern miner behind
recommendation candidates) and Johnson–Lindenstrauss distortion (a
deterministic ±1 projection 64→16 dims with an EXACT integer norm-ratio
report per label — the dimensionality-reduction QA readout). Same contract
as queries.py: column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES86: dict[str, str] = {}

_SEQ_BUCKETS = 32
_SEQ_PAIR_BUCKETS = 64
_SEQ_TOPK = 20
_DAY_US = 86_400_000_000
_JL_K = 16
_JL_DIM = 64
_JL_SCALE = 1 << 14  # smaller fixed point so ratio·1e6 stays in int64


def _jl_signs() -> np.ndarray:
    """Deterministic ±1 projection matrix: sign = parity of fnv1a32('r:c')."""
    from ..functions.hashing import fnv1a32

    s = np.empty((_JL_K, _JL_DIM), np.int64)
    for r in range(_JL_K):
        for c in range(_JL_DIM):
            s[r, c] = 1 if (fnv1a32(f"{r}:{c}") & 1) == 0 else -1
    return s


# ---------------------------------------------------------------------------
# orders_sequential_pairs — part A then part B across later orders
# ---------------------------------------------------------------------------


def q_orders_sequential_pairs(sf_dir: str):
    """Sequential pattern mining: the top-20 ordered part pairs (A, B) by the
    number of DISTINCT customers who bought A and then, on a strictly later
    order day, B (A ≠ B; each customer counts once per pair).

    Scale shape: lineitems dedup to (orderkey, part) per batch and share ONE
    orderkey-bucket exchange with orders to attach (customer, day); the
    per-customer pair expansion runs in a SECOND custkey-bucket exchange as a
    vectorized pandas self-merge (Σ items² per customer, bounded); pair
    counts re-reduce in a THIRD pair-hash exchange whose buckets own pairs
    completely and emit local top-20s — the driver merges ≤ 64·20 rows."""
    from ..functions.hashing import fnv1a64_array

    def li_rows(t: pa.Table) -> pd.DataFrame:
        g = pd.DataFrame(
            {
                "k": t["l_orderkey"].to_numpy().astype(np.int64),
                "p": t["l_partkey"].to_numpy().astype(np.int64),
            }
        ).drop_duplicates()
        g["c"] = np.int64(-1)
        g["d"] = np.int64(-1)
        g["_b"] = (g["k"].to_numpy(np.int64) % _SEQ_BUCKETS).astype(np.int64)
        return g

    def o_rows(t: pa.Table) -> pd.DataFrame:
        k = t["o_orderkey"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "k": k,
                "p": np.int64(-1),
                "c": t["o_custkey"].to_numpy().astype(np.int64),
                "d": t["o_orderdate"].cast(pa.int64()).to_numpy() // _DAY_US,
                "_b": (k % _SEQ_BUCKETS).astype(np.int64),
            }
        )

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        o = g.loc[(g["c"] >= 0).to_numpy(), ["k", "c", "d"]]
        li = g.loc[(g["c"] < 0).to_numpy(), ["k", "p"]]
        j = li.merge(o, on="k")[["c", "d", "p"]].drop_duplicates()
        j["_b"] = (j["c"].to_numpy(np.int64) % _SEQ_BUCKETS).astype(np.int64)
        return j

    def mine(g: pd.DataFrame) -> pd.DataFrame:
        jj = g[["c", "d", "p"]].drop_duplicates()
        m = jj.merge(jj, on="c", suffixes=("_a", "_b"))
        m = m[(m["d_b"] > m["d_a"]) & (m["p_a"] != m["p_b"])]
        pr = m[["c", "p_a", "p_b"]].drop_duplicates()
        cnt = (
            pr.groupby(["p_a", "p_b"], sort=False)
            .size()
            .reset_index(name="n")
        )
        cnt["n"] = cnt["n"].astype(np.int64)
        key = (
            cnt["p_a"].astype(str) + ":" + cnt["p_b"].astype(str)
        ).to_numpy(object)
        cnt["_b"] = (
            fnv1a64_array(key) % np.uint64(_SEQ_PAIR_BUCKETS)
        ).astype(np.int64)
        return cnt

    def pair_top(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["p_a", "p_b"], sort=False, as_index=False)["n"].sum()
        return out.sort_values(
            ["n", "p_a", "p_b"], ascending=[False, True, True], kind="mergesort"
        ).head(_SEQ_TOPK)

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).map_batches(li_rows, batch_format="pyarrow")
    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(o_rows, batch_format="pyarrow")
    part = (
        li.union(o)
        .groupby("_b")
        .map_groups(attach, batch_format="pandas")
        .groupby("_b")
        .map_groups(mine, batch_format="pandas")
        .groupby("_b")
        .map_groups(pair_top, batch_format="pandas")
        .to_pandas()  # bounded: ≤ 64·20 rows
        .sort_values(["n", "p_a", "p_b"], ascending=[False, True, True],
                     kind="mergesort")
        .head(_SEQ_TOPK)
        .reset_index(drop=True)
    )
    return pd.DataFrame(
        {
            "part_a": part["p_a"].to_numpy(np.int64),
            "part_b": part["p_b"].to_numpy(np.int64),
            "n_customers": part["n"].to_numpy(np.int64),
        }
    )


ORACLES86["orders_sequential_pairs"] = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
jj AS (
  SELECT DISTINCT o_custkey AS c,
         epoch_us(o_orderdate) // {_DAY_US} AS d, l_partkey AS p
  FROM li JOIN orders ON o_orderkey = l_orderkey
),
pr AS (
  SELECT DISTINCT a.c, a.p AS part_a, b.p AS part_b
  FROM jj a JOIN jj b ON b.c = a.c AND b.d > a.d AND b.p <> a.p
)
SELECT part_a, part_b, CAST(count(*) AS BIGINT) AS n_customers
FROM pr GROUP BY 1, 2
ORDER BY n_customers DESC, part_a ASC, part_b ASC LIMIT {_SEQ_TOPK}"""


# ---------------------------------------------------------------------------
# emb_jl_distortion — deterministic ±1 JL projection norm-ratio report
# ---------------------------------------------------------------------------


def q_emb_jl_distortion(sf_dir: str):
    """JL distortion QA: project 2⁻¹⁴-fixed-point vectors through the
    deterministic ±1 matrix (sign = fnv parity — a data-independent
    constant), and report per label the exact micro norm ratio
    r = (‖Px‖²·1e6) // (k·‖x‖²): floor-mean, min and max. r ≈ 1e6 means the
    projection preserves norms.

    Scale shape: the 16×64 sign matrix is a closure constant; each batch is
    one integer matmul + two square-sums and emits per-label (Σr, min, max,
    n) partials — the driver re-reduces |labels| rows."""
    from ..functions.vectors import stack_list_column

    S = _jl_signs()

    def partial(t: pa.Table) -> pd.DataFrame:
        v = stack_list_column(t["embedding"])
        q = np.floor(v * _JL_SCALE + 0.5).astype(np.int64)
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = q @ S.T  # exact int64: |y| ≤ 64·2^13
        spx = (y * y).sum(axis=1)
        sx = (q * q).sum(axis=1)
        den = _JL_K * sx
        r = np.where(den > 0, (spx * 1_000_000) // np.maximum(den, 1), 0)
        g = pd.DataFrame({"label": lab, "r": r}).groupby(
            "label", sort=False
        )["r"].agg(["sum", "min", "max", "size"])
        return pd.DataFrame(
            {
                "label": g.index.to_numpy(np.int64),
                "rs": g["sum"].to_numpy(np.int64),
                "rmin": g["min"].to_numpy(np.int64),
                "rmax": g["max"].to_numpy(np.int64),
                "n": g["size"].to_numpy(np.int64),
            }
        )

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: |labels| rows per block
        .groupby("label", as_index=False)
        .agg(rs=("rs", "sum"), rmin=("rmin", "min"), rmax=("rmax", "max"),
             n=("n", "sum"))
        .sort_values("label", kind="mergesort")
    )
    return pd.DataFrame(
        {
            "label": part["label"].to_numpy(np.int64),
            "n_vec": part["n"].to_numpy(np.int64),
            "mean_ratio_micro": part["rs"].to_numpy(np.int64)
            // part["n"].to_numpy(np.int64),
            "min_ratio_micro": part["rmin"].to_numpy(np.int64),
            "max_ratio_micro": part["rmax"].to_numpy(np.int64),
        }
    )


def _jl_oracle() -> str:
    S = _jl_signs()
    vals = ",\n    ".join(
        f"({r}, {c}, {int(S[r, c])})"
        for r in range(_JL_K)
        for c in range(_JL_DIM)
    )
    return f"""
WITH u AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label, CAST(g.i AS BIGINT) AS dim,
         CAST(floor(CAST(embedding[CAST(g.i AS INT) + 1] AS DOUBLE)
                    * {_JL_SCALE} + 0.5) AS BIGINT) AS q
  FROM embeddings CROSS JOIN range(0, {_JL_DIM}) g(i)
),
sgn(r, c, s) AS (SELECT * FROM (VALUES
    {vals}
)),
y AS (
  SELECT u.vec_id, u.label, sgn.r,
         sum(CAST(sgn.s * u.q AS HUGEINT)) AS yv
  FROM u JOIN sgn ON sgn.c = u.dim
  GROUP BY 1, 2, 3
),
px AS (SELECT vec_id, label, sum(yv * yv) AS spx FROM y GROUP BY 1, 2),
nx AS (
  SELECT vec_id, sum(CAST(q AS HUGEINT) * CAST(q AS HUGEINT)) AS sx
  FROM u GROUP BY 1
),
rt AS (
  SELECT px.label,
         CASE WHEN {_JL_K} * nx.sx > 0
              THEN (px.spx * 1000000) // ({_JL_K} * nx.sx) ELSE 0 END AS r
  FROM px JOIN nx ON nx.vec_id = px.vec_id
),
agg AS (
  SELECT label, sum(r) AS rs, min(r) AS rmin, max(r) AS rmax,
         CAST(count(*) AS HUGEINT) AS n
  FROM rt GROUP BY 1
)
SELECT label, CAST(n AS BIGINT) AS n_vec,
       CAST(rs // n AS BIGINT) AS mean_ratio_micro,
       CAST(rmin AS BIGINT) AS min_ratio_micro,
       CAST(rmax AS BIGINT) AS max_ratio_micro
FROM agg ORDER BY label"""


ORACLES86["emb_jl_distortion"] = _jl_oracle()


QUERIES86 = {
    "orders_sequential_pairs": q_orders_sequential_pairs,
    "emb_jl_distortion": q_emb_jl_distortion,
}
