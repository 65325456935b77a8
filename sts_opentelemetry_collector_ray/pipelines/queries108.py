"""Driver-contract queries, wave 108 — residual quantization (two-level RQ
encode over seeded unit codebooks: the additive quantizer that halves PQ's
reconstruction error at the same bit budget) and next-order backtest (a
naive per-customer mean-gap forecaster evaluated on each customer's held-out
LAST order — the per-entity forecast-quality readout, PURE integer). Same
contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES108: dict[str, str] = {}

_RQ_DIM = 64
_RQ_K = 16
_NB_BUCKETS = 64
_DAY_US = 86_400_000_000


def _rq_codebooks() -> tuple[np.ndarray, np.ndarray]:
    """Two seeded full-dimension unit codebooks (data-independent, so the
    constants inline into a static SQL oracle like emb_pq's)."""
    from ..stages.similarity import _unit

    c1 = _unit(np.random.default_rng(2000).standard_normal((_RQ_K, _RQ_DIM)))
    c2 = _unit(np.random.default_rng(2001).standard_normal((_RQ_K, _RQ_DIM)))
    return c1, c2


# ---------------------------------------------------------------------------
# emb_rq — two-level residual-quantization codes
# ---------------------------------------------------------------------------


def q_emb_rq(sf_dir: str):
    """RQ encode: level-1 assigns each vector to its max-dot unit codeword
    (≡ min-L2); level-2 quantizes the RESIDUAL — its score decomposes as
    x·c₂ − (c₁·c₂), with the 16×16 cross-dot matrix a broadcast constant,
    so the SQL replay needs no list arithmetic on residuals. Ties → lowest
    code on both levels.

    Scale shape: codebooks + cross-dots are driver constants; one zero-copy
    flatten + two matmuls + one gather per batch; stateless tasks, zero
    shuffles."""
    from ..functions.vectors import stack_list_column

    c1, c2 = _rq_codebooks()
    cc = c1 @ c2.T  # (K, K) cross-dot constants

    def encode(t: pa.Table) -> pa.Table:
        v = stack_list_column(t["embedding"])
        d1 = v @ c1.T
        code1 = d1.argmax(axis=1).astype(np.int64)
        d2 = v @ c2.T - cc[code1]
        code2 = d2.argmax(axis=1).astype(np.int64)
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "code_1": pa.array(code1),
                "code_2": pa.array(code2),
                "packed": pa.array(code1 * _RQ_K + code2),
            }
        ).replace_schema_metadata(None)

    return ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(encode, batch_format="pyarrow")


def _rq_oracle() -> str:
    c1, c2 = _rq_codebooks()
    cc = c1 @ c2.T
    v1 = ",\n    ".join(
        f"({i}, [" + ", ".join(repr(float(x)) for x in c1[i]) + "])"
        for i in range(_RQ_K)
    )
    v2 = ",\n    ".join(
        f"({i}, [" + ", ".join(repr(float(x)) for x in c2[i]) + "])"
        for i in range(_RQ_K)
    )
    vcc = ",\n    ".join(
        f"({i}, {j}, {float(cc[i, j])!r})"
        for i in range(_RQ_K)
        for j in range(_RQ_K)
    )
    return f"""
WITH cb1(cid, c) AS (SELECT * FROM (VALUES
    {v1}) t(cid, c)),
cb2(cid, c) AS (SELECT * FROM (VALUES
    {v2}) t(cid, c)),
cc(c1, c2, d) AS (SELECT * FROM (VALUES
    {vcc}) t(c1, c2, d)),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
a1 AS (
  SELECT vec_id, v, cid AS code_1
  FROM (
    SELECT vec_id, v, cid,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY list_dot_product(v, c) DESC, cid ASC)
             AS r
    FROM e, cb1
  ) WHERE r = 1
),
a2 AS (
  SELECT vec_id, code_1, cid AS code_2
  FROM (
    SELECT a1.vec_id, a1.code_1, cb2.cid,
           row_number() OVER (PARTITION BY a1.vec_id
                              ORDER BY list_dot_product(a1.v, cb2.c) - cc.d
                                       DESC, cb2.cid ASC) AS r
    FROM a1 JOIN cc ON cc.c1 = a1.code_1, cb2
    WHERE cc.c2 = cb2.cid
  ) WHERE r = 1
)
SELECT vec_id, CAST(code_1 AS BIGINT) AS code_1,
       CAST(code_2 AS BIGINT) AS code_2,
       CAST(code_1 * {_RQ_K} + code_2 AS BIGINT) AS packed
FROM a2"""


ORACLES108["emb_rq"] = _rq_oracle()


# ---------------------------------------------------------------------------
# customer_next_order_backtest — naive mean-gap forecast vs held-out order
# ---------------------------------------------------------------------------


def q_customer_next_order_backtest(sf_dir: str):
    """Forecast backtest: for every customer with ≥3 orders, predict the
    held-out LAST inter-order gap as the mean of the earlier gaps
    ((d_{n−1} − d_0)·10⁶ // (n−2), a telescoping sum) and score the fleet
    MAE in micro-days — PURE integer end to end.

    Scale shape: order rows co-locate per customer through ONE
    custkey-bucket exchange (the sessionize shape); the per-bucket kernel
    is one lexsort + segment gathers; only (n_cust, Σ|err|) scalars leave
    each bucket."""

    def partial(t: pa.Table) -> pd.DataFrame:
        c = t["o_custkey"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "c": c,
                "d": t["o_orderdate"].cast(pa.int64()).to_numpy() // _DAY_US,
                "k": t["o_orderkey"].to_numpy().astype(np.int64),
                "_b": (c % _NB_BUCKETS).astype(np.int64),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        c = g["c"].to_numpy(np.int64)
        d = g["d"].to_numpy(np.int64)
        k = g["k"].to_numpy(np.int64)
        order = np.lexsort((k, d, c))
        c, d = c[order], d[order]
        first = np.r_[True, c[1:] != c[:-1]]
        starts = np.flatnonzero(first)
        ends = np.r_[starts[1:], len(c)]
        n = ends - starts
        ok = n >= 3
        s, e, nn = starts[ok], ends[ok], n[ok]
        d0, dm, dl = d[s], d[e - 2], d[e - 1]
        pred = (dm - d0) * 1_000_000 // (nn - 2)
        err = np.abs(pred - (dl - dm) * 1_000_000)
        return pd.DataFrame(
            {
                "n_cust": np.array([int(ok.sum())], np.int64),
                "abs_err": np.array([int(err.sum())], np.int64),
            }
        )

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: one scalar row per bucket
    )
    n = int(part["n_cust"].sum())
    s = int(part["abs_err"].sum())
    return pd.DataFrame(
        {
            "n_customers": np.array([n], np.int64),
            "mae_days_micro": np.array([s // max(n, 1)], np.int64),
        }
    )


ORACLES108["customer_next_order_backtest"] = f"""
WITH r AS (
  SELECT o_custkey,
         epoch_us(o_orderdate) // {_DAY_US} AS d,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn,
         count(*) OVER (PARTITION BY o_custkey) AS cnt
  FROM orders
),
sel AS (
  SELECT o_custkey,
         CAST(max(CASE WHEN rn = 1 THEN d END) AS HUGEINT) AS d0,
         CAST(max(CASE WHEN rn = cnt - 1 THEN d END) AS HUGEINT) AS dm,
         CAST(max(CASE WHEN rn = cnt THEN d END) AS HUGEINT) AS dl,
         CAST(max(cnt) AS HUGEINT) AS n
  FROM r WHERE cnt >= 3 GROUP BY 1
),
e AS (
  SELECT abs((dm - d0) * 1000000 // (n - 2) - (dl - dm) * 1000000) AS err
  FROM sel
)
SELECT CAST(count(*) AS BIGINT) AS n_customers,
       CAST(coalesce(sum(err), 0) // greatest(count(*), 1) AS BIGINT)
         AS mae_days_micro
FROM e"""


QUERIES108 = {
    "emb_rq": q_emb_rq,
    "customer_next_order_backtest": q_customer_next_order_backtest,
}
