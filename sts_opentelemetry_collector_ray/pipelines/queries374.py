"""Driver-contract queries, wave 374 — Johnson-Lindenstrauss random-
projection distortion audit over embeddings (deterministic FNV sign
matrix, sequential-fold float mirroring) and the market-segment x
order-priority association (chi-square + Cramer's V via a bucketed
custkey merge). Same contract as queries.py: column names AND dtypes
match the DuckDB oracle exactly."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES374: dict[str, str] = {}

_JL_SAMPLE = 100
_JL_K = 8
_AS_BUCKETS = 64


def _fnv32(key: str) -> int:
    acc = 2166136261
    for ch in key:
        acc = ((acc ^ ord(ch)) * 16777619) % 4294967296
    return acc


def _fold(vals) -> float:
    acc = 0.0
    for v in vals:
        acc = acc + float(v)
    return acc


# ---------------------------------------------------------------------------
# emb_jl_pair_distortion — random projection distance distortion
# ---------------------------------------------------------------------------


def q_emb_jl_pair_distortion(sf_dir: str):
    """JL audit: the 100 lowest vec_ids project from d dims to k = 8
    via a deterministic +-1 matrix (sign of FNV('i#j') parity); for
    every pair the squared-distance ratio d2_proj / (k * d2_orig)
    should hug 1. All float folds run sequentially in dim / pair order
    on both sides. One row: n_vecs, dim, k, mean_abs_dev_micro,
    max_abs_dev_micro."""

    sample = (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        .to_pandas()
        .sort_values("vec_id")
        .head(_JL_SAMPLE)
    )
    cols = ["n_vecs", "dim", "k", "mean_abs_dev_micro",
            "max_abs_dev_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    m = len(sample)
    if m < 3:
        return empty
    vecs = [np.asarray(e, np.float64) for e in sample["embedding"]]
    d = len(vecs[0])
    signs = np.array(
        [[2 * (_fnv32(f"{i}#{j}") % 2) - 1 for i in range(d)]
         for j in range(_JL_K)],
        np.float64,
    )
    proj = []
    for v in vecs:
        pv = []
        for j in range(_JL_K):
            pv.append(_fold(signs[j][i] * v[i] for i in range(d)))
        proj.append(pv)
    devs = []
    for a, b in itertools.combinations(range(m), 2):
        d2o = _fold(
            (vecs[a][i] - vecs[b][i]) * (vecs[a][i] - vecs[b][i])
            for i in range(d)
        )
        if d2o <= 0.0:
            continue
        d2p = _fold(
            (proj[a][j] - proj[b][j]) * (proj[a][j] - proj[b][j])
            for j in range(_JL_K)
        )
        devs.append(abs(d2p / (float(_JL_K) * d2o) - 1.0))
    if not devs:
        return empty
    mean_dev = _fold(devs) / float(len(devs))
    max_dev = max(devs)
    return pd.DataFrame(
        [
            (
                np.int64(m), np.int64(d), np.int64(_JL_K),
                np.int64(np.floor(mean_dev * 1_000_000.0 + 0.5)),
                np.int64(np.floor(max_dev * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


_JL_SIGN_SQL = (
    "(2 * (list_reduce(list_prepend(2166136261::BIGINT, "
    "list_transform(string_split("
    "CAST(i AS VARCHAR) || '#' || CAST(j AS VARCHAR), ''), "
    "c -> unicode(c)::BIGINT)), "
    "(acc, x) -> (xor(acc, x) * 16777619) % 4294967296) % 2) - 1)"
)

ORACLES374["emb_jl_pair_distortion"] = f"""
WITH sample AS (
  SELECT vec_id, embedding,
         row_number() OVER (ORDER BY vec_id) AS rn
  FROM embeddings QUALIFY rn <= {_JL_SAMPLE}
),
dims AS (
  SELECT vec_id, CAST(r.range AS BIGINT) AS i,
         CAST(embedding[CAST(r.range AS BIGINT) + 1] AS DOUBLE) AS v
  FROM sample, range(0, 4096) r
  WHERE r.range < len(embedding)
),
meta AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
         (SELECT CAST(max(i) + 1 AS BIGINT) FROM dims) AS d
  FROM sample
),
proj AS (
  SELECT dims.vec_id, j.j,
         list_reduce(list_prepend(0.0,
           list({_JL_SIGN_SQL} * dims.v ORDER BY dims.i)),
           (a, b) -> a + b) AS p
  FROM dims,
       (SELECT CAST(r.range AS BIGINT) AS j
        FROM range(0, {_JL_K}) r) j
  GROUP BY 1, 2
),
pairs AS (
  SELECT a.vec_id AS va, b.vec_id AS vb
  FROM sample a JOIN sample b ON a.vec_id < b.vec_id
),
d2o AS (
  SELECT p.va, p.vb,
         list_reduce(list_prepend(0.0,
           list((da.v - db.v) * (da.v - db.v) ORDER BY da.i)),
           (x, y) -> x + y) AS s
  FROM pairs p
  JOIN dims da ON da.vec_id = p.va
  JOIN dims db ON db.vec_id = p.vb AND db.i = da.i
  GROUP BY 1, 2
),
d2p AS (
  SELECT p.va, p.vb,
         list_reduce(list_prepend(0.0,
           list((pa.p - pb.p) * (pa.p - pb.p) ORDER BY pa.j)),
           (x, y) -> x + y) AS s
  FROM pairs p
  JOIN proj pa ON pa.vec_id = p.va
  JOIN proj pb ON pb.vec_id = p.vb AND pb.j = pa.j
  GROUP BY 1, 2
),
devs AS (
  SELECT d2o.va, d2o.vb,
         abs(d2p.s / ({_JL_K}.0 * d2o.s) - 1.0) AS dev
  FROM d2o JOIN d2p USING (va, vb)
  WHERE d2o.s > 0
),
f AS (
  SELECT meta.m, meta.d,
         (SELECT list_reduce(list_prepend(0.0,
                   list(dev ORDER BY va, vb)), (x, y) -> x + y)
          FROM devs) AS sum_dev,
         (SELECT CAST(count(*) AS BIGINT) FROM devs) AS np,
         (SELECT max(dev) FROM devs) AS max_dev
  FROM meta
  WHERE meta.m >= 3
)
SELECT m AS n_vecs, d AS dim, CAST({_JL_K} AS BIGINT) AS k,
       CAST(floor(sum_dev / np * 1000000.0 + 0.5) AS BIGINT)
         AS mean_abs_dev_micro,
       CAST(floor(max_dev * 1000000.0 + 0.5) AS BIGINT)
         AS max_abs_dev_micro
FROM f
WHERE np > 0"""


# ---------------------------------------------------------------------------
# orders_segment_priority_assoc — segment x priority chi-square
# ---------------------------------------------------------------------------


def q_orders_segment_priority_assoc(sf_dir: str):
    """Do market segments order with different priorities? The
    (mktsegment, orderpriority) contingency table via a bucketed
    custkey merge; chi-square with exact integer observed counts and
    mirrored float expecteds; Cramer's V. One row: n, n_segments,
    n_priorities, chi2_micro, cramers_v_micro."""

    def o_partial(t: pa.Table) -> pd.DataFrame:
        k = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        out = pd.DataFrame(
            {
                "k": k,
                "pri": t["o_orderpriority"].to_numpy(zero_copy_only=False),
                "seg": "",
            }
        )
        out["_b"] = (out["k"] % _AS_BUCKETS).astype(np.int64)
        out["_src"] = np.int64(0)
        return out[["_b", "_src", "k", "pri", "seg"]]

    def c_partial(t: pa.Table) -> pd.DataFrame:
        k = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        out = pd.DataFrame(
            {
                "k": k,
                "pri": "",
                "seg": t["c_mktsegment"].to_numpy(zero_copy_only=False),
            }
        )
        out["_b"] = (out["k"] % _AS_BUCKETS).astype(np.int64)
        out["_src"] = np.int64(1)
        return out[["_b", "_src", "k", "pri", "seg"]]

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    ).map_batches(o_partial, batch_format="pyarrow")
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(c_partial, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        zero = pd.DataFrame(
            {
                "seg": pd.Series([], dtype=object),
                "pri": pd.Series([], dtype=object),
                "c": pd.Series([], dtype=np.int64),
            }
        )
        o = g[g["_src"] == 0]
        c = g[g["_src"] == 1]
        if len(o) == 0 or len(c) == 0:
            return zero
        segmap = c.set_index("k")["seg"]
        o = o.assign(seg=o["k"].map(segmap)).dropna(subset=["seg"])
        if o.empty:
            return zero
        out = (
            o.groupby(["seg", "pri"])
            .size()
            .rename("c")
            .reset_index()
        )
        out["c"] = out["c"].astype(np.int64)
        return out

    table = (
        orders.union(cust)
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .groupby(["seg", "pri"])["c"]
        .sum()
        .reset_index()
    )
    cols = ["n", "n_segments", "n_priorities", "chi2_micro",
            "cramers_v_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if table.empty:
        return empty
    n = int(table["c"].sum())
    rows_m = table.groupby("seg")["c"].sum()
    cols_m = table.groupby("pri")["c"].sum()
    r, k = len(rows_m), len(cols_m)
    if r < 2 or k < 2 or n == 0:
        return empty
    obs = {
        (s_, p_): int(c_)
        for s_, p_, c_ in zip(table["seg"], table["pri"], table["c"])
    }
    chi2 = 0.0
    for s_ in sorted(rows_m.index):
        for p_ in sorted(cols_m.index):
            e = float(int(rows_m[s_])) * float(int(cols_m[p_])) / float(n)
            o_ = float(obs.get((s_, p_), 0))
            chi2 = chi2 + (o_ - e) * (o_ - e) / e
    v = float(np.sqrt(chi2 / (float(n) * float(min(r, k) - 1))))
    return pd.DataFrame(
        [
            (
                np.int64(n), np.int64(r), np.int64(k),
                np.int64(np.floor(chi2 * 1_000_000.0 + 0.5)),
                np.int64(np.floor(v * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES374["orders_segment_priority_assoc"] = """
WITH j AS (
  SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
),
t AS (SELECT seg, pri, CAST(count(*) AS BIGINT) AS c FROM j GROUP BY 1, 2),
nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM t),
rm AS (SELECT seg, CAST(sum(c) AS BIGINT) AS c FROM t GROUP BY 1),
cm AS (SELECT pri, CAST(sum(c) AS BIGINT) AS c FROM t GROUP BY 1),
cells AS (
  SELECT rm.seg, cm.pri, rm.c AS rc, cm.c AS cc,
         coalesce(t.c, 0) AS o
  FROM rm CROSS JOIN cm
  LEFT JOIN t ON t.seg = rm.seg AND t.pri = cm.pri
),
chi AS (
  SELECT list_reduce(list_prepend(0.0,
           list((CAST(o AS DOUBLE)
                 - CAST(rc AS DOUBLE) * cc / nn.n)
                * (CAST(o AS DOUBLE)
                   - CAST(rc AS DOUBLE) * cc / nn.n)
                / (CAST(rc AS DOUBLE) * cc / nn.n)
                ORDER BY seg, pri)),
           (a, b) -> a + b) AS chi2,
         (SELECT CAST(count(*) AS BIGINT) FROM rm) AS r,
         (SELECT CAST(count(*) AS BIGINT) FROM cm) AS k,
         nn.n
  FROM cells, nn
  GROUP BY nn.n
)
SELECT n, r AS n_segments, k AS n_priorities,
       CAST(floor(chi2 * 1000000.0 + 0.5) AS BIGINT) AS chi2_micro,
       CAST(floor(sqrt(chi2 / (CAST(n AS DOUBLE) * (least(r, k) - 1)))
                  * 1000000.0 + 0.5) AS BIGINT) AS cramers_v_micro
FROM chi
WHERE r >= 2 AND k >= 2 AND n > 0"""


QUERIES374 = {
    "emb_jl_pair_distortion": q_emb_jl_pair_distortion,
    "orders_segment_priority_assoc": q_orders_segment_priority_assoc,
}
