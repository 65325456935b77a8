"""Driver-contract queries, wave 123 — per-dimension embedding variance
(dead-dimension screen: exact quantized moments per coordinate, ranked) and
split leakage (MinHash near-dup pairs that STRADDLE the fnv train/val split
— the eval-contamination check every benchmark pipeline needs). Same
contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES123: dict[str, str] = {}

_DV_DIM = 64
_DV_Q = 1_000_000  # per-value quantization before the exact moments


# ---------------------------------------------------------------------------
# emb_dim_variance — exact quantized per-dimension variance, ranked
# ---------------------------------------------------------------------------


def q_emb_dim_variance(sf_dir: str):
    """Dead dimensions: per coordinate, the population variance of the
    corpus values quantized at 1e-6 (floor-half-up per VALUE, then EXACT
    integer sums — order-free like the label-centroid trick), released as
    var_pico = (n·Σq² − (Σq)²) // n² in the quantized units², plus each
    dimension's variance rank (1 = liveliest; ties → lower dim).

    Scale shape: per-batch one flatten + two per-dim integer folds — 64
    partial rows per block — fold on the driver with Python ints."""
    from ..functions.vectors import stack_list_column

    def partial(t: pa.Table) -> pd.DataFrame:
        v = stack_list_column(t["embedding"])
        q = np.floor(v * _DV_Q + 0.5).astype(np.int64)
        return pd.DataFrame(
            {
                "dim": np.arange(_DV_DIM, dtype=np.int64),
                "s": q.sum(axis=0).astype(np.int64),
                "s2": (q.astype(object) ** 2).sum(axis=0),
                "n": np.int64(len(q)),
            }
        )

    part = (
        ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    rows = []
    for dim in range(_DV_DIM):
        g = part[part["dim"] == dim]
        n = int(g["n"].sum())
        s = int(sum(int(x) for x in g["s"]))
        s2 = int(sum(int(x) for x in g["s2"]))
        rows.append({"dim": dim, "var_pico": (n * s2 - s * s) // (n * n)})
    out = pd.DataFrame(rows)
    order = np.lexsort((out["dim"].to_numpy(), -out["var_pico"].to_numpy(object)))
    rank = np.empty(_DV_DIM, np.int64)
    rank[order] = np.arange(1, _DV_DIM + 1)
    out["var_rank"] = rank
    out["var_pico"] = out["var_pico"].astype(np.int64)
    return out.astype({"dim": np.int64, "var_rank": np.int64})


ORACLES123["emb_dim_variance"] = f"""
WITH x AS (
  SELECT CAST(u.i - 1 AS BIGINT) AS dim,
         CAST(floor(CAST(e.embedding[u.i] AS DOUBLE) * {_DV_Q} + 0.5)
              AS HUGEINT) AS q
  FROM embeddings e, unnest(range(1, {_DV_DIM + 1})) AS u(i)
),
m AS (
  SELECT dim, CAST(count(*) AS HUGEINT) AS n, CAST(sum(q) AS HUGEINT) AS s,
         CAST(sum(q * q) AS HUGEINT) AS s2
  FROM x GROUP BY 1
),
v AS (
  SELECT CAST(dim AS BIGINT) AS dim,
         CAST((n * s2 - s * s) // (n * n) AS BIGINT) AS var_pico
  FROM m
)
SELECT dim, var_pico,
       CAST(row_number() OVER (ORDER BY var_pico DESC, dim) AS BIGINT)
         AS var_rank
FROM v"""


# ---------------------------------------------------------------------------
# docs_split_leakage — near-dup pairs straddling the train/val split
# ---------------------------------------------------------------------------


def q_docs_split_leakage(sf_dir: str):
    """Eval contamination: of the MinHash-LSH near-dup pairs (the oracled
    wave-2 pipeline, Jaccard ≥ 0.5), how many CROSS the fnv1a32(doc_id)%100
    train/val split (the docs_split contract) — a crossing pair means the
    validation set contains a near-copy of a training doc.

    Scale shape: delegates to the banded MinHash pipeline (signature-only
    exchange, documented at its definition); the split labels derive per
    pair with two scalar hashes — no extra pass over text."""
    from ..functions.hashing import fnv1a32
    from ..stages.dedup_docs import minhash_lsh_pairs

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    pairs = minhash_lsh_pairs(ds, jaccard_threshold=0.5)
    if isinstance(pairs, ray.data.Dataset):
        pairs = pairs.to_pandas()
    n = len(pairs)
    if n == 0:
        cross = 0
    else:
        a_tr = np.array(
            [fnv1a32(str(int(x))) % 100 < 90 for x in pairs["a"]], bool
        )
        b_tr = np.array(
            [fnv1a32(str(int(x))) % 100 < 90 for x in pairs["b"]], bool
        )
        cross = int((a_tr != b_tr).sum())
    return pd.DataFrame(
        {
            "n_pairs": np.array([n], np.int64),
            "n_cross": np.array([cross], np.int64),
            "cross_bp": np.array([cross * 10_000 // max(n, 1)], np.int64),
        }
    )


def _leakage_oracle() -> str:
    # compose the EXISTING pair oracle so leakage can never drift from the
    # docs_minhash_pairs contract
    from .queries2 import ORACLES2

    pairs_sql = ORACLES2["docs_minhash_pairs"]
    fnv = (
        "list_reduce(list_prepend(2166136261::BIGINT, "
        "list_transform(string_split(CAST({col} AS VARCHAR), ''), "
        "c -> unicode(c)::BIGINT)), "
        "(acc, x) -> (xor(acc, x) * 16777619) % 4294967296) % 100 < 90"
    )
    return f"""
WITH pr AS ({pairs_sql}),
lab AS (
  SELECT a, b,
         ({fnv.format(col='a')}) AS a_tr,
         ({fnv.format(col='b')}) AS b_tr
  FROM pr
)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(coalesce(count(*) FILTER (a_tr <> b_tr), 0) AS BIGINT) AS n_cross,
       CAST(coalesce(count(*) FILTER (a_tr <> b_tr), 0) * 10000
            // greatest(count(*), 1) AS BIGINT) AS cross_bp
FROM lab"""


ORACLES123["docs_split_leakage"] = _leakage_oracle()


QUERIES123 = {
    "emb_dim_variance": q_emb_dim_variance,
    "docs_split_leakage": q_docs_split_leakage,
}
