"""Driver-contract queries, wave 281 — pairwise-cosine census over a
bounded embedding sample (bit-exact dimension-sequential dots, binned
into 20 cosine buckets) and per-dimension skewness/excess-kurtosis of
the embedding coordinates from micro-quantized EXACT integer moments.
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES281: dict[str, str] = {}

_PC_MAX_ID = 256  # bounded sample: vectors with vec_id < 256


# ---------------------------------------------------------------------------
# emb_pair_cosine_census — binned all-pairs cosine over a bounded sample
# ---------------------------------------------------------------------------


def q_emb_pair_cosine_census(sf_dir: str):
    """All-pairs cosine census over the bounded sample vec_id < 256:
    cos = dot(a,b)/(sqrt(dot(a,a)) sqrt(dot(b,b))) with
    dimension-sequential float64 accumulation (bit-identical to DuckDB's
    left-to-right list_dot_product, the `emb_pq_distortion` idiom), then
    bin = clamp(floor((cos+1) 10), 0, 19). Per bin: bin, n_pairs,
    share_micro.

    Scale shape: the sample is id-bounded by construction (broadcast
    once at any corpus size); the quadratic census never touches the
    full table."""

    import pyarrow.compute as pc

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(t["vec_id"], _PC_MAX_ID))

    t = (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        .map_batches(keep, batch_format="pyarrow")
        .to_pandas()  # id-bounded sample
        .sort_values("vec_id")
    )
    cols = ["bin", "n_pairs", "share_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if len(t) < 2:
        return empty
    v = np.stack([np.asarray(e) for e in t["embedding"]]).astype(np.float64)
    n, d = v.shape
    # dimension-sequential dots (mirrors list_dot_product order)
    norms2 = np.zeros(n)
    dots = np.zeros((n, n))
    for j in range(d):
        norms2 = norms2 + v[:, j] * v[:, j]
        dots = dots + v[:, j][:, None] * v[None, :, j]
    iu = np.triu_indices(n, k=1)
    cos = dots[iu] / (np.sqrt(norms2)[iu[0]] * np.sqrt(norms2)[iu[1]])
    b = np.clip(np.floor((cos + 1.0) * 10.0), 0, 19).astype(np.int64)
    h = pd.Series(b).groupby(b).size()
    total = int(h.sum())
    return pd.DataFrame(
        {
            "bin": h.index.to_numpy(np.int64),
            "n_pairs": h.to_numpy(np.int64),
            "share_micro": np.floor(
                h.to_numpy(np.int64).astype(np.float64) / float(total)
                * 1_000_000.0 + 0.5
            ).astype(np.int64),
        }
    )[cols]


ORACLES281["emb_pair_cosine_census"] = f"""
WITH s AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id < {_PC_MAX_ID}
),
pairs AS (
  SELECT list_dot_product(a.v, b.v)
           / (sqrt(list_dot_product(a.v, a.v))
              * sqrt(list_dot_product(b.v, b.v))) AS cos
  FROM s a JOIN s b ON a.vec_id < b.vec_id
),
binned AS (
  SELECT CAST(least(greatest(floor((cos + 1.0) * 10.0), 0), 19) AS BIGINT)
           AS bin
  FROM pairs
),
h AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_pairs FROM binned GROUP BY 1),
tot AS (SELECT CAST(sum(n_pairs) AS BIGINT) AS t FROM h)
SELECT h.bin, h.n_pairs,
       CAST(floor(CAST(h.n_pairs AS DOUBLE) / CAST(tot.t AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS share_micro
FROM h, tot
ORDER BY h.bin"""


# ---------------------------------------------------------------------------
# emb_dim_kurtosis — per-dimension shape from exact integer moments
# ---------------------------------------------------------------------------


def q_emb_dim_kurtosis(sf_dir: str):
    """Per-dimension skewness and excess kurtosis of the embedding
    coordinates: values quantize to micro-units (floor(x 1e6 + 0.5), an
    EXACT integer), the four raw moments fold as arbitrary-precision
    integers (HUGEINT in SQL), and the centered-moment compositions are
    the only float steps. Per dim: dim, n_vec, skew_micro, kurt_micro.

    Scale shape: per-batch (dim -> integer moment) combiners; the
    driver folds dims x 4 scalars."""
    from ..functions.vectors import stack_list_column

    def partial(t: pa.Table) -> pd.DataFrame:
        v = stack_list_column(t["embedding"])
        xi = np.floor(v * 1_000_000.0 + 0.5).astype(np.int64).astype(object)
        s1 = xi.sum(axis=0)
        s2 = (xi * xi).sum(axis=0)
        s3 = (xi * xi * xi).sum(axis=0)
        s4 = (xi * xi * xi * xi).sum(axis=0)
        d = v.shape[1]
        return pd.DataFrame(
            {
                "dim": np.arange(d, dtype=np.int64),
                "n": np.int64(v.shape[0]),
                "s1": s1, "s2": s2, "s3": s3, "s4": s4,
            }
        )

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["embedding"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["dim", "n_vec", "skew_micro", "kurt_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if part.empty:
        return empty
    g = part.groupby("dim").agg(
        n=("n", "sum"),
        s1=("s1", lambda s: int(sum(int(x) for x in s))),
        s2=("s2", lambda s: int(sum(int(x) for x in s))),
        s3=("s3", lambda s: int(sum(int(x) for x in s))),
        s4=("s4", lambda s: int(sum(int(x) for x in s))),
    )
    rows = []
    for dim, r in g.iterrows():
        n = float(int(r["n"]))
        s1, s2, s3, s4 = (
            float(int(r["s1"])), float(int(r["s2"])),
            float(int(r["s3"])), float(int(r["s4"])),
        )
        m = s1 / n
        m2 = s2 / n - m * m
        if m2 <= 0.0:
            continue
        m3 = s3 / n - 3.0 * m * s2 / n + 2.0 * m * m * m
        m4 = (
            s4 / n - 4.0 * m * s3 / n + 6.0 * m * m * s2 / n
            - 3.0 * m * m * m * m
        )
        skew = m3 / (m2 * np.sqrt(m2))
        kurt = m4 / (m2 * m2) - 3.0
        rows.append(
            (
                np.int64(dim), np.int64(int(r["n"])),
                np.int64(np.floor(skew * 1_000_000.0 + 0.5)),
                np.int64(np.floor(kurt * 1_000_000.0 + 0.5)),
            )
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols}
    )


ORACLES281["emb_dim_kurtosis"] = """
WITH dd AS (SELECT len(embedding) AS d FROM embeddings LIMIT 1),
dims AS (
  SELECT CAST(r.range AS BIGINT) AS dim
  FROM range(0, 4096) r, dd WHERE r.range < dd.d
),
vals AS (
  SELECT dims.dim,
         CAST(floor(CAST(e.embedding[CAST(dims.dim + 1 AS INT)] AS DOUBLE)
                    * 1000000.0 + 0.5) AS BIGINT) AS x
  FROM embeddings e CROSS JOIN dims
),
m AS (
  SELECT dim, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS s1,
         CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS s2,
         CAST(sum(CAST(x AS HUGEINT) * x * x) AS HUGEINT) AS s3,
         CAST(sum(CAST(x AS HUGEINT) * x * x * x) AS HUGEINT) AS s4
  FROM vals GROUP BY 1
),
c AS (
  SELECT dim, n,
         CAST(s1 AS DOUBLE) / n AS mu,
         CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n)
           * (CAST(s1 AS DOUBLE) / n) AS m2,
         CAST(s2 AS DOUBLE) AS s2d, CAST(s3 AS DOUBLE) AS s3d,
         CAST(s4 AS DOUBLE) AS s4d
  FROM m
),
sh AS (
  SELECT dim, n, m2,
         s3d / n - 3.0 * mu * s2d / n + 2.0 * mu * mu * mu AS m3,
         s4d / n - 4.0 * mu * s3d / n + 6.0 * mu * mu * s2d / n
           - 3.0 * mu * mu * mu * mu AS m4
  FROM c
)
SELECT dim, n AS n_vec,
       CAST(floor(m3 / (m2 * sqrt(m2)) * 1000000.0 + 0.5) AS BIGINT)
         AS skew_micro,
       CAST(floor((m4 / (m2 * m2) - 3.0) * 1000000.0 + 0.5) AS BIGINT)
         AS kurt_micro
FROM sh
WHERE m2 > 0
ORDER BY dim"""


QUERIES281 = {
    "emb_pair_cosine_census": q_emb_pair_cosine_census,
    "emb_dim_kurtosis": q_emb_dim_kurtosis,
}
