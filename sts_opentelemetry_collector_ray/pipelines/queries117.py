"""Driver-contract queries, wave 117 — Page–Hinkley drift detection (the
alert-LATENCY companion to the wave-44 CUSUM changepoint: the first day the
cumulative upward deviation of daily counts clears the threshold, PURE
integer on the dense grid) and PQ reconstruction distortion (mean squared
error of the wave-54 product-quantization codes per subspace — the
quantization-quality readout that justifies the bit budget). Same contract
as queries.py: column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES117: dict[str, str] = {}

_DAY_US = 86_400_000_000
_PH_LAMBDA_X = 20  # threshold Λ = this × S (in the 10·D scaled units)


# ---------------------------------------------------------------------------
# events_page_hinkley — first-crossing drift detection per type
# ---------------------------------------------------------------------------


def q_events_page_hinkley(sf_dir: str):
    """Page–Hinkley (upward): on each type's DENSE daily grid (zeros count),
    the scaled statistic Mₜ = Σᵢ≤ₜ (10·D·xᵢ − 11·S) uses tolerance
    δ = mean/10 and the deviation devₜ = Mₜ − min(M₀..Mₜ); drift is detected
    on the FIRST day devₜ > {L}·S. Everything is exact integers — the 10·D
    scaling clears the rational mean.

    Scale shape: per-batch (type, day, n) combiner partials fold
    driver-side over the bounded grid; one cumsum + running-min per
    type.""".format(L=_PH_LAMBDA_X)

    def partial(t: pa.Table) -> pd.DataFrame:
        et = np.asarray(t["event_type"].to_numpy(zero_copy_only=False))
        day = t["ts"].cast(pa.int64()).to_numpy() // _DAY_US
        g = (
            pd.DataFrame({"event_type": et, "day": day})
            .groupby(["event_type", "day"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        g["n"] = g["n"].astype(np.int64)
        return g

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["event_type", "day"])["n"]
        .sum()
    )
    all_days = part.index.get_level_values(1)
    lo, hi = int(all_days.min()), int(all_days.max())
    grid = np.arange(lo, hi + 1, dtype=np.int64)
    rows = []
    for ty in sorted(part.index.get_level_values(0).unique()):
        h = part.xs(ty)
        x = np.zeros(len(grid), dtype=object)
        x[h.index.to_numpy(np.int64) - lo] = [int(v) for v in h.to_numpy()]
        D = len(grid)
        S = int(h.sum())
        m = np.cumsum(10 * D * x.astype(object) - 11 * S)
        runmin = np.minimum.accumulate(m)
        dev = m - runmin
        lam = _PH_LAMBDA_X * S
        over = np.flatnonzero(dev > lam)
        rows.append(
            {
                "event_type": ty,
                "detect_day": int(grid[over[0]]) if len(over) else -1,
                "max_dev": int(max(dev)) if D else 0,
            }
        )
    out = pd.DataFrame(rows, columns=["event_type", "detect_day", "max_dev"])
    return out.astype({"detect_day": np.int64, "max_dev": np.int64})


ORACLES117["events_page_hinkley"] = f"""
WITH d AS (
  SELECT event_type, epoch_us(ts) // {_DAY_US} AS day,
         CAST(count(*) AS HUGEINT) AS n
  FROM events GROUP BY 1, 2
),
b AS (SELECT min(day) AS lo, max(day) AS hi FROM d),
grid AS (
  SELECT t.event_type, CAST(g.g AS BIGINT) AS day
  FROM (SELECT DISTINCT event_type FROM d) t,
       b, unnest(generate_series(b.lo, b.hi)) AS g(g)
),
z AS (
  SELECT g.event_type, g.day, coalesce(d.n, 0) AS x
  FROM grid g LEFT JOIN d ON d.event_type = g.event_type AND d.day = g.day
),
tot AS (
  SELECT event_type, CAST(sum(x) AS HUGEINT) AS s,
         CAST(count(*) AS HUGEINT) AS nd
  FROM z GROUP BY 1
),
m AS (
  SELECT z.event_type, z.day,
         sum(10 * t.nd * z.x - 11 * t.s)
           OVER (PARTITION BY z.event_type ORDER BY z.day
                 ROWS UNBOUNDED PRECEDING) AS mt,
         t.s
  FROM z JOIN tot t USING (event_type)
),
r AS (
  SELECT event_type, day, s,
         mt - min(mt) OVER (PARTITION BY event_type ORDER BY day
                            ROWS UNBOUNDED PRECEDING) AS dev
  FROM m
)
SELECT event_type,
       CAST(coalesce(min(day) FILTER (dev > {_PH_LAMBDA_X} * s), -1)
            AS BIGINT) AS detect_day,
       CAST(max(dev) AS BIGINT) AS max_dev
FROM r GROUP BY event_type"""


# ---------------------------------------------------------------------------
# emb_pq_distortion — per-subspace reconstruction MSE of the PQ codes
# ---------------------------------------------------------------------------


def q_emb_pq_distortion(sf_dir: str):
    """Quantization quality: for each of the 4 PQ subspaces, the mean
    squared reconstruction error ‖v_m − c_m‖² over the corpus, decomposed
    as v·v − 2·max(v·c) + 1 (unit codewords, value-based max so ties don't
    matter). Each PER-VECTOR error quantizes to nano-units (floor(·1e9+½))
    BEFORE summation, so the fold is an order-free integer sum — no
    float-accumulation-order hazard across Ray's nondeterministic block
    splits. Dots accumulate dimension-sequentially (a fused loop over 16
    dims) to mirror DuckDB's left-to-right list_dot_product bit-for-bit.

    Scale shape: codebooks are broadcast constants; per-batch fused
    sequential-dot kernels; each block emits 4 (subspace, Σnano, n)
    integer partials; the driver folds with Python ints."""
    from .queries54 import _PQ_DIM, _PQ_M, _pq_codebooks
    from ..functions.vectors import stack_list_column

    books = _pq_codebooks()
    sub = _PQ_DIM // _PQ_M

    def partial(t: pa.Table) -> pd.DataFrame:
        v = stack_list_column(t["embedding"])
        rows = []
        for m, cb in enumerate(books):
            vm = v[:, m * sub : (m + 1) * sub]
            n, d = vm.shape
            # dimension-sequential accumulation ≡ list_dot_product order
            s_vv = np.zeros(n)
            dots = np.zeros((n, cb.shape[0]))
            for j in range(d):
                s_vv = s_vv + vm[:, j] * vm[:, j]
                dots = dots + vm[:, j][:, None] * cb[None, :, j]
            err = s_vv - 2.0 * dots.max(axis=1) + 1.0
            q = np.floor(err * 1_000_000_000.0 + 0.5).astype(np.int64)
            rows.append({"m": m, "s": int(q.sum()), "n": n})
        return pd.DataFrame(rows)

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    rows = []
    for m in range(_PQ_M):
        g = part[part["m"] == m]
        n = int(g["n"].sum())
        s = int(sum(int(v) for v in g["s"]))
        rows.append(
            {"subspace": m, "n": n, "mse_micro": s // (n * 1000) if n else 0}
        )
    return pd.DataFrame(rows, columns=["subspace", "n", "mse_micro"]).astype(np.int64)


def _pq_distortion_oracle() -> str:
    from .queries54 import _PQ_DIM, _PQ_K, _PQ_M, _pq_codebooks

    books = _pq_codebooks()
    sub = _PQ_DIM // _PQ_M
    parts = []
    for m, cb in enumerate(books):
        values = ",\n    ".join(
            f"({ci}, [" + ", ".join(repr(float(x)) for x in cb[ci]) + "])"
            for ci in range(_PQ_K)
        )
        parts.append(
            f"""
SELECT CAST({m} AS BIGINT) AS subspace, CAST(count(*) AS BIGINT) AS n,
       CAST(CAST(sum(q) AS HUGEINT) // (count(*) * 1000) AS BIGINT)
         AS mse_micro
FROM (
  SELECT vec_id,
         CAST(floor((list_dot_product(v, v)
                     - 2.0 * max(list_dot_product(v, c)) + 1.0)
                    * 1000000000.0 + 0.5) AS HUGEINT) AS q
  FROM (SELECT vec_id,
               CAST(embedding[{m * sub + 1}:{(m + 1) * sub}] AS DOUBLE[]) AS v
        FROM embeddings),
       (SELECT * FROM (VALUES
    {values}) t(cid, c))
  GROUP BY vec_id, v
)"""
        )
    return "\nUNION ALL\n".join(parts)


ORACLES117["emb_pq_distortion"] = _pq_distortion_oracle()


QUERIES117 = {
    "events_page_hinkley": q_events_page_hinkley,
    "emb_pq_distortion": q_emb_pq_distortion,
}
