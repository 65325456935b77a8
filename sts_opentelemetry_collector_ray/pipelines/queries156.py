"""Driver-contract queries, wave 156 — tool latency by conversation depth
(does tool-call latency drift as conversations grow? the span-pair edges
bucketed by caller turn depth) and embedding energy quantiles per label
(exact p50/p90 of quantized vector energy — the norm-distribution audit per
class). Same contract as queries.py: column names AND dtypes match the
DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES156: dict[str, str] = {}

_DEPTH_BUCKET = 10


# ---------------------------------------------------------------------------
# sg_latency_by_depth — edge latency grouped by caller-turn depth bucket
# ---------------------------------------------------------------------------


def q_sg_latency_by_depth(sf_dir: str):
    """Per caller-depth bucket (client_turn // 10): completed span-pair
    edges, failures, exact summed latency µs, and average latency in micro-µs
    units (floor-half-up; ONE double division) — the context-drag profile of
    tool calls.

    Scale shape: the oracled span-pair edge join (stages/servicegraph.py)
    followed by a per-batch bounded depth-bucket combiner; driver fold."""
    from ..stages.servicegraph import edge_table
    from .queries2 import _parsed_transcripts

    edges = edge_table(_parsed_transcripts(sf_dir))

    def partial(t: pa.Table) -> pd.DataFrame:
        depth = (
            t["client_turn"].to_numpy(zero_copy_only=False).astype(np.int64)
            // _DEPTH_BUCKET
        )
        g = (
            pd.DataFrame(
                {
                    "depth_bucket": depth,
                    "n": 1,
                    "failed": t["failed"]
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                    "lat": t["latency_us"]
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                }
            )
            .groupby("depth_bucket", sort=False, as_index=False)
            .sum()
        )
        return g.astype(np.int64)

    part = edges.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "depth_bucket": pd.Series([], dtype=np.int64),
            "n_edges": pd.Series([], dtype=np.int64),
            "n_failed": pd.Series([], dtype=np.int64),
            "sum_latency_us": pd.Series([], dtype=np.int64),
            "avg_latency_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    out = (
        part.groupby("depth_bucket", sort=True)
        .agg(
            n_edges=("n", "sum"),
            n_failed=("failed", "sum"),
            sum_latency_us=("lat", "sum"),
        )
        .reset_index()
    )
    out["avg_latency_micro"] = np.floor(
        out["sum_latency_us"].to_numpy(np.float64)
        / out["n_edges"].to_numpy(np.float64)
        * 1_000_000.0
        + 0.5
    ).astype(np.int64)
    return out.astype(np.int64)


def _latency_by_depth_oracle() -> str:
    from .queries2 import _EDGES_SQL

    return (
        _EDGES_SQL
        + f"""
SELECT CAST(client_turn // {_DEPTH_BUCKET} AS BIGINT) AS depth_bucket,
       CAST(count(*) AS BIGINT) AS n_edges,
       CAST(sum(failed) AS BIGINT) AS n_failed,
       CAST(sum(latency_us) AS BIGINT) AS sum_latency_us,
       CAST(floor(CAST(sum(latency_us) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS avg_latency_micro
FROM edges GROUP BY 1"""
    )


ORACLES156["sg_latency_by_depth"] = _latency_by_depth_oracle()


# ---------------------------------------------------------------------------
# emb_energy_quantiles — exact p50/p90 of quantized vector energy per label
# ---------------------------------------------------------------------------


def q_emb_energy_quantiles(sf_dir: str):
    """Exact p50/p90 of embedding energy Σ q_i² (q = floor(x·1e3 + 0.5) —
    milli fixed-point keeps the distinct-energy histogram bounded) per label:
    the class-conditional norm audit that catches collapsed or runaway
    classes.

    Scale shape: per-batch energies via ONE stacked square-sum, then the
    (label, energy) distinct-value histogram combiner and integer-rational
    rank pick — the quantile-engine contract, energies never sort globally."""
    from ..functions.vectors import stack_list_column

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        v = stack_list_column(t["embedding"])
        q = np.floor(v * 1000.0 + 0.5).astype(np.int64)
        energy = (q * q).sum(axis=1)
        g = (
            pd.DataFrame(
                {
                    "label": t["label"].to_numpy(zero_copy_only=False).astype(np.int64),
                    "energy": energy,
                    "cnt": 1,
                }
            )
            .groupby(["label", "energy"], sort=False, as_index=False)["cnt"]
            .sum()
        )
        return g.astype(np.int64)

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "label": pd.Series([], dtype=np.int64),
            "q_label": pd.Series([], dtype=object),
            "n": pd.Series([], dtype=np.int64),
            "energy": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    hist = (
        part.groupby(["label", "energy"], sort=True)["cnt"].sum().reset_index()
    )
    rows = []
    for label, g in hist.groupby("label", sort=True):
        g = g.sort_values("energy")
        cum = np.cumsum(g["cnt"].to_numpy(np.int64))
        vals = g["energy"].to_numpy(np.int64)
        n = int(cum[-1])
        for num, den, ql in ((1, 2, "p50"), (9, 10, "p90")):
            rank = (n * num + den - 1) // den
            i = int(np.searchsorted(cum, rank, side="left"))
            rows.append((int(label), ql, n, int(vals[i])))
    return pd.DataFrame(rows, columns=["label", "q_label", "n", "energy"]).astype(
        {"label": np.int64, "n": np.int64, "energy": np.int64}
    )


ORACLES156["emb_energy_quantiles"] = """
WITH en AS (
  SELECT CAST(e.label AS BIGINT) AS label,
         CAST(sum(CAST(floor(CAST(u.x AS DOUBLE) * 1000.0 + 0.5) AS BIGINT)
                  * CAST(floor(CAST(u.x AS DOUBLE) * 1000.0 + 0.5) AS BIGINT))
              AS BIGINT) AS energy
  FROM embeddings e, unnest(e.embedding) AS u(x)
  GROUP BY e.vec_id, e.label
),
c AS (
  SELECT label, energy, CAST(count(*) AS BIGINT) AS cnt
  FROM en GROUP BY 1, 2
),
t AS (SELECT label, CAST(sum(cnt) AS BIGINT) AS n FROM c GROUP BY 1),
cum AS (
  SELECT label, energy,
         sum(cnt) OVER (PARTITION BY label ORDER BY energy) AS cum
  FROM c
),
qs AS (SELECT * FROM (VALUES (1, 2, 'p50'), (9, 10, 'p90')) q(num, den, q_label)),
pick AS (
  SELECT t.label, q.q_label, t.n, min(cum.energy) AS energy
  FROM t CROSS JOIN qs q
  JOIN cum ON cum.label = t.label
          AND cum.cum >= (t.n * q.num + q.den - 1) // q.den
  GROUP BY 1, 2, 3
)
SELECT label, q_label, n, CAST(energy AS BIGINT) AS energy FROM pick"""


QUERIES156 = {
    "sg_latency_by_depth": q_sg_latency_by_depth,
    "emb_energy_quantiles": q_emb_energy_quantiles,
}
