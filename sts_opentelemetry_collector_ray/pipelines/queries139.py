"""Driver-contract queries, wave 139 — embedding length-bias diagnostic (does
vector energy just encode document length? the classic retrieval-bias audit,
as exact-integer Pearson between n_chars and quantized embedding energy per
language) and per-type daily load factor (peak-to-mean daily volume, the
capacity-planning census). Same contract as queries.py: column names AND
dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES139: dict[str, str] = {}

_LB_Q = 1_000_000.0  # element quantization: micro fixed-point
_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# emb_length_bias — Pearson(n_chars, quantized embedding energy) per lang
# ---------------------------------------------------------------------------


def q_emb_length_bias(sf_dir: str):
    """Per language: exact-integer Pearson correlation (micro units, ONE
    shared double finish) between document length (n_chars) and embedding
    energy Σ q_i² where q_i = floor(element × 1e6 + 0.5) — the fixed-point
    quantization that makes the float sum order-free and bit-replayable
    (the emb_dim_variance precedent). A strongly positive value means the
    embedding norm leaks document length. Languages with < 2 docs or zero
    variance on either side are absent on both engines.

    Scale shape: per-batch energy via ONE stacked matmul-free square-sum
    (stack_list_column, no per-row Python), documents ⋈ energies through
    Ray's hash join, then a per-batch per-lang bigint moment combiner —
    ≤ |langs| partial rows per block — folded on the driver."""
    from ..functions.vectors import stack_list_column

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )

    def energy(t: pa.Table) -> pa.Table:
        v = stack_list_column(t["embedding"])
        q = np.floor(v * _LB_Q + 0.5).astype(np.int64)
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "energy": pa.array((q * q).sum(axis=1), pa.int64()),
            }
        )

    embs = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(energy, batch_format="pyarrow")

    j = docs.join(
        embs,
        join_type="inner",
        num_partitions=8,
        on=("doc_id",),
        right_on=("vec_id",),
    )

    def moments(t: pa.Table) -> pd.DataFrame:
        x = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        yo = t["energy"].to_numpy(zero_copy_only=False).astype(object)
        df = pd.DataFrame(
            {
                "lang": np.asarray(t["lang"].to_numpy(zero_copy_only=False)),
                "n": 1,
                "sx": x,
                "sy": yo,  # object bigints: y² overflows int64 by design
                "sxx": x * x,
                "syy": yo * yo,
                "sxy": x.astype(object) * yo,
            }
        )
        return df.groupby("lang", sort=False, as_index=False).sum()

    part = j.map_batches(moments, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "lang": pd.Series([], dtype=object),
            "n_docs": pd.Series([], dtype=np.int64),
            "pearson_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty or "lang" not in part.columns:
        return empty
    rows = []
    for lang, g in part.groupby("lang", sort=True):
        n = int(g["n"].sum())
        if n < 2:
            continue
        sx = sum(int(v) for v in g["sx"])
        sy = sum(int(v) for v in g["sy"])
        sxx = sum(int(v) for v in g["sxx"])
        syy = sum(int(v) for v in g["syy"])
        sxy = sum(int(v) for v in g["sxy"])
        vx, vy = n * sxx - sx * sx, n * syy - sy * sy
        if vx <= 0 or vy <= 0:
            continue
        r = float(n * sxy - sx * sy) / (
            np.sqrt(float(vx)) * np.sqrt(float(vy))
        )
        rows.append((lang, n, int(np.floor(r * 1_000_000.0 + 0.5))))
    if not rows:
        return empty
    return pd.DataFrame(
        rows, columns=["lang", "n_docs", "pearson_micro"]
    ).astype({"n_docs": np.int64, "pearson_micro": np.int64})


ORACLES139["emb_length_bias"] = """
WITH en AS (
  SELECT e.vec_id AS doc_id,
         sum(CAST(floor(CAST(u.x AS DOUBLE) * 1000000.0 + 0.5) AS HUGEINT)
             * CAST(floor(CAST(u.x AS DOUBLE) * 1000000.0 + 0.5) AS HUGEINT))
           AS energy
  FROM embeddings e, unnest(e.embedding) AS u(x)
  GROUP BY 1
),
j AS (
  SELECT d.lang, CAST(d.n_chars AS HUGEINT) AS x, en.energy AS y
  FROM documents d JOIN en ON en.doc_id = d.doc_id
),
s AS (
  SELECT lang, CAST(count(*) AS HUGEINT) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
  FROM j GROUP BY 1 HAVING count(*) >= 2
)
SELECT lang, CAST(n AS BIGINT) AS n_docs,
       CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
                  / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                     * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
                  * 1000000.0 + 0.5) AS BIGINT) AS pearson_micro
FROM s
WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0"""


# ---------------------------------------------------------------------------
# events_load_factor — peak-to-mean daily volume per event type
# ---------------------------------------------------------------------------


def q_events_load_factor(sf_dir: str):
    """Capacity census: per event type, the number of active days, total
    events, the busiest day's count, and peak-to-mean load factor in micro
    units — floor(peak × n_days / n_events × 1e6 + 0.5), the integer product
    first so both engines share ONE double division.

    Scale shape: per-batch (type, day) count combiner over the bounded
    |types| × |days| grid; driver fold; no shuffle."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        day = (
            t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("i8")
            // _DAY_US
        )
        g = (
            pd.DataFrame(
                {
                    "event_type": np.asarray(
                        t["event_type"].to_numpy(zero_copy_only=False)
                    ),
                    "day": day,
                    "n": 1,
                }
            )
            .groupby(["event_type", "day"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        return g.astype({"day": np.int64, "n": np.int64})

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "event_type": pd.Series([], dtype=object),
            "n_days": pd.Series([], dtype=np.int64),
            "n_events": pd.Series([], dtype=np.int64),
            "peak_daily": pd.Series([], dtype=np.int64),
            "load_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    grid = (
        part.groupby(["event_type", "day"], sort=False)["n"].sum().reset_index()
    )
    out = (
        grid.groupby("event_type", sort=True)
        .agg(n_days=("day", "count"), n_events=("n", "sum"), peak_daily=("n", "max"))
        .reset_index()
    )
    out["load_micro"] = np.floor(
        (
            out["peak_daily"].to_numpy(np.int64)
            * out["n_days"].to_numpy(np.int64)
        ).astype(np.float64)
        / out["n_events"].to_numpy(np.float64)
        * 1_000_000.0
        + 0.5
    ).astype(np.int64)
    return out.astype(
        {"n_days": np.int64, "n_events": np.int64, "peak_daily": np.int64}
    )


ORACLES139["events_load_factor"] = f"""
WITH d AS (
  SELECT event_type, epoch_us(ts) // {_DAY_US} AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(n) AS BIGINT) AS n_events,
       CAST(max(n) AS BIGINT) AS peak_daily,
       CAST(floor(CAST(max(n) * count(*) AS DOUBLE)
                  / CAST(sum(n) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
         AS load_micro
FROM d GROUP BY 1"""


QUERIES139 = {
    "emb_length_bias": q_emb_length_bias,
    "events_load_factor": q_events_load_factor,
}
