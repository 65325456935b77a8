"""Driver-contract queries, wave 88 — binary sign codes for embeddings (the
64-bit hyperplane codes behind hamming-space ANN: deterministic ±1 planes,
exact integer projections, uint64 bit-pack) and a wide month×segment revenue
pivot (the reporting-table shape: one column per market segment, FILTER
aggregates). Same contract as queries.py: column names AND dtypes match the
DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES88: dict[str, str] = {}

_SC_K = 64
_SC_DIM = 64
_SC_SCALE = 1 << 14
_PIVOT_BUCKETS = 32
_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


def _sc_signs() -> np.ndarray:
    from ..functions.hashing import fnv1a32

    s = np.empty((_SC_K, _SC_DIM), np.int64)
    for r in range(_SC_K):
        for c in range(_SC_DIM):
            s[r, c] = 1 if (fnv1a32(f"sc{r}:{c}") & 1) == 0 else -1
    return s


# ---------------------------------------------------------------------------
# emb_sign_codes — 64-bit hyperplane codes
# ---------------------------------------------------------------------------


def q_emb_sign_codes(sf_dir: str):
    """Hamming-ANN codes: bit j = 1 iff ⟨S_j, x⟩ > 0 over the deterministic
    ±1 hyperplanes (fnv-parity constants) and 2⁻¹⁴ fixed-point components —
    every projection is an exact integer, ties at exactly 0 give bit 0.
    Output: (vec_id, label, code, n_bits).

    Scale shape: the 64×64 sign matrix is a closure constant; each batch is
    one integer matmul, a comparison, and a uint64 bit-pack — fully
    vectorized, no exchange at all."""
    from ..functions.vectors import stack_list_column

    S = _sc_signs()
    pow2 = np.left_shift(np.uint64(1), np.arange(64, dtype=np.uint64))

    def partial(t: pa.Table) -> pa.Table:
        v = stack_list_column(t["embedding"])
        q = np.floor(v * _SC_SCALE + 0.5).astype(np.int64)
        y = q @ S.T
        bits = (y > 0).astype(np.uint64)
        code = (bits * pow2[None, :]).sum(axis=1, dtype=np.uint64)
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "label": pa.array(
                    t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
                ),
                "code": pa.array(code.view(np.int64)),
                "n_bits": pa.array(bits.sum(axis=1).astype(np.int64)),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label", "embedding"]
    ).map_batches(partial, batch_format="pyarrow")


def _sign_codes_oracle() -> str:
    S = _sc_signs()
    vals = ",\n    ".join(
        f"({r}, {c}, {int(S[r, c])})"
        for r in range(_SC_K)
        for c in range(_SC_DIM)
    )
    powers = ",\n    ".join(f"({r}, {1 << r})" for r in range(_SC_K))
    return f"""
WITH u AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label, CAST(g.i AS BIGINT) AS dim,
         CAST(floor(CAST(embedding[CAST(g.i AS INT) + 1] AS DOUBLE)
                    * {_SC_SCALE} + 0.5) AS BIGINT) AS q
  FROM embeddings CROSS JOIN range(0, {_SC_DIM}) g(i)
),
sgn(r, c, s) AS (SELECT * FROM (VALUES
    {vals}
)),
y AS (
  SELECT u.vec_id, u.label, sgn.r,
         CASE WHEN sum(CAST(sgn.s * u.q AS HUGEINT)) > 0 THEN 1 ELSE 0 END
           AS b
  FROM u JOIN sgn ON sgn.c = u.dim
  GROUP BY 1, 2, 3
),
p(r, pw) AS (SELECT * FROM (VALUES
    {powers}
)),
h AS (
  SELECT vec_id, label,
         sum(CAST(y.b AS HUGEINT) * CAST(p.pw AS HUGEINT)) AS hv,
         CAST(sum(y.b) AS BIGINT) AS nb
  FROM y JOIN p ON p.r = y.r
  GROUP BY 1, 2
)
SELECT vec_id, label,
       CAST(CASE WHEN hv >= 9223372036854775808
                 THEN hv - 18446744073709551616 ELSE hv END AS BIGINT)
         AS code,
       nb AS n_bits
FROM h"""


ORACLES88["emb_sign_codes"] = _sign_codes_oracle()


# ---------------------------------------------------------------------------
# orders_segment_pivot — month × market-segment revenue, wide
# ---------------------------------------------------------------------------


def q_orders_segment_pivot(sf_dir: str):
    """Reporting pivot: per order month, one revenue-micro column per market
    segment plus the total (exact integer sums; months with no orders in a
    segment show 0).

    Scale shape: orders pre-reduce per custkey inside batches and share ONE
    custkey-bucket exchange with customer (custkey → segment); buckets emit
    per-(month, segment) integer partials and the driver pivots the bounded
    |months|·5 cells to wide."""

    def o_partial(t: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        c = t["o_custkey"].to_numpy().astype(np.int64)
        y = pc.year(t["o_orderdate"]).to_numpy(zero_copy_only=False).astype(np.int64)
        m = pc.month(t["o_orderdate"]).to_numpy(zero_copy_only=False).astype(np.int64)
        tp = np.floor(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 1_000_000.0 + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame({"c": c, "mon": y * 100 + m, "tp": tp})
            .groupby(["c", "mon"], sort=False, as_index=False)
            .sum()
        )
        return pd.DataFrame(
            {
                "c": g["c"].to_numpy(np.int64),
                "mon": g["mon"].to_numpy(np.int64),
                "tp": g["tp"].to_numpy(np.int64),
                "seg": "",
                "_b": (g["c"].to_numpy(np.int64) % _PIVOT_BUCKETS).astype(np.int64),
            }
        )

    def c_rows(t: pa.Table) -> pd.DataFrame:
        c = t["c_custkey"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "c": c,
                "mon": np.int64(-1),
                "tp": np.int64(0),
                "seg": np.asarray(t["c_mktsegment"].to_numpy(zero_copy_only=False)),
                "_b": (c % _PIVOT_BUCKETS).astype(np.int64),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        cust = g.loc[(g["mon"] < 0).to_numpy(), ["c", "seg"]]
        o = g.loc[(g["mon"] >= 0).to_numpy(), ["c", "mon", "tp"]]
        j = o.merge(cust, on="c")
        out = j.groupby(["mon", "seg"], sort=False, as_index=False)["tp"].sum()
        return pd.DataFrame(
            {
                "mon": out["mon"].to_numpy(np.int64),
                "seg": out["seg"].astype(object),
                "tp": out["tp"].to_numpy(np.int64),
            }
        )

    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    ).map_batches(o_partial, batch_format="pyarrow")
    c = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(c_rows, batch_format="pyarrow")
    part = (
        o.union(c)
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: |months|·|segments| cells per bucket
        .groupby(["mon", "seg"], as_index=False)["tp"]
        .sum()
    )
    wide = part.pivot_table(
        index="mon", columns="seg", values="tp", aggfunc="sum", fill_value=0
    )
    for s in _SEGMENTS:
        if s not in wide.columns:
            wide[s] = 0
    wide = wide.sort_index()
    out = pd.DataFrame({"order_month": wide.index.to_numpy(np.int64)})
    total = np.zeros(len(wide), np.int64)
    for s in _SEGMENTS:
        col = wide[s].to_numpy(np.int64)
        out[f"{s.lower()}_micro"] = col
        total = total + col
    out["total_micro"] = total
    return out.reset_index(drop=True)


_SEG_COLS = ",\n       ".join(
    f"CAST(COALESCE(sum(tp) FILTER (seg = '{s}'), 0) AS BIGINT)"
    f" AS {s.lower()}_micro"
    for s in _SEGMENTS
)
ORACLES88["orders_segment_pivot"] = f"""
WITH j AS (
  SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
           AS order_month,
         c_mktsegment AS seg,
         CAST(floor(o_totalprice * 1000000 + 0.5) AS HUGEINT) AS tp
  FROM orders JOIN customer ON c_custkey = o_custkey
)
SELECT order_month,
       {_SEG_COLS},
       CAST(sum(tp) AS BIGINT) AS total_micro
FROM j GROUP BY 1 ORDER BY 1"""


QUERIES88 = {
    "emb_sign_codes": q_emb_sign_codes,
    "orders_segment_pivot": q_orders_segment_pivot,
}
