"""Driver-contract queries, wave 182 — role mix shift between conversation
halves (does a role concentrate early or late in a conversation?) and the
per-brand price-vs-size OLS slope from exact integer sums.
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES182: dict[str, str] = {}


# ---------------------------------------------------------------------------
# conv_half_role_shift — per-role turn counts in first vs second half
# ---------------------------------------------------------------------------


def q_conv_half_role_shift(sf_dir: str):
    """Per role: turns landing in the FIRST half of their conversation
    (turn_idx * 2 < n) vs the second half, plus the first-half share in
    micro units.

    Scale shape: rows ride ONE bounded conv-hash bucket exchange projected
    to three narrow columns (conv, role, turn_idx); each bucket resolves
    conversation length and half membership vectorized and emits |roles|×2
    counts; the driver folds bounded partials."""
    from ..sources.transcripts import derive_transcripts_from_events
    from ..functions.hashing import fnv1a64_array

    ds = derive_transcripts_from_events(sf_dir)

    def project(t: pa.Table) -> pd.DataFrame:
        conv = np.asarray(t["conv_id"].to_numpy(zero_copy_only=False))
        df = pd.DataFrame(
            {
                "conv": conv,
                "role": t["role"].to_numpy(zero_copy_only=False),
                "idx": t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )
        df["_b"] = (fnv1a64_array(conv.astype(object)) % np.uint64(64)).astype(
            np.int64
        )
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        n = g.groupby("conv", sort=False)["idx"].transform("size").to_numpy(np.int64)
        first = g["idx"].to_numpy(np.int64) * 2 < n
        out = (
            pd.DataFrame(
                {
                    "role": g["role"].to_numpy(object),
                    "n_first": first.astype(np.int64),
                    "n_second": (~first).astype(np.int64),
                }
            )
            .groupby("role", sort=False, as_index=False)
            .sum()
        )
        return out

    part = (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    empty = pd.DataFrame(
        {
            "role": pd.Series([], dtype=object),
            "n_first": pd.Series([], dtype=np.int64),
            "n_second": pd.Series([], dtype=np.int64),
            "first_share_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty or "role" not in part.columns:
        return empty
    out = (
        part.groupby("role", sort=True, as_index=False)[["n_first", "n_second"]]
        .sum()
        .astype({"n_first": np.int64, "n_second": np.int64})
    )
    tot = (out["n_first"] + out["n_second"]).to_numpy(np.float64)
    out["first_share_micro"] = np.floor(
        out["n_first"].to_numpy(np.float64) / tot * 1_000_000.0 + 0.5
    ).astype(np.int64)
    return out


def _half_shift_oracle() -> str:
    from ..sources.transcripts import TRANSCRIPTS_FROM_EVENTS_SQL

    return (
        TRANSCRIPTS_FROM_EVENTS_SQL
        + """,
t AS (
  SELECT role, turn_idx,
         count(*) OVER (PARTITION BY conv_id) AS n
  FROM transcripts
),
g AS (
  SELECT role,
         CAST(sum(CASE WHEN turn_idx * 2 < n THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
         CAST(sum(CASE WHEN turn_idx * 2 >= n THEN 1 ELSE 0 END) AS BIGINT) AS n_second
  FROM t GROUP BY 1
)
SELECT role, n_first, n_second,
       CAST(floor(CAST(n_first AS DOUBLE)
                  / CAST(n_first + n_second AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS first_share_micro
FROM g"""
    )


ORACLES182["conv_half_role_shift"] = _half_shift_oracle()


# ---------------------------------------------------------------------------
# part_brand_size_slope — OLS slope of retail price (cents) vs size per brand
# ---------------------------------------------------------------------------


def q_part_brand_size_slope(sf_dir: str):
    """Per brand: part count, OLS slope of retail-price CENTS against size in
    micro units (0 for degenerate single-size brands), and mean price cents.

    Scale shape: per-batch bounded (brand, n, Σx, Σy, Σxy, Σx²) integer
    combiner; driver folds |brands| partials and does one exact division."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_brand", "p_size", "p_retailprice"]
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        x = t["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = np.floor(
            t["p_retailprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "p_brand": t["p_brand"].to_numpy(zero_copy_only=False),
                "n": 1,
                "sx": x,
                "sy": y,
                "sxy": x * y,
                "sxx": x * x,
            }
        )
        return (
            df.groupby("p_brand", sort=False, as_index=False)
            .sum()
            .astype({c: np.int64 for c in ("n", "sx", "sy", "sxy", "sxx")})
        )

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "p_brand": pd.Series([], dtype=object),
            "n_parts": pd.Series([], dtype=np.int64),
            "slope_micro": pd.Series([], dtype=np.int64),
            "avg_cents": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    g = part.groupby("p_brand", sort=True, as_index=False).sum()
    n = g["n"].to_numpy(np.int64)
    sx = g["sx"].to_numpy(np.int64)
    sy = g["sy"].to_numpy(np.int64)
    sxy = g["sxy"].to_numpy(np.int64)
    sxx = g["sxx"].to_numpy(np.int64)
    denom = n * sxx - sx * sx
    num = n * sxy - sx * sy
    with np.errstate(divide="ignore", invalid="ignore"):
        slope = np.floor(
            num.astype(np.float64) / denom.astype(np.float64) * 1_000_000.0 + 0.5
        )
    slope_micro = np.where(denom == 0, 0, slope).astype(np.int64)
    avg_cents = np.floor(sy.astype(np.float64) / n.astype(np.float64) + 0.5).astype(
        np.int64
    )
    return pd.DataFrame(
        {
            "p_brand": g["p_brand"].to_numpy(object),
            "n_parts": n,
            "slope_micro": slope_micro,
            "avg_cents": avg_cents,
        }
    )


ORACLES182["part_brand_size_slope"] = """
WITH s AS (
  SELECT p_brand,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(p_size AS BIGINT)) AS BIGINT) AS sx,
         CAST(sum(CAST(floor(p_retailprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sy,
         CAST(sum(CAST(p_size AS BIGINT)
                  * CAST(floor(p_retailprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sxy,
         CAST(sum(CAST(p_size AS BIGINT) * CAST(p_size AS BIGINT)) AS BIGINT) AS sxx
  FROM part GROUP BY 1
)
SELECT p_brand,
       n AS n_parts,
       CASE WHEN n * sxx - sx * sx = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
                            / CAST(n * sxx - sx * sx AS DOUBLE)
                            * 1000000.0 + 0.5) AS BIGINT) END AS slope_micro,
       CAST(floor(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) + 0.5) AS BIGINT) AS avg_cents
FROM s"""


QUERIES182 = {
    "conv_half_role_shift": q_conv_half_role_shift,
    "part_brand_size_slope": q_part_brand_size_slope,
}
