"""Driver-contract queries, wave 184 — end-of-month shipping concentration
(share of lines shipped in the last 3 days of the calendar month) and a
token census over part names (explode + bounded-vocabulary combiner).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES184: dict[str, str] = {}


# ---------------------------------------------------------------------------
# lineitem_eom_share — end-of-month shipping share per calendar month
# ---------------------------------------------------------------------------


def q_lineitem_eom_share(sf_dir: str):
    """Per calendar month (ym = year*100+month): line count, lines shipped in
    the LAST 3 DAYS of that month, and the end-of-month share in micro units.

    Scale shape: per-batch bounded (ym, n, n_eom) combiner via vectorized
    pandas datetime kernels; driver folds |months| partials."""
    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_shipdate"])

    def partial(t: pa.Table) -> pd.DataFrame:
        s = pd.Series(t["l_shipdate"].to_numpy(zero_copy_only=False))
        dt = s.dt
        ym = (dt.year * 100 + dt.month).to_numpy(np.int64)
        eom = ((dt.days_in_month - dt.day) <= 2).to_numpy()
        return (
            pd.DataFrame({"ym": ym, "n_lines": 1, "n_eom": eom.astype(np.int64)})
            .groupby("ym", sort=False, as_index=False)
            .sum()
            .astype(np.int64)
        )

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "ym": pd.Series([], dtype=np.int64),
            "n_lines": pd.Series([], dtype=np.int64),
            "n_eom": pd.Series([], dtype=np.int64),
            "eom_share_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    g = part.groupby("ym", sort=True, as_index=False).sum()
    g["eom_share_micro"] = np.floor(
        g["n_eom"].to_numpy(np.float64) / g["n_lines"].to_numpy(np.float64) * 1_000_000.0
        + 0.5
    ).astype(np.int64)
    return g.astype(np.int64)


ORACLES184["lineitem_eom_share"] = """
WITH d AS (
  SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT) AS ym,
         CASE WHEN date_diff('day', CAST(l_shipdate AS DATE),
                             last_day(CAST(l_shipdate AS DATE))) <= 2
              THEN 1 ELSE 0 END AS eom
  FROM lineitem
)
SELECT ym,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(eom) AS BIGINT) AS n_eom,
       CAST(floor(CAST(sum(eom) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS eom_share_micro
FROM d GROUP BY 1"""


# ---------------------------------------------------------------------------
# part_name_token_census — top-20 tokens across part names
# ---------------------------------------------------------------------------


def q_part_name_token_census(sf_dir: str):
    """Top 20 space-separated tokens across part NAMES: total occurrences and
    distinct parts containing the token (ORDER BY n DESC, token ASC).

    Scale shape: Arrow split_pattern explode per batch; each part row lives in
    exactly one batch, so per-batch (token, n, n_parts) partials are exact and
    the bounded TPC-H name vocabulary folds on the driver."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"]
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern(t["p_name"], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = np.asarray(toks.flatten().to_numpy(zero_copy_only=False))
        offsets = np.asarray(toks.offsets.to_numpy(zero_copy_only=False))
        counts = np.diff(offsets)
        pk = np.repeat(
            t["p_partkey"].to_numpy(zero_copy_only=False), counts
        )
        df = pd.DataFrame({"pk": pk, "token": flat})
        df = df[df["token"] != ""]
        n = df.groupby("token", sort=False).size().rename("n")
        n_parts = (
            df.drop_duplicates(["pk", "token"])
            .groupby("token", sort=False)
            .size()
            .rename("n_parts")
        )
        out = pd.concat([n, n_parts], axis=1).reset_index()
        return out.astype({"n": np.int64, "n_parts": np.int64})

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "token": pd.Series([], dtype=object),
            "n": pd.Series([], dtype=np.int64),
            "n_parts": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    g = part.groupby("token", sort=False, as_index=False).sum()
    g = g.sort_values(["n", "token"], ascending=[False, True], kind="mergesort").head(
        20
    )
    return g.reset_index(drop=True).astype({"n": np.int64, "n_parts": np.int64})


ORACLES184["part_name_token_census"] = """
WITH toks AS (
  SELECT p_partkey, unnest(string_split(p_name, ' ')) AS token FROM part
),
g AS (
  SELECT token,
         CAST(count(*) AS BIGINT) AS n,
         CAST(count(DISTINCT p_partkey) AS BIGINT) AS n_parts
  FROM toks WHERE token <> '' GROUP BY 1
)
SELECT token, n, n_parts FROM g ORDER BY n DESC, token ASC LIMIT 20"""


QUERIES184 = {
    "lineitem_eom_share": q_lineitem_eom_share,
    "part_name_token_census": q_part_name_token_census,
}
