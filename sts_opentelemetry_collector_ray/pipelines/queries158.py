"""Driver-contract queries, wave 158 — per-nation revenue trend (exact OLS
slope of yearly revenue in cents per year, over the bounded year grid) and
closing-role census (who gets the last word in a conversation — the mirror
of conv_opening_roles). Same contract as queries.py: column names AND
dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES158: dict[str, str] = {}


# ---------------------------------------------------------------------------
# nation_revenue_trend — exact OLS slope of yearly revenue per nation
# ---------------------------------------------------------------------------


def q_nation_revenue_trend(sf_dir: str):
    """Per nation with >= 2 active years: the OLS slope of yearly revenue
    (o_totalprice cents) on year, in micro-cents-per-year — slope =
    (n·Σxy − ΣxΣy)·1e6 / (n·Σx² − (Σx)²), every moment an exact bigint and
    ONE double division at the end.

    Scale shape: orders ⋈ customer hash join, per-batch (year, nation) cents
    combiner to the bounded grid; exact Python-int moments on the driver."""
    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )
    c = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    j = o.join(
        c,
        join_type="inner",
        num_partitions=8,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        year = (
            t["o_orderdate"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[Y]")
            .astype(np.int64)
            + 1970
        )
        cents = np.floor(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame(
                {
                    "nk": t["c_nationkey"]
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                    "y": year,
                    "rev": cents,
                }
            )
            .groupby(["nk", "y"], sort=False, as_index=False)["rev"]
            .sum()
        )
        return g.astype(np.int64)

    part = j.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "c_nationkey": pd.Series([], dtype=np.int64),
            "n_years": pd.Series([], dtype=np.int64),
            "slope_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    grid = part.groupby(["nk", "y"], sort=True)["rev"].sum().reset_index()
    rows = []
    for nk, g in grid.groupby("nk", sort=True):
        n = len(g)
        if n < 2:
            continue
        xs = [int(v) for v in g["y"]]
        ys = [int(v) for v in g["rev"]]
        sx, sy = sum(xs), sum(ys)
        sxx = sum(v * v for v in xs)
        sxy = sum(u * v for u, v in zip(xs, ys))
        den = n * sxx - sx * sx
        if den == 0:
            continue
        slope = int(
            np.floor((n * sxy - sx * sy) * 1_000_000.0 / float(den) + 0.5)
        )
        rows.append((int(nk), n, slope))
    if not rows:
        return empty
    return pd.DataFrame(
        rows, columns=["c_nationkey", "n_years", "slope_micro"]
    ).astype(np.int64)


ORACLES158["nation_revenue_trend"] = """
WITH g AS (
  SELECT CAST(c.c_nationkey AS BIGINT) AS c_nationkey,
         CAST(year(o.o_orderdate) AS HUGEINT) AS y,
         CAST(sum(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT))
              AS HUGEINT) AS rev
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
s AS (
  SELECT c_nationkey, CAST(count(*) AS HUGEINT) AS n,
         sum(y) AS sx, sum(rev) AS sy,
         sum(y * y) AS sxx, sum(y * rev) AS sxy
  FROM g GROUP BY 1 HAVING count(*) >= 2
)
SELECT c_nationkey,
       CAST(n AS BIGINT) AS n_years,
       CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE) * 1000000.0
                  / CAST(n * sxx - sx * sx AS DOUBLE) + 0.5) AS BIGINT)
         AS slope_micro
FROM s WHERE n * sxx - sx * sx <> 0"""


# ---------------------------------------------------------------------------
# conv_closing_roles — who gets the last word
# ---------------------------------------------------------------------------


def q_conv_closing_roles(sf_dir: str):
    """Per role: how many conversations END on that role (max turn_idx) and
    the share in micro units — the mirror of conv_opening_roles.

    Scale shape: turns ride ONE conv-bucket exchange; per-bucket lexsort +
    boundary scan pick each conversation's last turn; bounded (role, n)
    partials fold on the driver."""
    from ..sources.transcripts import derive_transcripts_from_events
    from .queries125 import _conv_bucket_partial

    ds = derive_transcripts_from_events(sf_dir)

    def partial(t: pa.Table) -> pd.DataFrame:
        return _conv_bucket_partial(t, ("role",))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "role": pd.Series([], dtype=object),
                "n": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(["conv", "turn"], kind="mergesort")
        conv = g["conv"].to_numpy(object)
        last = np.r_[conv[1:] != conv[:-1], True]
        return (
            pd.DataFrame({"role": g["role"].to_numpy(object)[last], "n": 1})
            .groupby("role", sort=False, as_index=False)["n"]
            .sum()
            .astype({"n": np.int64})
        )

    part = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )
    empty = pd.DataFrame(
        {
            "role": pd.Series([], dtype=object),
            "n_convs": pd.Series([], dtype=np.int64),
            "share_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty or "role" not in part.columns:
        return empty
    out = part.groupby("role", sort=True)["n"].sum().reset_index(name="n_convs")
    total = float(out["n_convs"].sum())
    out["share_micro"] = np.floor(
        out["n_convs"].to_numpy(np.float64) / total * 1_000_000.0 + 0.5
    ).astype(np.int64)
    return out.astype({"n_convs": np.int64})


def _closing_roles_oracle() -> str:
    from ..sources.transcripts import TRANSCRIPTS_FROM_EVENTS_SQL

    return (
        TRANSCRIPTS_FROM_EVENTS_SQL
        + """,
last AS (
  SELECT conv_id, max(turn_idx) AS t FROM transcripts GROUP BY 1
),
g AS (
  SELECT tr.role, CAST(count(*) AS BIGINT) AS n_convs
  FROM transcripts tr JOIN last l
    ON tr.conv_id = l.conv_id AND tr.turn_idx = l.t
  GROUP BY 1
)
SELECT role, n_convs,
       CAST(floor(CAST(n_convs AS DOUBLE)
                  / CAST((SELECT sum(n_convs) FROM g) AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS share_micro
FROM g"""
    )


ORACLES158["conv_closing_roles"] = _closing_roles_oracle()


QUERIES158 = {
    "nation_revenue_trend": q_nation_revenue_trend,
    "conv_closing_roles": q_conv_closing_roles,
}
