"""Driver-contract queries, wave 166 — customer nation×segment independence
(chi-square statistic with per-cell floor-micro terms — order-free exact
integers, the stratification check before per-nation quota sampling) and a
quantity × unit-price-decile heatmap (2D binned profile with exact GLOBAL
decile cutoffs from the distinct-cents histogram). Same contract as
queries.py: column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES166: dict[str, str] = {}


# ---------------------------------------------------------------------------
# customer_segment_independence — chi-square over the nation×segment grid
# ---------------------------------------------------------------------------


def q_customer_segment_independence(sf_dir: str):
    """One row: customers, grid dof = (|nations|−1)·(|segments|−1), and the
    chi-square statistic in micro units computed as
    Σ_cells floor((n·o − r·c)² · 1e6 / (n·r·c)) — each term an exact integer
    floor (documented contract: the per-cell floor makes the sum order-free),
    where o is the cell count and r, c the marginals.

    Scale shape: per-batch (nation, segment, n) combiner over the bounded
    grid; exact Python-int cell math on the driver."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_nationkey", "c_mktsegment"]
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        g = (
            pd.DataFrame(
                {
                    "nk": t["c_nationkey"]
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                    "seg": np.asarray(
                        t["c_mktsegment"].to_numpy(zero_copy_only=False)
                    ),
                    "n": 1,
                }
            )
            .groupby(["nk", "seg"], sort=False, as_index=False)["n"]
            .sum()
        )
        return g.astype({"nk": np.int64, "n": np.int64})

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "n_customers": pd.Series([], dtype=np.int64),
            "dof": pd.Series([], dtype=np.int64),
            "chi2_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    grid = part.groupby(["nk", "seg"], sort=True)["n"].sum().reset_index()
    n = int(grid["n"].sum())
    rmarg = grid.groupby("nk")["n"].sum().to_dict()
    cmarg = grid.groupby("seg")["n"].sum().to_dict()
    nks = sorted(rmarg)
    segs = sorted(cmarg)
    obs = {
        (int(r["nk"]), r["seg"]): int(r["n"]) for _, r in grid.iterrows()
    }
    chi2 = 0
    for nk in nks:
        r = int(rmarg[nk])
        for seg in segs:
            c = int(cmarg[seg])
            o = obs.get((nk, seg), 0)
            num = n * o - r * c
            chi2 += (num * num * 1_000_000) // (n * r * c)
    dof = (len(nks) - 1) * (len(segs) - 1)
    return pd.DataFrame(
        {
            "n_customers": [np.int64(n)],
            "dof": [np.int64(dof)],
            "chi2_micro": [np.int64(chi2)],
        }
    )


ORACLES166["customer_segment_independence"] = """
WITH g AS (
  SELECT CAST(c_nationkey AS HUGEINT) AS nk, c_mktsegment AS seg,
         CAST(count(*) AS HUGEINT) AS o
  FROM customer GROUP BY 1, 2
),
r AS (SELECT nk, CAST(sum(o) AS HUGEINT) AS rm FROM g GROUP BY 1),
c AS (SELECT seg, CAST(sum(o) AS HUGEINT) AS cm FROM g GROUP BY 1),
t AS (SELECT CAST(sum(o) AS HUGEINT) AS n FROM g),
cells AS (
  SELECT r.nk, c.seg, r.rm, c.cm, coalesce(g.o, 0) AS o
  FROM r CROSS JOIN c LEFT JOIN g ON g.nk = r.nk AND g.seg = c.seg
),
terms AS (
  SELECT sum(((t.n * cells.o - cells.rm * cells.cm)
              * (t.n * cells.o - cells.rm * cells.cm) * 1000000)
             // (t.n * cells.rm * cells.cm)) AS chi2
  FROM cells CROSS JOIN t
)
SELECT CAST(t.n AS BIGINT) AS n_customers,
       CAST(((SELECT count(*) FROM r) - 1) * ((SELECT count(*) FROM c) - 1)
            AS BIGINT) AS dof,
       CAST(terms.chi2 AS BIGINT) AS chi2_micro
FROM t CROSS JOIN terms"""


# ---------------------------------------------------------------------------
# lineitem_qty_price_heatmap — quantity × unit-price-decile 2D profile
# ---------------------------------------------------------------------------


def q_lineitem_qty_price_heatmap(sf_dir: str):
    """Per (quantity bucket of 10, GLOBAL unit-price decile 1..10): line
    count and share of all lines in micro units. Decile cutoffs are exact
    (integer-rational ranks over the distinct unit-price-cents histogram);
    a line's decile is the smallest d whose cutoff covers it.

    Scale shape: pass 1 folds the bounded distinct-cents histogram on the
    driver and derives 9 cutoffs; pass 2 re-reads with the broadcast cutoffs
    and a bounded (qbucket, decile) combiner — two streaming passes, no row
    exchange."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice"],
    )

    def unit_cents(t: pa.Table) -> np.ndarray:
        return np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)
            / t["l_quantity"].to_numpy(zero_copy_only=False)
            * 100.0
            + 0.5
        ).astype(np.int64)

    def hist_partial(t: pa.Table) -> pd.DataFrame:
        u = unit_cents(t)
        return (
            pd.DataFrame({"cents": u, "cnt": 1})
            .groupby("cents", sort=False, as_index=False)["cnt"]
            .sum()
            .astype(np.int64)
        )

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("cents", sort=True)["cnt"]
        .sum()
        .reset_index()
    )
    empty = pd.DataFrame(
        {
            "q_bucket": pd.Series([], dtype=np.int64),
            "decile": pd.Series([], dtype=np.int64),
            "n_lines": pd.Series([], dtype=np.int64),
            "share_micro": pd.Series([], dtype=np.int64),
        }
    )
    if hist.empty:
        return empty
    vals = hist["cents"].to_numpy(np.int64)
    cum = np.cumsum(hist["cnt"].to_numpy(np.int64))
    n = int(cum[-1])
    cutoffs = []
    for d in range(1, 10):
        rank = (n * d + 9) // 10
        i = int(np.searchsorted(cum, rank, side="left"))
        cutoffs.append(int(vals[i]))
    cut_ref = ray.put(np.asarray(cutoffs, dtype=np.int64))

    def cell_partial(t: pa.Table) -> pd.DataFrame:
        cuts = ray.get(cut_ref)
        u = unit_cents(t)
        decile = np.searchsorted(cuts, u, side="left") + 1
        qb = (
            np.floor(t["l_quantity"].to_numpy(zero_copy_only=False) + 0.5).astype(
                np.int64
            )
            // 10
        )
        g = (
            pd.DataFrame({"q_bucket": qb, "decile": decile.astype(np.int64), "n": 1})
            .groupby(["q_bucket", "decile"], sort=False, as_index=False)["n"]
            .sum()
        )
        return g.astype(np.int64)

    part = ds.map_batches(cell_partial, batch_format="pyarrow").to_pandas()
    if part.empty:
        return empty
    out = (
        part.groupby(["q_bucket", "decile"], sort=True)["n"]
        .sum()
        .reset_index(name="n_lines")
    )
    out["share_micro"] = np.floor(
        out["n_lines"].to_numpy(np.float64) / float(n) * 1_000_000.0 + 0.5
    ).astype(np.int64)
    return out.astype(np.int64)


ORACLES166["lineitem_qty_price_heatmap"] = """
WITH u AS (
  SELECT CAST(floor(l_extendedprice / l_quantity * 100.0 + 0.5) AS BIGINT)
           AS cents,
         CAST(floor(l_quantity + 0.5) AS BIGINT) // 10 AS q_bucket
  FROM lineitem
),
h AS (SELECT cents, CAST(count(*) AS BIGINT) AS cnt FROM u GROUP BY 1),
t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM h),
cum AS (SELECT cents, sum(cnt) OVER (ORDER BY cents) AS cum FROM h),
cuts AS (
  SELECT d.d, min(cum.cents) AS cutoff
  FROM (SELECT unnest(range(1, 10)) AS d) d CROSS JOIN t
  JOIN cum ON cum.cum >= (t.n * d.d + 9) // 10
  GROUP BY 1
),
dec AS (
  SELECT u.q_bucket,
         1 + coalesce((SELECT count(*) FROM cuts WHERE cuts.cutoff < u.cents),
                      0) AS decile
  FROM u
),
g AS (
  SELECT q_bucket, CAST(decile AS BIGINT) AS decile,
         CAST(count(*) AS BIGINT) AS n_lines
  FROM dec GROUP BY 1, 2
)
SELECT q_bucket, decile, n_lines,
       CAST(floor(CAST(n_lines AS DOUBLE)
                  / CAST((SELECT n FROM t) AS DOUBLE) * 1000000.0 + 0.5)
            AS BIGINT) AS share_micro
FROM g"""


QUERIES166 = {
    "customer_segment_independence": q_customer_segment_independence,
    "lineitem_qty_price_heatmap": q_lineitem_qty_price_heatmap,
}
