"""Driver-contract queries, wave 193 — Good-Turing frequency smoothing over
the corpus vocabulary (frequency-of-frequencies, adjusted counts, unseen
mass) and a Chow structural-break test on the extendedprice~quantity
regression split at the midpoint shipping year.
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES193: dict[str, str] = {}

_GT_BUCKETS = 64
_GT_MAX_R = 10


# ---------------------------------------------------------------------------
# docs_good_turing — frequency-of-frequencies smoothing table
# ---------------------------------------------------------------------------


def q_docs_good_turing(sf_dir: str):
    """Good-Turing smoothing table (Good 1953) over corpus word counts: for
    the 10 SMALLEST observed counts r, the count-of-counts n_r, n_{r+1}, the adjusted
    count r* = (r+1)·n_{r+1}/n_r in micro units (0 when n_{r+1} = 0) and the
    unseen mass P₀ = n_1/N in micro units (constant column).

    Scale shape: per-batch word-count combiner → ONE word-hash bucket
    exchange (global counts exact per bucket) → per-bucket count-of-counts
    partials; driver folds |distinct r|×buckets rows — text never leaves
    the first stage."""
    from ..functions.hashing import fnv1a64_array

    path = f"{sf_dir}/documents.parquet"

    def wc_partial(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern(t["text"], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = np.asarray(toks.flatten().to_numpy(zero_copy_only=False), object)
        df = pd.DataFrame({"w": flat})
        df = df[df["w"] != ""]
        g = df.groupby("w", sort=False, as_index=False).size().rename(
            columns={"size": "n"}
        )
        g["_b"] = (
            fnv1a64_array(g["w"].to_numpy(object)) % np.uint64(_GT_BUCKETS)
        ).astype(np.int32)
        return g.astype({"n": np.int64})

    def fof_partial(g: pd.DataFrame) -> pd.DataFrame:
        cnt = g.groupby("w", as_index=False)["n"].sum()
        r, nr = np.unique(cnt["n"].to_numpy(np.int64), return_counts=True)
        # r = -1 row carries this bucket's token total for the driver fold
        return pd.DataFrame(
            {
                "r": np.concatenate([r, [np.int64(-1)]]),
                "n_r": np.concatenate(
                    [nr.astype(np.int64), [np.int64(cnt["n"].sum())]]
                ),
            }
        )

    part = (
        ray.data.read_parquet(path, columns=["text"])
        .map_batches(wc_partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(fof_partial, batch_format="pandas")
        .to_pandas()
    )
    cols = ["r", "n_r", "n_next", "rstar_micro", "p0_micro"]
    if part.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    total_tokens = int(part.loc[part["r"] == -1, "n_r"].sum())
    fof = (
        part[part["r"] != -1]
        .groupby("r")["n_r"]
        .sum()
        .sort_index()
    )
    n1 = int(fof.get(1, 0))
    p0 = np.int64(np.floor(n1 / float(total_tokens) * 1_000_000.0 + 0.5))
    rows = []
    # the _GT_MAX_R SMALLEST observed r values (a fixed 1..10 band is empty
    # whenever the corpus has no rare words, as the synthetic corpus hasn't)
    for r in sorted(fof.index.to_numpy(np.int64))[:_GT_MAX_R]:
        r = int(r)
        nr = int(fof.get(r, 0))
        if nr == 0:
            continue
        nnext = int(fof.get(r + 1, 0))
        rstar = (r + 1) * nnext / float(nr)
        rows.append(
            (np.int64(r), np.int64(nr), np.int64(nnext),
             np.int64(np.floor(rstar * 1_000_000.0 + 0.5)), p0)
        )
    return pd.DataFrame(rows, columns=cols).astype({c: np.int64 for c in cols})


ORACLES193["docs_good_turing"] = f"""
WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
wc AS (SELECT w, CAST(count(*) AS BIGINT) AS n FROM tok WHERE w <> '' GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM wc),
fof AS (SELECT n AS r, CAST(count(*) AS BIGINT) AS n_r FROM wc GROUP BY 1),
base AS (
  SELECT a.r, a.n_r, coalesce(b.n_r, 0) AS n_next
  FROM fof a LEFT JOIN fof b ON b.r = a.r + 1
  QUALIFY row_number() OVER (ORDER BY a.r) <= {_GT_MAX_R}
),
p0 AS (
  SELECT CAST(floor(CAST(coalesce(
           (SELECT n_r FROM fof WHERE r = 1), 0) AS DOUBLE)
           / CAST(tot.total AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS p0_micro
  FROM tot
)
SELECT base.r, base.n_r, base.n_next,
       CAST(floor((base.r + 1) * CAST(base.n_next AS DOUBLE)
                  / CAST(base.n_r AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
         AS rstar_micro,
       p0.p0_micro
FROM base, p0 ORDER BY base.r"""


# ---------------------------------------------------------------------------
# lineitem_chow_test — structural break in price ~ quantity at mid-year
# ---------------------------------------------------------------------------


def q_lineitem_chow_test(sf_dir: str):
    """Chow test (Chow 1960) for a structural break in the OLS regression
    extendedprice ~ quantity, split at the midpoint shipping year
    ⌊(min_year + max_year + 1)/2⌋: per-segment ns and slopes (micro) and the
    Chow F statistic with k = 2 parameters (micro).

    Scale shape: pass 1 folds a (min_year, max_year) scalar pair; pass 2 is
    a per-batch 2-segment moment combiner (n, Σx, Σy, Σxy, Σx², Σy²) —
    driver folds 2×blocks rows, no shuffle."""
    path = f"{sf_dir}/lineitem.parquet"
    ds = ray.data.read_parquet(
        path, columns=["l_shipdate", "l_quantity", "l_extendedprice"]
    )

    def years_partial(t: pa.Table) -> pd.DataFrame:
        y = pd.Series(t["l_shipdate"].to_numpy(zero_copy_only=False)).dt.year
        return pd.DataFrame(
            {"mn": [np.int64(y.min())], "mx": [np.int64(y.max())]}
        )

    yp = ds.map_batches(years_partial, batch_format="pyarrow").to_pandas()
    cols = [
        "split_year", "n1", "n2", "slope1_micro", "slope2_micro", "f_micro",
    ]
    if yp.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    split = int((int(yp["mn"].min()) + int(yp["mx"].max()) + 1) // 2)

    def moments_partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        y = df["l_extendedprice"].to_numpy(np.float64)
        x = df["l_quantity"].to_numpy(np.float64)
        seg = (df["l_shipdate"].dt.year.to_numpy() >= split).astype(np.int64)
        m = pd.DataFrame(
            {"seg": seg, "n": 1, "sx": x, "sy": y, "sxy": x * y,
             "sxx": x * x, "syy": y * y}
        )
        return m.groupby("seg", sort=False, as_index=False).sum().astype({"n": np.int64})

    part = ds.map_batches(moments_partial, batch_format="pyarrow").to_pandas()
    m = part.groupby("seg").sum().sort_index()

    def _fit(row):
        n, sx, sy, sxy, sxx, syy = (
            float(row["n"]), row["sx"], row["sy"], row["sxy"], row["sxx"], row["syy"]
        )
        sxx_c = sxx - sx * sx / n
        sxy_c = sxy - sx * sy / n
        syy_c = syy - sy * sy / n
        slope = sxy_c / sxx_c
        ssr = syy_c - sxy_c * sxy_c / sxx_c
        return slope, ssr

    if len(m) < 2:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    s1, ssr1 = _fit(m.loc[0])
    s2, ssr2 = _fit(m.loc[1])
    pooled = m.sum()
    _, ssr_p = _fit(pooled)
    n1, n2 = int(m.loc[0, "n"]), int(m.loc[1, "n"])
    f = ((ssr_p - ssr1 - ssr2) / 2.0) / ((ssr1 + ssr2) / (n1 + n2 - 4.0))
    micro = lambda v: np.int64(np.floor(v * 1_000_000.0 + 0.5))  # noqa: E731
    return pd.DataFrame(
        {
            "split_year": np.array([split], np.int64),
            "n1": np.array([n1], np.int64),
            "n2": np.array([n2], np.int64),
            "slope1_micro": np.array([micro(s1)], np.int64),
            "slope2_micro": np.array([micro(s2)], np.int64),
            "f_micro": np.array([micro(f)], np.int64),
        }
    )


ORACLES193["lineitem_chow_test"] = """
WITH yr AS (
  SELECT (min(year(l_shipdate)) + max(year(l_shipdate)) + 1) // 2 AS split
  FROM lineitem
),
m AS (
  SELECT CASE WHEN year(l_shipdate) >= yr.split THEN 1 ELSE 0 END AS seg,
         count(*) AS n,
         sum(l_quantity) AS sx, sum(l_extendedprice) AS sy,
         sum(l_quantity * l_extendedprice) AS sxy,
         sum(l_quantity * l_quantity) AS sxx,
         sum(l_extendedprice * l_extendedprice) AS syy
  FROM lineitem, yr GROUP BY 1
),
fit AS (
  SELECT seg, n, (sxy - sx * sy / n) / (sxx - sx * sx / n) AS slope,
         (syy - sy * sy / n)
         - (sxy - sx * sy / n) * (sxy - sx * sy / n) / (sxx - sx * sx / n)
           AS ssr
  FROM m
),
pool AS (
  SELECT sum(n) AS n, sum(sx) AS sx, sum(sy) AS sy, sum(sxy) AS sxy,
         sum(sxx) AS sxx, sum(syy) AS syy
  FROM m
),
poolfit AS (
  SELECT (syy - sy * sy / n)
         - (sxy - sx * sy / n) * (sxy - sx * sy / n) / (sxx - sx * sx / n)
           AS ssr_p
  FROM pool
),
f AS (
  SELECT yr.split,
         (SELECT n FROM fit WHERE seg = 0) AS n1,
         (SELECT n FROM fit WHERE seg = 1) AS n2,
         (SELECT slope FROM fit WHERE seg = 0) AS s1,
         (SELECT slope FROM fit WHERE seg = 1) AS s2,
         (SELECT ssr FROM fit WHERE seg = 0) AS ssr1,
         (SELECT ssr FROM fit WHERE seg = 1) AS ssr2,
         poolfit.ssr_p
  FROM yr, poolfit
)
SELECT CAST(split AS BIGINT) AS split_year,
       CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       CAST(floor(s1 * 1000000.0 + 0.5) AS BIGINT) AS slope1_micro,
       CAST(floor(s2 * 1000000.0 + 0.5) AS BIGINT) AS slope2_micro,
       CAST(floor(((ssr_p - ssr1 - ssr2) / 2.0)
                  / ((ssr1 + ssr2) / (n1 + n2 - 4.0))
                  * 1000000.0 + 0.5) AS BIGINT) AS f_micro
FROM f WHERE n1 IS NOT NULL AND n2 IS NOT NULL"""


QUERIES193 = {
    "docs_good_turing": q_docs_good_turing,
    "lineitem_chow_test": q_lineitem_chow_test,
}
