"""Driver-contract queries, wave 362 — Wilcoxon signed-rank test of
weekend-vs-weekday event rates paired by epoch week (exact doubled-rank
core with tie-corrected variance) and the mutual information between
the first and last words of the part type hierarchy. Same contract as
queries.py: column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES362: dict[str, str] = {}

_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# events_wilcoxon_weekend — signed-rank test on paired weekly rates
# ---------------------------------------------------------------------------


def q_events_wilcoxon_weekend(sf_dir: str):
    """Paired test: per epoch week the integer rate difference
    d = 5*weekend_count - 2*weekday_count (cross-multiplied daily
    rates; epoch weekday 2/3 = Sat/Sun); Wilcoxon signed-rank over the
    nonzero d with doubled average ranks of |d| (W+ stays integer) and
    the tie-corrected normal approximation. One row: n_weeks, n_eff,
    w_plus2, z_micro."""

    def partial(t: pa.Table) -> pd.DataFrame:
        day = pa.compute.cast(t["ts"], pa.int64()).to_numpy() // _DAY_US
        wk = day // 7
        wd = day % 7
        we = ((wd == 2) | (wd == 3)).astype(np.int64)
        g = (
            pd.DataFrame({"wk": wk, "we": we, "n": 1})
            .groupby(["wk", "we"], as_index=False)["n"]
            .sum()
        )
        return g.astype(np.int64)

    weekly = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["wk", "we"])["n"]
        .sum()
        .unstack(fill_value=0)
    )
    cols = ["n_weeks", "n_eff", "w_plus2", "z_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if weekly.empty:
        return empty
    cw = weekly[0].to_numpy(np.int64) if 0 in weekly else np.zeros(
        len(weekly), np.int64
    )
    ce = weekly[1].to_numpy(np.int64) if 1 in weekly else np.zeros(
        len(weekly), np.int64
    )
    n_weeks = len(weekly)
    d = 5 * ce - 2 * cw
    d = d[d != 0]
    n = len(d)
    if n < 5:
        return empty
    ad = np.abs(d)
    vals, cnts = np.unique(ad, return_counts=True)
    below = np.concatenate([[0], np.cumsum(cnts)[:-1]])
    r2v = 2 * below + cnts + 1
    r2 = r2v[np.searchsorted(vals, ad)]
    w_plus2 = int(r2[d > 0].astype(object).sum())
    t_sum = int((cnts.astype(object) ** 3 - cnts.astype(object)).sum())
    num = 2 * w_plus2 - n * (n + 1)
    var = (2 * n * (n + 1) * (2 * n + 1) - t_sum) / 48.0
    if var <= 0.0:
        return empty
    z = float(num) / (4.0 * float(np.sqrt(var)))
    return pd.DataFrame(
        [
            (
                np.int64(n_weeks), np.int64(n), np.int64(w_plus2),
                np.int64(np.floor(z * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES362["events_wilcoxon_weekend"] = f"""
WITH days AS (
  SELECT epoch_us(ts) // {_DAY_US} AS day FROM events
),
wkly AS (
  SELECT day // 7 AS wk,
         CAST(sum(CASE WHEN day % 7 IN (2, 3) THEN 1 ELSE 0 END)
              AS BIGINT) AS we,
         CAST(sum(CASE WHEN day % 7 IN (2, 3) THEN 0 ELSE 1 END)
              AS BIGINT) AS wd
  FROM days GROUP BY 1
),
nw AS (SELECT CAST(count(*) AS BIGINT) AS n_weeks FROM wkly),
dd AS (
  SELECT 5 * we - 2 * wd AS d FROM wkly WHERE 5 * we - 2 * wd <> 0
),
r AS (
  SELECT d,
         2 * (rank() OVER (ORDER BY abs(d)))
           + (count(*) OVER (PARTITION BY abs(d))) - 1 AS r2
  FROM dd
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN d > 0 THEN r2 ELSE 0 END) AS BIGINT) AS w2
  FROM r
),
ties AS (
  SELECT CAST(coalesce(sum(CAST(c AS HUGEINT) * c * c - c), 0)
              AS HUGEINT) AS t
  FROM (SELECT CAST(count(*) AS BIGINT) AS c FROM dd GROUP BY abs(d))
),
f AS (
  SELECT nw.n_weeks, agg.n, agg.w2,
         (2.0 * CAST(agg.n AS DOUBLE) * (agg.n + 1) * (2 * agg.n + 1)
          - CAST(ties.t AS DOUBLE)) / 48.0 AS var
  FROM nw, agg, ties
)
SELECT n_weeks, n AS n_eff, w2 AS w_plus2,
       CAST(floor(CAST(2 * w2 - n * (n + 1) AS DOUBLE)
                  / (4.0 * sqrt(var)) * 1000000.0 + 0.5) AS BIGINT)
         AS z_micro
FROM f
WHERE n >= 5 AND var > 0"""


# ---------------------------------------------------------------------------
# part_type_word_mi — first-word / last-word mutual information
# ---------------------------------------------------------------------------


def q_part_type_word_mi(sf_dir: str):
    """How much does the first word of p_type (e.g. STANDARD) tell you
    about the last (e.g. BRASS)? Exact joint counts over the bounded
    (w1, w3) table; MI = ln N - (S1 + S3 - S13)/N with S = sum c ln c,
    normalized by sqrt(H1 * H3). One row: n, n_w1, n_w3, mi_micro,
    nmi_micro."""

    def partial(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern(t["p_type"], " ").combine_chunks()
        w1 = pc.list_element(toks, 0).to_numpy(zero_copy_only=False)
        w3 = np.asarray(
            [t_.split(" ")[-1] for t_ in
             t["p_type"].to_numpy(zero_copy_only=False)]
        )
        g = (
            pd.DataFrame({"w1": w1, "w3": w3})
            .groupby(["w1", "w3"])
            .size()
            .rename("c")
            .reset_index()
        )
        g["c"] = g["c"].astype(np.int64)
        return g

    joint = (
        ray.data.read_parquet(f"{sf_dir}/part.parquet", columns=["p_type"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["w1", "w3"])["c"]
        .sum()
        .reset_index()
    )
    cols = ["n", "n_w1", "n_w3", "mi_micro", "nmi_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if joint.empty:
        return empty
    n = int(joint["c"].sum())
    if n < 2:
        return empty

    def s_of(series: pd.Series) -> float:
        v = series.to_numpy(np.int64).astype(np.float64)
        return float((v * np.log(v)).sum())

    s13 = s_of(joint["c"])
    m1 = joint.groupby("w1")["c"].sum()
    m3 = joint.groupby("w3")["c"].sum()
    s1 = s_of(m1)
    s3 = s_of(m3)
    ln_n = float(np.log(float(n)))
    mi = ln_n - (s1 + s3 - s13) / float(n)
    h1 = ln_n - s1 / float(n)
    h3 = ln_n - s3 / float(n)
    if h1 <= 0.0 or h3 <= 0.0:
        return empty
    nmi = mi / (float(np.sqrt(h1)) * float(np.sqrt(h3)))
    return pd.DataFrame(
        [
            (
                np.int64(n), np.int64(len(m1)), np.int64(len(m3)),
                np.int64(np.floor(mi * 1_000_000.0 + 0.5)),
                np.int64(np.floor(nmi * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES362["part_type_word_mi"] = """
WITH w AS (
  SELECT string_split(p_type, ' ')[1] AS w1,
         string_split(p_type, ' ')[-1] AS w3
  FROM part
),
j AS (
  SELECT w1, w3, CAST(count(*) AS BIGINT) AS c FROM w GROUP BY 1, 2
),
nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM j),
m1 AS (SELECT w1, CAST(sum(c) AS BIGINT) AS c FROM j GROUP BY 1),
m3 AS (SELECT w3, CAST(sum(c) AS BIGINT) AS c FROM j GROUP BY 1),
s AS (
  SELECT
    (SELECT sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) FROM j) AS s13,
    (SELECT sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) FROM m1) AS s1,
    (SELECT sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) FROM m3) AS s3,
    (SELECT CAST(count(*) AS BIGINT) FROM m1) AS k1,
    (SELECT CAST(count(*) AS BIGINT) FROM m3) AS k3,
    nn.n
  FROM nn
),
h AS (
  SELECT n, k1, k3,
         ln(CAST(n AS DOUBLE)) - (s1 + s3 - s13) / n AS mi,
         ln(CAST(n AS DOUBLE)) - s1 / n AS h1,
         ln(CAST(n AS DOUBLE)) - s3 / n AS h3
  FROM s
)
SELECT n, k1 AS n_w1, k3 AS n_w3,
       CAST(floor(mi * 1000000.0 + 0.5) AS BIGINT) AS mi_micro,
       CAST(floor(mi / (sqrt(h1) * sqrt(h3)) * 1000000.0 + 0.5)
            AS BIGINT) AS nmi_micro
FROM h
WHERE n >= 2 AND h1 > 0 AND h3 > 0"""


QUERIES362 = {
    "events_wilcoxon_weekend": q_events_wilcoxon_weekend,
    "part_type_word_mi": q_part_type_word_mi,
}
