"""Driver-contract queries, wave 236 — Dunning (1993) log-likelihood
keyness (the G² keyword-vs-rest-of-corpus statistic per source, the corpus
linguistics standard for "what words make this source distinctive") and
the Pettitt (1979) nonparametric change-point test on the daily event
count series.
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES236: dict[str, str] = {}

_KEY_TOPK = 3


# ---------------------------------------------------------------------------
# docs_keyness — top-G² keywords per source (Dunning LLR vs rest)
# ---------------------------------------------------------------------------


def q_docs_keyness(sf_dir: str):
    """Per source: the top-3 OVER-represented words by Dunning's G² —
    for the 2×2 table (a = in-source count, b = rest-of-corpus count,
    c/d = remaining token masses), G² = 2·Σ obs·ln(obs/exp) with
    expecteds from the margins (zero cells contribute 0); only words with
    a/N_s > b/N_rest qualify. Rank by the FLOORED micro G² (engine-stable)
    then word. Output: source, rank, word, n_in, n_out, g2_micro.

    Scale shape: one read folds (source, word) count partials per batch;
    the driver holds the vocabulary-sized table (the q_docs_vocab bound)
    and the G² scan is one vectorized pass over it."""
    path = f"{sf_dir}/documents.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern(t["text"], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = np.asarray(toks.flatten().to_numpy(zero_copy_only=False), object)
        off = np.asarray(toks.offsets.to_numpy(zero_copy_only=False), np.int64)
        src_all = np.asarray(t["source"].to_numpy(zero_copy_only=False), object)
        src = np.repeat(src_all, np.diff(off))
        keep = flat != ""
        df = pd.DataFrame({"source": src[keep], "w": flat[keep]})
        return (
            df.groupby(["source", "w"], sort=False, as_index=False)
            .size()
            .rename(columns={"size": "c"})
            .astype({"c": np.int64})
        )

    part = (
        ray.data.read_parquet(path, columns=["source", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["source", "rank", "word", "n_in", "n_out", "g2_micro"]
    if part.empty:
        return pd.DataFrame(
            {c: pd.Series([], dtype=(object if c in ("source", "word")
                                     else np.int64))
             for c in cols}
        )
    sw = part.groupby(["source", "w"], as_index=False)["c"].sum()
    wtot = sw.groupby("w")["c"].sum()
    stot = sw.groupby("source")["c"].sum()
    n_all = float(stot.sum())
    a = sw["c"].to_numpy(np.float64)
    b = wtot.reindex(sw["w"]).to_numpy(np.float64) - a
    ns = stot.reindex(sw["source"]).to_numpy(np.float64)
    nr = n_all - ns
    c = ns - a
    d = nr - b
    # expecteds from margins of the 2x2 table
    ea = (a + b) * ns / n_all
    eb = (a + b) * nr / n_all
    ec = (c + d) * ns / n_all
    ed = (c + d) * nr / n_all

    def term(o, ex):
        out = np.zeros_like(o)
        m = o > 0.0
        out[m] = o[m] * np.log(o[m] / ex[m])
        return out

    g2 = 2.0 * (term(a, ea) + term(b, eb) + term(c, ec) + term(d, ed))
    over = a / ns > b / np.maximum(nr, 1.0)
    sw = sw.assign(
        g2_micro=np.floor(g2 * 1_000_000.0 + 0.5).astype(np.int64),
        n_out=b.astype(np.int64),
    )[over]
    sw = sw.sort_values(
        ["source", "g2_micro", "w"], ascending=[True, False, True],
        kind="mergesort",
    )
    sw["rank"] = sw.groupby("source").cumcount() + 1
    top = sw[sw["rank"] <= _KEY_TOPK]
    return pd.DataFrame(
        {
            "source": np.asarray(top["source"].to_numpy(object)),
            "rank": top["rank"].to_numpy(np.int64),
            "word": np.asarray(top["w"].to_numpy(object)),
            "n_in": top["c"].to_numpy(np.int64),
            "n_out": top["n_out"].to_numpy(np.int64),
            "g2_micro": top["g2_micro"].to_numpy(np.int64),
        }
    ).reset_index(drop=True)


ORACLES236["docs_keyness"] = f"""
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
),
t AS (SELECT source, w FROM tok WHERE w <> ''),
sw AS (SELECT source, w, CAST(count(*) AS DOUBLE) AS a FROM t GROUP BY 1, 2),
wt AS (SELECT w, CAST(count(*) AS DOUBLE) AS cw FROM t GROUP BY 1),
st AS (SELECT source, CAST(count(*) AS DOUBLE) AS ns FROM t GROUP BY 1),
alln AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM t),
cells AS (
  SELECT sw.source, sw.w, sw.a, wt.cw - sw.a AS b,
         st.ns - sw.a AS c, alln.n - st.ns - (wt.cw - sw.a) AS d,
         st.ns, alln.n - st.ns AS nr, alln.n AS n
  FROM sw JOIN wt ON sw.w = wt.w JOIN st ON sw.source = st.source, alln
),
g AS (
  SELECT source, w, CAST(a AS BIGINT) AS n_in, CAST(b AS BIGINT) AS n_out,
         CAST(floor(2.0 * (
             CASE WHEN a > 0 THEN a * ln(a / ((a + b) * ns / n)) ELSE 0 END
           + CASE WHEN b > 0 THEN b * ln(b / ((a + b) * nr / n)) ELSE 0 END
           + CASE WHEN c > 0 THEN c * ln(c / ((c + d) * ns / n)) ELSE 0 END
           + CASE WHEN d > 0 THEN d * ln(d / ((c + d) * nr / n)) ELSE 0 END
         ) * 1000000.0 + 0.5) AS BIGINT) AS g2_micro
  FROM cells WHERE a / ns > b / greatest(nr, 1.0)
),
rk AS (
  SELECT source, w AS word, n_in, n_out, g2_micro,
         row_number() OVER (PARTITION BY source
                            ORDER BY g2_micro DESC, w) AS rank
  FROM g
)
SELECT source, CAST(rank AS BIGINT) AS rank, word, n_in, n_out, g2_micro
FROM rk WHERE rank <= {_KEY_TOPK} ORDER BY source, rank"""


# ---------------------------------------------------------------------------
# events_pettitt — nonparametric change-point in the daily total series
# ---------------------------------------------------------------------------


def q_events_pettitt(sf_dir: str):
    """Pettitt (1979) change-point test over TOTAL daily event counts:
    U_t = Σ_{i≤t} Σ_{j>t} sign(x_i − x_j) for t = 1..n−1, K = max|U_t|
    (first t wins ties), p ≈ 2·exp(−6K²/(n³+n²)). Output: n_days, k_stat,
    change_day, p_micro.

    Scale shape: bounded daily fold; the n² sign matrix is one
    vectorized broadcast on the driver."""
    from .queries221 import _daily

    daily = _daily(sf_dir)
    cols = ["n_days", "k_stat", "change_day", "p_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if daily.empty:
        return empty
    tot = daily.groupby("day")["n"].sum().sort_index()
    x = tot.to_numpy(np.float64)
    days = tot.index.to_numpy(np.int64)
    n = len(x)
    if n < 5:
        return empty
    sgn = np.sign(x[:, None] - x[None, :])
    # U_t = sum of sign(x_i - x_j) over i <= t < j — prefix fold of columns
    cum = np.cumsum(sgn, axis=0)
    u = np.array([cum[t, t + 1:].sum() for t in range(n - 1)])
    k_idx = int(np.argmax(np.abs(u)))
    k = float(np.abs(u[k_idx]))
    p = 2.0 * np.exp(-6.0 * k * k / (n ** 3 + n ** 2))
    return pd.DataFrame(
        {
            "n_days": [np.int64(n)],
            "k_stat": [np.int64(k)],
            "change_day": [np.int64(days[k_idx])],
            "p_micro": [np.int64(np.floor(min(p, 1.0) * 1_000_000.0 + 0.5))],
        }
    )


ORACLES236["events_pettitt"] = """
WITH daily AS (
  SELECT CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS BIGINT) AS day,
         CAST(count(*) AS DOUBLE) AS x
  FROM events GROUP BY 1
),
idx AS (
  SELECT day, x, row_number() OVER (ORDER BY day) - 1 AS t,
         count(*) OVER () AS n
  FROM daily
),
u AS (
  SELECT a.t AS t, any_value(a.day) AS day, any_value(a.n) AS n,
         sum(CASE WHEN i.x > j.x THEN 1 WHEN i.x < j.x THEN -1 ELSE 0 END)
           AS ut
  FROM idx a
  JOIN idx i ON i.t <= a.t
  JOIN idx j ON j.t > a.t
  WHERE a.t < a.n - 1 AND a.n >= 5
  GROUP BY a.t
),
best AS (
  SELECT n, abs(ut) AS k, day
  FROM u ORDER BY abs(ut) DESC, t ASC LIMIT 1
)
SELECT CAST(n AS BIGINT) AS n_days,
       CAST(k AS BIGINT) AS k_stat,
       CAST(day AS BIGINT) AS change_day,
       CAST(floor(least(
           2.0 * exp(-6.0 * CAST(k AS DOUBLE) * CAST(k AS DOUBLE)
                     / (CAST(n AS DOUBLE) * n * n + CAST(n AS DOUBLE) * n)),
           1.0) * 1000000.0 + 0.5) AS BIGINT) AS p_micro
FROM best"""


QUERIES236 = {
    "docs_keyness": q_docs_keyness,
    "events_pettitt": q_events_pettitt,
}
