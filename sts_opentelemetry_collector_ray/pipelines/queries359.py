"""Driver-contract queries, wave 359 — the Dekkers-Einmahl-de Haan
moment tail estimator alongside Hill (k = ceil(1% of n) upper order
statistics of order totals) and the vocabulary drift curve (Jaccard
between adjacent ingestion-decile vocabularies). Same contract as
queries.py: column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES359: dict[str, str] = {}


# ---------------------------------------------------------------------------
# orders_moment_tail_estimator — Hill and DEdH moment estimators
# ---------------------------------------------------------------------------


def q_orders_moment_tail_estimator(sf_dir: str):
    """Tail-index estimation on the top k = ceil(0.01 n) order totals
    (cents): with the threshold X_(k+1) (the (k+1)-th largest),
    M_r = (1/k) sum (ln X_i - ln X_(k+1))^r; Hill = M1 and the moment
    estimator gamma = M1 + 1 - 0.5 / (1 - M1^2 / M2). Order statistics
    come exactly off the cents histogram; logs are mirrored float. One
    row: k, thr_cents, hill_micro, moment_micro."""

    def partial(t: pa.Table) -> pd.DataFrame:
        cents = np.floor(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        h = pd.Series(cents).groupby(cents).size()
        return pd.DataFrame(
            {"y": h.index.to_numpy(np.int64), "c": h.to_numpy(np.int64)}
        )

    hist = (
        ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("y")["c"]
        .sum()
        .sort_index(ascending=False)
    )
    cols = ["k", "thr_cents", "hill_micro", "moment_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if hist.empty:
        return empty
    y = hist.index.to_numpy(np.int64)
    c = hist.to_numpy(np.int64)
    n = int(c.sum())
    k = (n + 99) // 100
    if k < 5 or n <= k + 1:
        return empty
    # expand only the top k+1 values (histogram-bounded scan)
    cum = np.cumsum(c)
    i_thr = int(np.searchsorted(cum, k + 1, side="left"))
    thr = int(y[i_thr])
    if thr <= 0:
        return empty
    ln_thr = float(np.log(float(thr)))
    m1 = 0.0
    m2 = 0.0
    taken = 0
    for yi, ci in zip(y[: i_thr + 1], c[: i_thr + 1]):
        take = min(int(ci), k - taken)
        if take <= 0:
            break
        d = float(np.log(float(int(yi)))) - ln_thr
        m1 += take * d
        m2 += take * d * d
        taken += take
    m1 /= float(k)
    m2 /= float(k)
    if m2 <= 0.0 or m1 * m1 >= m2:
        return empty
    gamma = m1 + 1.0 - 0.5 / (1.0 - m1 * m1 / m2)
    return pd.DataFrame(
        [
            (
                np.int64(k), np.int64(thr),
                np.int64(np.floor(m1 * 1_000_000.0 + 0.5)),
                np.int64(np.floor(gamma * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c_: np.int64 for c_ in cols})


ORACLES359["orders_moment_tail_estimator"] = """
WITH b AS (
  SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS y
  FROM orders
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b),
kk AS (SELECT (n + 99) // 100 AS k, n FROM nn),
top AS (
  SELECT y, row_number() OVER (ORDER BY y DESC) AS rk
  FROM b, kk QUALIFY rk <= kk.k + 1
),
thr AS (SELECT y AS t FROM top, kk WHERE rk = kk.k + 1),
m AS (
  SELECT kk.k, thr.t,
         sum(ln(CAST(top.y AS DOUBLE)) - ln(CAST(thr.t AS DOUBLE)))
           / kk.k AS m1,
         sum((ln(CAST(top.y AS DOUBLE)) - ln(CAST(thr.t AS DOUBLE)))
             * (ln(CAST(top.y AS DOUBLE)) - ln(CAST(thr.t AS DOUBLE))))
           / kk.k AS m2
  FROM top, thr, kk
  WHERE top.rk <= kk.k AND thr.t > 0
  GROUP BY 1, 2
)
SELECT CAST(k AS BIGINT) AS k, CAST(t AS BIGINT) AS thr_cents,
       CAST(floor(m1 * 1000000.0 + 0.5) AS BIGINT) AS hill_micro,
       CAST(floor((m1 + 1.0 - 0.5 / (1.0 - m1 * m1 / m2))
                  * 1000000.0 + 0.5) AS BIGINT) AS moment_micro
FROM m, (SELECT n FROM nn) q
WHERE k >= 5 AND q.n > k + 1 AND m2 > 0 AND m1 * m1 < m2"""


# ---------------------------------------------------------------------------
# docs_vocab_drift_curve — Jaccard between adjacent ingestion deciles
# ---------------------------------------------------------------------------


def q_docs_vocab_drift_curve(sf_dir: str):
    """Vocabulary drift: documents deciled by doc_id (exact rank
    boundaries); the Jaccard similarity between each adjacent pair of
    decile vocabularies — a falling curve means the corpus vocabulary
    rotates over ingestion time. Per pair: decile_from, n_types_from,
    n_types_to, jaccard_micro.

    Scale shape: (decile, token) DISTINCT pairs ride the wordcount
    exchange with broadcast rank boundaries."""
    import ray as _ray

    ids = (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
        .to_pandas()["doc_id"]
        .to_numpy(np.int64)
    )
    cols = ["decile_from", "n_types_from", "n_types_to", "jaccard_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    n = len(ids)
    if n < 10:
        return empty
    s = np.sort(ids)
    bounds = [int(s[(i * n + 9) // 10 - 1]) for i in range(1, 10)]
    b_ref = _ray.put(bounds)

    def partial(t: pa.Table) -> pd.DataFrame:
        bds = np.array(_ray.get(b_ref), np.int64)
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t["text"]), r"\s+"
        ).combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = np.asarray(toks.flatten().to_numpy(zero_copy_only=False))
        did = np.repeat(
            t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64), lens
        )
        keep = flat != ""
        dec = np.searchsorted(bds, did[keep], side="left").astype(np.int64)
        return pd.DataFrame(
            {"d": dec, "w": flat[keep]}
        ).drop_duplicates()

    pairs = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .drop_duplicates()
    )
    if pairs.empty:
        return empty
    vocab = {
        int(d): set(sub["w"]) for d, sub in pairs.groupby("d")
    }
    rows = []
    for d in range(9):
        a = vocab.get(d, set())
        b = vocab.get(d + 1, set())
        union = len(a | b)
        if union == 0:
            continue
        inter = len(a & b)
        rows.append(
            (
                np.int64(d), np.int64(len(a)), np.int64(len(b)),
                np.int64(np.floor(
                    float(inter) / float(union) * 1_000_000.0 + 0.5
                )),
            )
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols}
    )


ORACLES359["docs_vocab_drift_curve"] = r"""
WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
ranked AS (
  SELECT doc_id, text, row_number() OVER (ORDER BY doc_id) AS rk
  FROM documents
),
dec AS (
  SELECT text,
         (SELECT count(*) FROM (SELECT CAST(r.range AS BIGINT) + 1 AS i
                                FROM range(0, 9) r) b, nn
          WHERE ranked.rk > (b.i * nn.n + 9) // 10) AS d
  FROM ranked
),
tok AS (
  SELECT DISTINCT d,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS w
  FROM dec
),
sz AS (SELECT d, CAST(count(*) AS BIGINT) AS v FROM tok GROUP BY 1),
inter AS (
  SELECT a.d AS d,
         CAST(count(*) AS BIGINT) AS i
  FROM tok a JOIN tok b ON b.d = a.d + 1 AND b.w = a.w
  GROUP BY 1
)
SELECT CAST(sa.d AS BIGINT) AS decile_from, sa.v AS n_types_from,
       sb.v AS n_types_to,
       CAST(floor(CAST(coalesce(inter.i, 0) AS DOUBLE)
                  / (sa.v + sb.v - coalesce(inter.i, 0))
                  * 1000000.0 + 0.5) AS BIGINT) AS jaccard_micro
FROM sz sa
JOIN sz sb ON sb.d = sa.d + 1
LEFT JOIN inter ON inter.d = sa.d, nn
WHERE nn.n >= 10 AND sa.v + sb.v - coalesce(inter.i, 0) > 0
ORDER BY decile_from"""


QUERIES359 = {
    "orders_moment_tail_estimator": q_orders_moment_tail_estimator,
    "docs_vocab_drift_curve": q_docs_vocab_drift_curve,
}
