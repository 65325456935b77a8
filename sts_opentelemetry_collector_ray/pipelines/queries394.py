"""Driver-contract queries, wave 394 — exact quantiles of the net
charge amount (extendedprice * (1 - discount) * (1 + tax)) and an
add-one multinomial naive-Bayes source classifier over documents
(train = even doc_ids, test = odd). Same contract as queries.py:
column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES394: dict[str, str] = {}


# ---------------------------------------------------------------------------
# lineitem_net_revenue_quantiles — charge amount distribution
# ---------------------------------------------------------------------------


def q_lineitem_net_revenue_quantiles(sf_dir: str):
    """The TPC-H charge expression: cents =
    floor(extendedprice * (1 - discount) * (1 + tax) * 100 + 0.5)
    (ONE mirrored float rounding); exact ceil-rank order statistics
    off the cents histogram. One row: n, p50_cents, p90_cents,
    p99_cents, total_cents."""

    def partial(t: pa.Table) -> pd.DataFrame:
        ep = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        tax = t["l_tax"].to_numpy(zero_copy_only=False)
        cents = np.floor(
            ep * (1.0 - disc) * (1.0 + tax) * 100.0 + 0.5
        ).astype(np.int64)
        h = pd.Series(cents).groupby(cents).size()
        return pd.DataFrame(
            {"y": h.index.to_numpy(np.int64), "c": h.to_numpy(np.int64)}
        )

    hist = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_extendedprice", "l_discount", "l_tax"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("y")["c"]
        .sum()
        .sort_index()
    )
    cols = ["n", "p50_cents", "p90_cents", "p99_cents", "total_cents"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if hist.empty:
        return empty
    y = hist.index.to_numpy(np.int64)
    c = hist.to_numpy(np.int64)
    n = int(c.sum())
    cum = np.cumsum(c)
    total = int((y.astype(object) * c.astype(object)).sum())

    def pick(num: int, den: int) -> int:
        need = (num * n + den - 1) // den
        return int(y[int(np.searchsorted(cum, need, side="left"))])

    return pd.DataFrame(
        [
            (
                np.int64(n), np.int64(pick(1, 2)), np.int64(pick(9, 10)),
                np.int64(pick(99, 100)), np.int64(total),
            )
        ],
        columns=cols,
    ).astype({c_: np.int64 for c_ in cols})


ORACLES394["lineitem_net_revenue_quantiles"] = """
WITH b AS (
  SELECT CAST(floor(l_extendedprice * (1.0 - l_discount)
                    * (1.0 + l_tax) * 100.0 + 0.5) AS BIGINT) AS y
  FROM lineitem
),
h AS (SELECT y, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1),
nn AS (SELECT CAST(sum(c) AS BIGINT) AS n,
              CAST(sum(CAST(y AS HUGEINT) * c) AS HUGEINT) AS tot
       FROM h),
cum AS (SELECT y, sum(c) OVER (ORDER BY y) AS cc FROM h),
p50 AS (SELECT min(y) AS v FROM cum, nn WHERE cc >= (nn.n + 1) // 2),
p90 AS (SELECT min(y) AS v FROM cum, nn
        WHERE cc >= (9 * nn.n + 9) // 10),
p99 AS (SELECT min(y) AS v FROM cum, nn
        WHERE cc >= (99 * nn.n + 99) // 100)
SELECT nn.n, p50.v AS p50_cents, p90.v AS p90_cents,
       p99.v AS p99_cents, CAST(nn.tot AS BIGINT) AS total_cents
FROM nn, p50, p90, p99"""


# ---------------------------------------------------------------------------
# docs_source_nb_classifier — multinomial naive Bayes
# ---------------------------------------------------------------------------


def q_docs_source_nb_classifier(sf_dir: str):
    """Multinomial NB: train on even doc_ids ((source, word) counts,
    add-one over the TRAIN vocabulary), classify odd doc_ids by
    argmax ln prior + sum c_w ln p(w|source) (unknown test words skip;
    score folds in word order; ties -> alphabetically first source).
    One row: n_train, n_test, n_sources, n_correct, acc_micro."""

    def partial(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t["text"]), r"\s+"
        ).combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = np.asarray(toks.flatten().to_numpy(zero_copy_only=False))
        did = np.repeat(
            t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64),
            lens,
        )
        src = np.repeat(t["source"].to_numpy(zero_copy_only=False), lens)
        keep = flat != ""
        g = (
            pd.DataFrame(
                {"d": did[keep], "src": src[keep], "w": flat[keep]}
            )
            .groupby(["d", "src", "w"])
            .size()
            .rename("c")
            .reset_index()
        )
        g["c"] = g["c"].astype(np.int64)
        return g

    wc = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["d", "src", "w"])["c"]
        .sum()
        .reset_index()
    )
    cols = ["n_train", "n_test", "n_sources", "n_correct", "acc_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if wc.empty:
        return empty
    train = wc[wc["d"] % 2 == 0]
    test = wc[wc["d"] % 2 == 1]
    if train.empty or test.empty:
        return empty
    srcs = sorted(train["src"].unique())
    if len(srcs) < 2:
        return empty
    vocab = sorted(train["w"].unique())
    v = len(vocab)
    vset = set(vocab)
    tw = train.groupby(["src", "w"])["c"].sum()
    ts = train.groupby("src")["c"].sum()
    n_train_docs = int(train["d"].nunique())
    prior = train.groupby("src")["d"].nunique()
    correct = 0
    n_test_docs = 0
    for d_, sub in test.groupby("d"):
        n_test_docs += 1
        true_src = sub["src"].iloc[0]
        words = sub.sort_values("w")
        best = None
        best_src = None
        for s_ in srcs:
            score = float(np.log(
                float(int(prior[s_])) / float(n_train_docs)
            ))
            den = int(ts[s_]) + v
            for _, r in words.iterrows():
                if r["w"] not in vset:
                    continue
                num = int(tw.get((s_, r["w"]), 0)) + 1
                score = score + float(int(r["c"])) * float(
                    np.log(float(num) / float(den))
                )
            if best is None or score > best:
                best = score
                best_src = s_
        if best_src == true_src:
            correct += 1
    return pd.DataFrame(
        [
            (
                np.int64(n_train_docs), np.int64(n_test_docs),
                np.int64(len(srcs)), np.int64(correct),
                np.int64(np.floor(
                    float(correct) / float(n_test_docs)
                    * 1_000_000.0 + 0.5
                )),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES394["docs_source_nb_classifier"] = r"""
WITH tok AS (
  SELECT doc_id AS d, source AS src,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS w
  FROM documents
),
wc AS (
  SELECT d, src, w, CAST(count(*) AS BIGINT) AS c
  FROM tok GROUP BY 1, 2, 3
),
train AS (SELECT * FROM wc WHERE d % 2 = 0),
test AS (SELECT * FROM wc WHERE d % 2 = 1),
srcs AS (SELECT DISTINCT src FROM train),
vocab AS (SELECT DISTINCT w FROM train),
vsz AS (SELECT CAST(count(*) AS BIGINT) AS v FROM vocab),
tw AS (SELECT src, w, CAST(sum(c) AS BIGINT) AS c
       FROM train GROUP BY 1, 2),
ts AS (SELECT src, CAST(sum(c) AS BIGINT) AS c FROM train GROUP BY 1),
prior AS (
  SELECT src, CAST(count(DISTINCT d) AS BIGINT) AS nd
  FROM train GROUP BY 1
),
ntr AS (SELECT CAST(count(DISTINCT d) AS BIGINT) AS n FROM train),
terms AS (
  SELECT t2.d, s.src, t2.w,
         CAST(t2.c AS DOUBLE)
           * ln(CAST(coalesce(tw.c, 0) + 1 AS DOUBLE)
                / (ts.c + vsz.v)) AS t
  FROM test t2
  JOIN vocab ON vocab.w = t2.w
  CROSS JOIN srcs s
  JOIN ts ON ts.src = s.src
  LEFT JOIN tw ON tw.src = s.src AND tw.w = t2.w, vsz
),
folded AS (
  SELECT d, src,
         list_reduce(list_prepend(0.0, list(t ORDER BY w)),
                     (a, b) -> a + b) AS acc
  FROM terms GROUP BY 1, 2
),
scores AS (
  SELECT te.d, s.src,
         ln(CAST(prior.nd AS DOUBLE) / ntr.n)
           + coalesce(folded.acc, 0.0) AS score
  FROM (SELECT DISTINCT d FROM test) te
  CROSS JOIN srcs s
  JOIN prior ON prior.src = s.src
  LEFT JOIN folded ON folded.d = te.d AND folded.src = s.src, ntr
),
pick AS (
  SELECT d, src,
         row_number() OVER (PARTITION BY d
                            ORDER BY score DESC, src) AS rk
  FROM scores
),
truth AS (SELECT DISTINCT d, src FROM test),
hit AS (
  SELECT pick.d,
         CASE WHEN pick.src = truth.src THEN 1 ELSE 0 END AS ok
  FROM pick JOIN truth USING (d)
  WHERE pick.rk = 1
),
f AS (
  SELECT ntr.n AS ntrain,
         (SELECT CAST(count(*) AS BIGINT) FROM hit) AS ntest,
         (SELECT CAST(count(*) AS BIGINT) FROM srcs) AS ns,
         (SELECT CAST(sum(ok) AS BIGINT) FROM hit) AS correct
  FROM ntr
)
SELECT ntrain AS n_train, ntest AS n_test, ns AS n_sources,
       correct AS n_correct,
       CAST(floor(CAST(correct AS DOUBLE) / ntest * 1000000.0 + 0.5)
            AS BIGINT) AS acc_micro
FROM f
WHERE ntrain > 0 AND ntest > 0 AND ns >= 2"""


QUERIES394 = {
    "lineitem_net_revenue_quantiles": q_lineitem_net_revenue_quantiles,
    "docs_source_nb_classifier": q_docs_source_nb_classifier,
}
