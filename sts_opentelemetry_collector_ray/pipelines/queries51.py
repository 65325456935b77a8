"""Driver-contract queries, wave 51 — split-conformal calibration quantile
(the conformal-prediction q̂ with finite-sample coverage guarantee) over the
oracled hash-classifier scores, and mutual information between event type and
value bin (the feature-relevance / dependence measure). Same contract as
queries.py: column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .queries10 import _fnv32_sql

ORACLES51: dict[str, str] = {}

_CF_ALPHA_NUM = 9  # 1 − α = 9/10
_MI_BINS = 10


# ---------------------------------------------------------------------------
# docs_conformal_qhat — split-conformal quantile + empirical coverage
# ---------------------------------------------------------------------------


def q_docs_conformal_qhat(sf_dir: str):
    """Split-conformal calibration (Vovk et al.; the distribution-free
    coverage recipe): docs hash-split into calibration/test halves, q̂ is the
    ⌈(n_cal+1)·0.9⌉-th smallest calibration score (clipped to the max — the
    finite-sample rank rule), and the test half reports its empirical
    coverage P(score ≤ q̂). Integer scores and pure-integer rank/coverage
    math — no float anywhere.

    Scores come from the oracled hash classifier inside the same map_batches;
    the exchange carries (split, score, count) histogram partials — bounded by
    the distinct-score domain."""
    from ..functions.hashing import fnv1a32_arrow
    from ..stages.classify import hash_classifier_batch

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        scored = hash_classifier_batch(t)
        split = (
            fnv1a32_arrow(pc.cast(scored["doc_id"], pa.string()))
            % np.uint64(2)
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "split": split,
                "score": scored["score_int"].to_numpy(zero_copy_only=False),
            }
        )
        out = (
            df.groupby(["split", "score"], sort=False)
            .size()
            .rename("cnt")
            .reset_index()
        )
        out["cnt"] = out["cnt"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
            None
        )

    hist = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: distinct-score rows per block
        .groupby(["split", "score"])["cnt"]
        .sum()
    )
    cal = hist.loc[0].sort_index()
    test = hist.loc[1].sort_index()
    n_cal = int(cal.sum())
    n_test = int(test.sum())
    rank = ((n_cal + 1) * _CF_ALPHA_NUM + _CF_ALPHA_NUM) // 10  # ceil((n+1)·9/10)
    rank = min(rank, n_cal)  # finite-sample clip (both sides)
    cum = cal.to_numpy().cumsum()
    q_hat = int(cal.index.to_numpy()[int(np.argmax(cum >= rank))])
    covered = int(test[test.index <= q_hat].sum())
    coverage_micro = (2 * 1_000_000 * covered + n_test) // (2 * n_test)
    return pd.DataFrame(
        {
            "n_cal": [np.int64(n_cal)],
            "n_test": [np.int64(n_test)],
            "q_hat": [np.int64(q_hat)],
            "covered": [np.int64(covered)],
            "coverage_micro": [np.int64(coverage_micro)],
        }
    )


def _conformal_oracle() -> str:
    from ..stages.classify import CLASSIFIER_BUCKETS, classifier_weights

    w = classifier_weights()
    values = ", ".join(f"({b}, {int(w[b])})" for b in range(CLASSIFIER_BUCKETS))
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS ws FROM documents
),
feats AS (
  SELECT doc_id, 'u:' || unnest(ws) AS f FROM toks
  UNION ALL
  SELECT doc_id,
         unnest(list_transform(range(1, len(ws)),
                               i -> 'b:' || ws[i] || ' ' || ws[i + 1])) AS f
  FROM toks
),
w(b, wt) AS (VALUES {values}),
scored AS (
  SELECT doc_id, CAST(sum(wt) AS BIGINT) AS score
  FROM feats JOIN w ON ({_fnv32_sql('f')} % {CLASSIFIER_BUCKETS}) = w.b
  GROUP BY doc_id
),
split AS (
  SELECT score, {_fnv32_sql("CAST(doc_id AS VARCHAR)")} % 2 AS s FROM scored
),
sizes AS (
  SELECT CAST(count(*) FILTER (s = 0) AS BIGINT) AS n_cal,
         CAST(count(*) FILTER (s = 1) AS BIGINT) AS n_test
  FROM split
),
rk AS (
  SELECT n_cal, n_test,
         least(((n_cal + 1) * {_CF_ALPHA_NUM} + {_CF_ALPHA_NUM}) // 10, n_cal)
           AS r
  FROM sizes
),
cal AS (
  SELECT score, row_number() OVER (ORDER BY score) AS rn
  FROM split WHERE s = 0
),
qh AS (SELECT CAST(cal.score AS BIGINT) AS q_hat FROM cal, rk WHERE cal.rn = rk.r),
cov AS (
  SELECT CAST(count(*) FILTER (score <= qh.q_hat) AS BIGINT) AS covered
  FROM split, qh WHERE s = 1
)
SELECT rk.n_cal, rk.n_test, qh.q_hat, cov.covered,
       (2 * 1000000 * cov.covered + rk.n_test) // (2 * rk.n_test)
         AS coverage_micro
FROM rk, qh, cov"""


ORACLES51["docs_conformal_qhat"] = _conformal_oracle()


# ---------------------------------------------------------------------------
# events_mutual_information — MI(event_type; value bin)
# ---------------------------------------------------------------------------


def q_events_mutual_information(sf_dir: str):
    """Mutual information between event type and value decile bin (the
    feature-relevance measure): MI = Σ p(x,y)·ln(n·n_xy/(n_x·n_y)) over the
    occupied cells of the bounded contingency grid, summed in fixed
    (type, bin) order (sequential cumsum ≡ ordered list_sum). Counts exact;
    each ln term derives in SQL expression order.

    Bins reuse the PSI machinery: 10 equal-width integer-cent bins over the
    global range from a tiny bounds pass; (type, bin) count partials are the
    only exchange."""

    path = f"{sf_dir}/events.parquet"
    b = (
        ray.data.read_parquet(path, columns=["value"])
        .map_batches(
            lambda t: pa.table(
                {
                    "mnc": pa.array(
                        [
                            np.floor(
                                t["value"].to_numpy(zero_copy_only=False) * 100.0
                                + 0.5
                            )
                            .astype(np.int64)
                            .min()
                        ]
                    ),
                    "mxc": pa.array(
                        [
                            np.floor(
                                t["value"].to_numpy(zero_copy_only=False) * 100.0
                                + 0.5
                            )
                            .astype(np.int64)
                            .max()
                        ]
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    mnc, mxc = int(b["mnc"].min()), int(b["mxc"].max())
    width = (mxc - mnc) // _MI_BINS + 1

    def partial(t: pa.Table) -> pa.Table:
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        bins = (cents - mnc) // width
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_numpy(zero_copy_only=False),
                "bin": bins,
            }
        )
        out = (
            df.groupby(["event_type", "bin"], sort=False)
            .size()
            .rename("cnt")
            .reset_index()
        )
        out["cnt"] = out["cnt"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
            None
        )

    joint = (
        ray.data.read_parquet(path, columns=["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: ≤ types×bins rows per block
        .groupby(["event_type", "bin"])["cnt"]
        .sum()
        .reset_index()
        .sort_values(["event_type", "bin"], kind="mergesort")
    )
    n = int(joint["cnt"].sum())
    nx = joint.groupby("event_type")["cnt"].sum()
    ny = joint.groupby("bin")["cnt"].sum()
    nxy = joint["cnt"].to_numpy().astype(np.float64)
    nx_ = nx.loc[joint["event_type"]].to_numpy().astype(np.float64)
    ny_ = ny.loc[joint["bin"]].to_numpy().astype(np.float64)
    terms = (nxy / n) * np.log(n * nxy / (nx_ * ny_))
    mi = terms.cumsum()[-1]  # fixed (type, bin) order ≡ ordered list_sum
    return pd.DataFrame(
        {
            "n": [np.int64(n)],
            "n_cells": [np.int64(len(joint))],
            "mi_micro": [np.int64(np.floor(mi * 1e6 + 0.5))],
        }
    )


ORACLES51["events_mutual_information"] = f"""
WITH c AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
g AS (SELECT min(cents) mnc, max(cents) mxc FROM c),
binned AS (
  SELECT event_type, (cents - mnc) // ((mxc - mnc) // {_MI_BINS} + 1) AS bin
  FROM c CROSS JOIN g
),
joint AS (
  SELECT event_type, bin, CAST(count(*) AS BIGINT) AS nxy
  FROM binned GROUP BY 1, 2
),
mx AS (SELECT event_type, CAST(SUM(nxy) AS BIGINT) AS nx FROM joint GROUP BY 1),
my AS (SELECT bin, CAST(SUM(nxy) AS BIGINT) AS ny FROM joint GROUP BY 1),
tot AS (SELECT CAST(SUM(nxy) AS BIGINT) AS n FROM joint),
terms AS (
  SELECT j.event_type, j.bin,
         (j.nxy * 1.0 / tot.n)
         * ln(tot.n * 1.0 * j.nxy / (mx.nx * 1.0 * my.ny)) AS term
  FROM joint j JOIN mx USING (event_type) JOIN my USING (bin) CROSS JOIN tot
)
SELECT (SELECT n FROM tot) AS n,
       CAST(count(*) AS BIGINT) AS n_cells,
       CAST(floor(list_sum(list(term ORDER BY event_type, bin)) * 1000000
                  + 0.5) AS BIGINT) AS mi_micro
FROM terms"""


QUERIES51 = {
    "docs_conformal_qhat": q_docs_conformal_qhat,
    "events_mutual_information": q_events_mutual_information,
}
