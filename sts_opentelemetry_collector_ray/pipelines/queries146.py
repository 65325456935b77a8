"""Driver-contract queries, wave 146 — near-dup dedup yield curve: how many
candidate pairs (and distinct affected documents) survive each similarity
threshold, i.e. the dedup-aggressiveness sweep a curation team runs before
committing to a cutoff. Built ON TOP of the oracled MinHash-LSH pair
pipeline, so the byte-exact signature SQL replays once as a CTE. Same
contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

ORACLES146: dict[str, str] = {}

_YIELD_THRESHOLDS = (500_000, 600_000, 700_000, 800_000, 900_000, 1_000_000)


# ---------------------------------------------------------------------------
# docs_dedup_yield_curve — pairs / affected docs per similarity threshold
# ---------------------------------------------------------------------------


def q_docs_dedup_yield_curve(sf_dir: str):
    """For each threshold t (micro Jaccard, 0.5 … 1.0): candidate pairs with
    estimated signature Jaccard ≥ t/1e6 and the distinct documents those
    pairs touch. Thresholds share the SAME pair set (one LSH run at 0.5),
    so the curve is monotone non-increasing by construction.

    Scale shape: the pair pipeline is the oracled signature-only band
    exchange (stages/dedup_docs.py); the curve itself folds the pair LIST —
    bounded by the near-dup density, orders of magnitude below corpus size —
    with vectorized threshold masks on the driver."""
    from ..stages.dedup_docs import minhash_lsh_pairs

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    pairs = minhash_lsh_pairs(ds, jaccard_threshold=0.5).to_pandas()
    empty = pd.DataFrame(
        {
            "threshold_micro": pd.Series([], dtype=np.int64),
            "n_pairs": pd.Series([], dtype=np.int64),
            "n_docs": pd.Series([], dtype=np.int64),
        }
    )
    if pairs.empty:
        return empty
    j = pairs["jaccard"].to_numpy(np.float64)
    a = pairs["a"].to_numpy(np.int64)
    b = pairs["b"].to_numpy(np.int64)
    rows = []
    for t in _YIELD_THRESHOLDS:
        mask = j >= t / 1_000_000.0
        docs = np.unique(np.concatenate([a[mask], b[mask]]))
        rows.append((t, int(mask.sum()), len(docs)))
    return pd.DataFrame(
        rows, columns=["threshold_micro", "n_pairs", "n_docs"]
    ).astype(np.int64)


def _yield_oracle() -> str:
    from .queries2 import ORACLES2

    pairs_sql = ORACLES2["docs_minhash_pairs"]
    thresholds = ", ".join(str(t) for t in _YIELD_THRESHOLDS)
    return f"""
WITH pairs AS ({pairs_sql}),
th AS (SELECT unnest([{thresholds}]) AS threshold_micro)
SELECT CAST(th.threshold_micro AS BIGINT) AS threshold_micro,
       CAST(count(*) FILTER (p.jaccard >= CAST(th.threshold_micro AS DOUBLE)
                                          / 1000000.0) AS BIGINT) AS n_pairs,
       CAST((SELECT count(*) FROM (
           SELECT a AS d FROM pairs
           WHERE jaccard >= CAST(th.threshold_micro AS DOUBLE) / 1000000.0
           UNION
           SELECT b FROM pairs
           WHERE jaccard >= CAST(th.threshold_micro AS DOUBLE) / 1000000.0))
         AS BIGINT) AS n_docs
FROM th LEFT JOIN pairs p ON true
GROUP BY th.threshold_micro"""


ORACLES146["docs_dedup_yield_curve"] = _yield_oracle()


QUERIES146 = {
    "docs_dedup_yield_curve": q_docs_dedup_yield_curve,
}
