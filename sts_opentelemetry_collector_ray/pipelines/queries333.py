"""Driver-contract queries, wave 333 — the sub-second batching detector
(multi-event seconds vs the Poisson expectation — SDK batch emission
leaves a signature) and the duplicate-length bias audit (are duplicated
documents systematically shorter?). Same contract as queries.py: column
names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES333: dict[str, str] = {}


# ---------------------------------------------------------------------------
# events_subsecond_batching — multi-event seconds vs Poisson
# ---------------------------------------------------------------------------


def q_events_subsecond_batching(sf_dir: str):
    """Batch-emission signature: among ACTIVE seconds (>= 1 event), the
    share with >= 2 events, compared to the Poisson prediction
    P(>=2 | >=1) = (1 - e^-lam - lam e^-lam) / (1 - e^-lam) with
    lam = n / span_seconds. Counting is exact; the Poisson reference is
    one float composition. One row: n_events, span_secs, n_active,
    n_multi, obs_share_micro, poisson_share_micro.

    Scale shape: per-batch (second -> count) combiners; the driver
    folds the bounded active-seconds histogram (at 100 TB the same fold
    rides a second-hash bucket exchange)."""

    def partial(t: pa.Table) -> pd.DataFrame:
        sec = pa.compute.cast(t["ts"], pa.int64()).to_numpy() // 1_000_000
        h = pd.Series(sec).groupby(sec).size()
        return pd.DataFrame(
            {"s": h.index.to_numpy(np.int64), "c": h.to_numpy(np.int64)}
        )

    h = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("s")["c"]
        .sum()
    )
    cols = [
        "n_events", "span_secs", "n_active", "n_multi", "obs_share_micro",
        "poisson_share_micro",
    ]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if h.empty:
        return empty
    n = int(h.sum())
    span = int(h.index.max()) - int(h.index.min()) + 1
    n_active = int(len(h))
    n_multi = int((h >= 2).sum())
    if n_active == 0 or span <= 0:
        return empty
    lam = float(n) / float(span)
    p1 = 1.0 - float(np.exp(-lam))
    if p1 <= 0.0:
        return empty
    p2 = (1.0 - float(np.exp(-lam)) - lam * float(np.exp(-lam))) / p1
    return pd.DataFrame(
        [
            (
                np.int64(n), np.int64(span), np.int64(n_active),
                np.int64(n_multi),
                np.int64(np.floor(
                    float(n_multi) / float(n_active) * 1_000_000.0 + 0.5
                )),
                np.int64(np.floor(p2 * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES333["events_subsecond_batching"] = """
WITH s AS (
  SELECT epoch_us(ts) // 1000000 AS sec, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
m AS (
  SELECT CAST(sum(c) AS BIGINT) AS n,
         CAST(max(sec) - min(sec) + 1 AS BIGINT) AS span,
         CAST(count(*) AS BIGINT) AS n_active,
         CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_multi
  FROM s
),
p AS (
  SELECT n, span, n_active, n_multi,
         CAST(n AS DOUBLE) / span AS lam
  FROM m WHERE n_active > 0 AND span > 0
)
SELECT n AS n_events, span AS span_secs, n_active, n_multi,
       CAST(floor(CAST(n_multi AS DOUBLE) / n_active * 1000000.0 + 0.5)
            AS BIGINT) AS obs_share_micro,
       CAST(floor((1.0 - exp(-lam) - lam * exp(-lam))
                  / (1.0 - exp(-lam)) * 1000000.0 + 0.5) AS BIGINT)
         AS poisson_share_micro
FROM p
WHERE (1.0 - exp(-lam)) > 0"""


# ---------------------------------------------------------------------------
# docs_dup_length_bias — are duplicated documents shorter?
# ---------------------------------------------------------------------------


def q_docs_dup_length_bias(sf_dir: str):
    """Length bias of duplication: split documents into those whose
    text occurs once vs more than once; compare mean character lengths.
    Boilerplate and templates are usually SHORT, so dup sets skew
    short — a bias any dedup step passes downstream. Pure integer
    counting, two divisions. One row: n_unique, n_dup,
    mean_len_unique_milli, mean_len_dup_milli, diff_milli.

    Scale shape: the text-hash bucket exchange of
    `docs_dedup_survivorship`; each bucket emits four scalars."""
    from ..functions.hashing import fnv1a64_array

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "text": np.asarray(t["text"].to_numpy(zero_copy_only=False)),
                "ln": t["n_chars"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
            }
        )
        df["_b"] = (
            fnv1a64_array(df["text"].to_numpy(object)) % np.uint64(64)
        ).astype(np.int64)
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        zero = pd.DataFrame(
            {c: pd.Series([], dtype=np.int64)
             for c in ("nu", "nd", "su", "sd")}
        )
        if len(g) == 0:
            return zero
        mult = g.groupby("text")["text"].transform("size")
        is_dup = (mult >= 2).to_numpy()
        ln = g["ln"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "nu": [np.int64(int((~is_dup).sum()))],
                "nd": [np.int64(int(is_dup.sum()))],
                "su": [np.int64(int(ln[~is_dup].sum()))],
                "sd": [np.int64(int(ln[is_dup].sum()))],
            }
        )

    p = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["text", "n_chars"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .sum()
    )
    cols = [
        "n_unique", "n_dup", "mean_len_unique_milli", "mean_len_dup_milli",
        "diff_milli",
    ]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    nu, nd = int(p["nu"]), int(p["nd"])
    if nu == 0 or nd == 0:
        return empty
    mu = float(int(p["su"])) / float(nu)
    md = float(int(p["sd"])) / float(nd)
    return pd.DataFrame(
        [
            (
                np.int64(nu), np.int64(nd),
                np.int64(np.floor(mu * 1_000.0 + 0.5)),
                np.int64(np.floor(md * 1_000.0 + 0.5)),
                np.int64(np.floor((md - mu) * 1_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES333["docs_dup_length_bias"] = """
WITH mult AS (
  SELECT n_chars,
         count(*) OVER (PARTITION BY text) AS m
  FROM documents
),
agg AS (
  SELECT
    CAST(sum(CASE WHEN m = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nu,
    CAST(sum(CASE WHEN m >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS nd,
    CAST(sum(CASE WHEN m = 1 THEN n_chars ELSE 0 END) AS BIGINT) AS su,
    CAST(sum(CASE WHEN m >= 2 THEN n_chars ELSE 0 END) AS BIGINT) AS sd
  FROM mult
)
SELECT nu AS n_unique, nd AS n_dup,
       CAST(floor(CAST(su AS DOUBLE) / nu * 1000.0 + 0.5) AS BIGINT)
         AS mean_len_unique_milli,
       CAST(floor(CAST(sd AS DOUBLE) / nd * 1000.0 + 0.5) AS BIGINT)
         AS mean_len_dup_milli,
       CAST(floor((CAST(sd AS DOUBLE) / nd - CAST(su AS DOUBLE) / nu)
                  * 1000.0 + 0.5) AS BIGINT) AS diff_milli
FROM agg
WHERE nu > 0 AND nd > 0"""


QUERIES333 = {
    "events_subsecond_batching": q_events_subsecond_batching,
    "docs_dup_length_bias": q_docs_dup_length_bias,
}
