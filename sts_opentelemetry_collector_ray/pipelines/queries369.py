"""Driver-contract queries, wave 369 — assistant response latency
after user turns (exact order statistics over the gap histogram) and a
32-bit token-weighted SimHash collision census over documents. Same
contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES369: dict[str, str] = {}

_RL_BUCKETS = 64


# ---------------------------------------------------------------------------
# conv_response_latency — user -> assistant turn gaps
# ---------------------------------------------------------------------------


def q_conv_response_latency(sf_dir: str):
    """How fast does the assistant respond? Within each conversation
    (turn_idx order) the ts gap of every user -> assistant adjacent
    pair; exact lower median and ceil(0.9 n) P90 off the merged gap
    histogram; mean with milli rounding. One row: n_pairs, median_us,
    p90_us, mean_us_milli.

    Scale shape: ONE conv-bucket exchange; per-bucket gap histograms
    merge into a driver-side order-stat scan."""
    from ..functions.hashing import fnv1a64_array
    from ..sources.transcripts import derive_transcripts_from_events

    ds = derive_transcripts_from_events(sf_dir)

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "conv": np.asarray(
                    t["conv_id"].to_numpy(zero_copy_only=False)
                ),
                "turn": t["turn_idx"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
                "role": np.asarray(
                    t["role"].to_numpy(zero_copy_only=False)
                ),
                "ts": pa.compute.cast(t["ts"], pa.int64()).to_numpy(),
            }
        )
        df["_b"] = (
            fnv1a64_array(df["conv"].to_numpy(object))
            % np.uint64(_RL_BUCKETS)
        ).astype(np.int64)
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        zero = pd.DataFrame(
            {"d": pd.Series([], dtype=np.int64),
             "c": pd.Series([], dtype=np.int64)}
        )
        if len(g) == 0:
            return zero
        g = g.sort_values(["conv", "turn"], kind="stable")
        conv = g["conv"].to_numpy(object)
        role = g["role"].to_numpy(object)
        ts = g["ts"].to_numpy(np.int64)
        same = conv[1:] == conv[:-1]
        mask = same & (role[:-1] == "user") & (role[1:] == "assistant")
        gaps = (ts[1:] - ts[:-1])[mask]
        if len(gaps) == 0:
            return zero
        h = pd.Series(gaps).groupby(gaps).size()
        return pd.DataFrame(
            {"d": h.index.to_numpy(np.int64), "c": h.to_numpy(np.int64)}
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .groupby("d")["c"]
        .sum()
        .sort_index()
    )
    cols = ["n_pairs", "median_us", "p90_us", "mean_us_milli"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if hist.empty:
        return empty
    d = hist.index.to_numpy(np.int64)
    c = hist.to_numpy(np.int64)
    n = int(c.sum())
    cum = np.cumsum(c)
    med = int(d[int(np.searchsorted(cum, (n + 1) // 2, side="left"))])
    p90 = int(d[int(np.searchsorted(cum, (9 * n + 9) // 10, side="left"))])
    total = int((d.astype(object) * c.astype(object)).sum())
    return pd.DataFrame(
        [
            (
                np.int64(n), np.int64(med), np.int64(p90),
                np.int64(np.floor(
                    float(total) / float(n) * 1_000.0 + 0.5
                )),
            )
        ],
        columns=cols,
    ).astype({c_: np.int64 for c_ in cols})


def _latency_oracle() -> str:
    from ..sources.transcripts import TRANSCRIPTS_FROM_EVENTS_SQL

    return (
        TRANSCRIPTS_FROM_EVENTS_SQL
        + """,
seq AS (
  SELECT conv_id, role,
         lag(role) OVER w AS pr,
         epoch_us(ts) - lag(epoch_us(ts)) OVER w AS d
  FROM transcripts
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
gaps AS (
  SELECT CAST(d AS BIGINT) AS d FROM seq
  WHERE pr = 'user' AND role = 'assistant'
),
h AS (SELECT d, CAST(count(*) AS BIGINT) AS c FROM gaps GROUP BY 1),
nn AS (SELECT CAST(sum(c) AS BIGINT) AS n,
              CAST(sum(CAST(d AS HUGEINT) * c) AS HUGEINT) AS tot
       FROM h),
cum AS (SELECT d, sum(c) OVER (ORDER BY d) AS cc FROM h),
med AS (SELECT min(d) AS v FROM cum, nn WHERE cc >= (nn.n + 1) // 2),
p90 AS (SELECT min(d) AS v FROM cum, nn
        WHERE cc >= (9 * nn.n + 9) // 10)
SELECT nn.n AS n_pairs, med.v AS median_us, p90.v AS p90_us,
       CAST(floor(CAST(nn.tot AS DOUBLE) / nn.n * 1000.0 + 0.5)
            AS BIGINT) AS mean_us_milli
FROM nn, med, p90
WHERE nn.n > 0"""
    )


# ---------------------------------------------------------------------------
# docs_simhash_collisions — 32-bit weighted SimHash census
# ---------------------------------------------------------------------------


def q_docs_simhash_collisions(sf_dir: str):
    """SimHash near-dup signal: per document the 32-bit signature
    (bit b set iff the count-weighted sum of +-1 over token-hash bit b
    is > 0, FNV-1a token hashes); census of signature collisions.
    One row: n_docs, n_distinct_sig, n_collision_groups,
    n_docs_in_collisions, max_group.

    Scale shape: signatures are one int64 per doc off the wordcount
    exchange; the census is a count-by-signature fold."""
    from ..functions.hashing import fnv1a32_arrow

    def partial(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t["text"]), r"\s+"
        ).combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = toks.flatten()
        did = np.repeat(np.arange(len(t), dtype=np.int64), lens)
        fl_np = np.asarray(flat.to_numpy(zero_copy_only=False))
        keep = fl_np != ""
        h = fnv1a32_arrow(flat).astype(np.int64)[keep]
        did = did[keep]
        # per-doc weighted bit sums (token multiplicity via repetition)
        bits = ((h[:, None] >> np.arange(32)) & 1) * 2 - 1
        acc = np.zeros((len(t), 32), np.int64)
        np.add.at(acc, did, bits)
        sig = ((acc > 0).astype(np.int64)
               << np.arange(32, dtype=np.int64)).sum(axis=1)
        g = pd.Series(sig).groupby(sig).size()
        return pd.DataFrame(
            {"sig": g.index.to_numpy(np.int64),
             "c": g.to_numpy(np.int64)}
        )

    census = (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                              columns=["text"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("sig")["c"]
        .sum()
    )
    cols = ["n_docs", "n_distinct_sig", "n_collision_groups",
            "n_docs_in_collisions", "max_group"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if census.empty:
        return empty
    c = census.to_numpy(np.int64)
    coll = c[c >= 2]
    return pd.DataFrame(
        [
            (
                np.int64(int(c.sum())), np.int64(len(c)),
                np.int64(len(coll)),
                np.int64(int(coll.sum()) if len(coll) else 0),
                np.int64(int(c.max())),
            )
        ],
        columns=cols,
    ).astype({c_: np.int64 for c_ in cols})


ORACLES369["docs_simhash_collisions"] = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS w
  FROM documents
),
wc AS (
  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS cnt
  FROM tok GROUP BY 1, 2
),
hashed AS (
  SELECT doc_id, cnt,
         list_reduce(list_prepend(2166136261::BIGINT,
           list_transform(string_split(w, ''),
                          c -> unicode(c)::BIGINT)),
           (acc, x) -> (xor(acc, x) * 16777619) % 4294967296) AS h
  FROM wc
),
bits AS (
  SELECT hashed.doc_id, CAST(b.range AS BIGINT) AS b,
         CAST(sum(hashed.cnt
                  * (2 * ((hashed.h >> CAST(b.range AS BIGINT)) & 1)
                     - 1)) AS BIGINT) AS s
  FROM hashed, range(0, 32) b
  GROUP BY 1, 2
),
sigs AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN s > 0
                       THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT)
           AS sig
  FROM bits GROUP BY 1
),
census AS (
  SELECT sig, CAST(count(*) AS BIGINT) AS c FROM sigs GROUP BY 1
)
SELECT CAST(sum(c) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_distinct_sig,
       CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_collision_groups,
       CAST(coalesce(sum(CASE WHEN c >= 2 THEN c END), 0) AS BIGINT)
         AS n_docs_in_collisions,
       CAST(max(c) AS BIGINT) AS max_group
FROM census
HAVING sum(c) > 0"""


def _register_dynamic() -> None:
    ORACLES369["conv_response_latency"] = _latency_oracle()


_register_dynamic()

QUERIES369 = {
    "conv_response_latency": q_conv_response_latency,
    "docs_simhash_collisions": q_docs_simhash_collisions,
}
