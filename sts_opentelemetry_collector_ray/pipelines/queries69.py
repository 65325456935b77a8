"""Driver-contract queries, wave 69 — per-transition dwell-time profile
(median seconds for each (prev → next) event-type pair; where users stall)
and the hapax ratio per source (vocabulary richness / boilerplate detector).
Same contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES69: dict[str, str] = {}

_TL_BUCKETS = 64
_HAPAX_BUCKETS = 64


# ---------------------------------------------------------------------------
# events_transition_latency — dwell time per (prev, next) type pair
# ---------------------------------------------------------------------------


def q_events_transition_latency(sf_dir: str):
    """Dwell-time profile: for every per-user consecutive event pair in
    (ts, event_id) order, the whole-second gap, aggregated per
    (prev_type, next_type): count, lower-median and max — integer rank picks
    from an exact histogram.

    Scale shape: ONE user-bucket exchange; per-bucket lexsort + vectorized
    shift/diff; bounded (pair, seconds) histogram partials; driver rank
    picks."""

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(
            _b=(df["user_id"].to_numpy(np.int64) % _TL_BUCKETS).astype(np.int64)
        )

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort(
            (
                g["event_id"].to_numpy(np.int64),
                g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64),
                g["user_id"].to_numpy(np.int64),
            )
        )
        uid = g["user_id"].to_numpy(np.int64)[order]
        ts_s = (
            g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)[order]
            // 1_000_000
        )
        et = g["event_type"].to_numpy()[order]
        same = uid[1:] == uid[:-1]
        df = pd.DataFrame(
            {
                "a": et[:-1][same],
                "b": et[1:][same],
                "ds": (ts_s[1:] - ts_s[:-1])[same],
            }
        )
        h = df.groupby(["a", "b", "ds"], sort=False).size().rename("cnt").reset_index()
        h["cnt"] = h["cnt"].astype(np.int64)
        return h

    hist = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "ts", "user_id", "event_type"],
        )
        .map_batches(bucket, batch_format="pandas")
        .groupby("_b")
        .map_groups(scan, batch_format="pandas")
        .to_pandas()  # bounded: |types|^2 x seconds domain
        .groupby(["a", "b", "ds"])["cnt"]
        .sum()
    )
    rows = []
    pairs = sorted(set(zip(hist.index.get_level_values("a"), hist.index.get_level_values("b"))))
    for a, b in pairs:
        sub = hist.loc[(a, b)].sort_index()
        vals = sub.index.to_numpy(np.int64)
        cum = sub.to_numpy(np.int64).cumsum()
        n = int(cum[-1])
        p50 = int(vals[int(np.argmax(cum >= (n + 1) // 2))])
        rows.append((a, b, n, p50, int(vals[-1])))
    return pd.DataFrame(
        {
            "prev_type": [r[0] for r in rows],
            "next_type": [r[1] for r in rows],
            "n": np.array([r[2] for r in rows], np.int64),
            "p50_s": np.array([r[3] for r in rows], np.int64),
            "max_s": np.array([r[4] for r in rows], np.int64),
        }
    )


ORACLES69["events_transition_latency"] = """
WITH o AS (
  SELECT user_id, event_type, epoch_us(ts) // 1000000 AS ts_s,
         lag(event_type) OVER w AS prev_type,
         lag(epoch_us(ts) // 1000000) OVER w AS prev_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
d AS (
  SELECT prev_type, event_type AS next_type, ts_s - prev_s AS ds
  FROM o WHERE prev_type IS NOT NULL
),
r AS (
  SELECT prev_type, next_type, ds,
         row_number() OVER (PARTITION BY prev_type, next_type ORDER BY ds)
           AS rn,
         count(*) OVER (PARTITION BY prev_type, next_type) AS n
  FROM d
)
SELECT prev_type, next_type,
       CAST(any_value(n) AS BIGINT) AS n,
       CAST(min(CASE WHEN rn = (n + 1) // 2 THEN ds END) AS BIGINT) AS p50_s,
       CAST(max(ds) AS BIGINT) AS max_s
FROM r GROUP BY prev_type, next_type ORDER BY prev_type, next_type"""


# ---------------------------------------------------------------------------
# docs_hapax_ratio — hapax-legomena share per source
# ---------------------------------------------------------------------------


def q_docs_hapax_ratio(sf_dir: str):
    """Vocabulary richness per source: distinct tokens, hapax legomena
    (corpus count exactly 1 WITHIN the source) and the hapax share in exact
    integer basis points — high hapax = rich/diverse text, low = boilerplate.

    Scale shape: per-batch (source, token, count) Arrow combiner → ONE
    token-hash bucket exchange (the >10k-group rule: never a Ray aggregate
    over raw vocab) → per-bucket exact re-reduce folds straight to bounded
    (source, n_distinct, n_hapax) partials → tiny driver merge."""
    from ..functions.hashing import fnv1a32_arrow

    def partial(t: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), r"\s+")
        n_per = pc.list_value_length(toks).fill_null(0).to_numpy()
        src = np.repeat(t["source"].to_numpy(zero_copy_only=False), n_per)
        flat = toks.combine_chunks().flatten().to_numpy(zero_copy_only=False)
        keep = flat != ""
        df = pd.DataFrame({"source": src[keep], "token": flat[keep]})
        g = df.groupby(["source", "token"], sort=False).size().rename("cnt").reset_index()
        g["cnt"] = g["cnt"].astype(np.int64)
        g["_b"] = (
            fnv1a32_arrow(pa.array(g["token"].astype(str))) % np.uint64(_HAPAX_BUCKETS)
        ).astype(np.int64)
        return g

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby(["source", "token"], sort=False)["cnt"].sum().reset_index()
        out = (
            m.assign(hapax=(m["cnt"] == 1).astype(np.int64))
            .groupby("source", sort=False)
            .agg(n_distinct=("cnt", "size"), n_hapax=("hapax", "sum"))
            .reset_index()
        )
        out["n_distinct"] = out["n_distinct"].astype(np.int64)
        out["n_hapax"] = out["n_hapax"].astype(np.int64)
        return out

    agg = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["source", "text"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: |sources| per bucket
        .groupby("source")
        .agg(n_distinct=("n_distinct", "sum"), n_hapax=("n_hapax", "sum"))
        .reset_index()
        .sort_values("source", kind="mergesort")
        .reset_index(drop=True)
    )
    d = agg["n_distinct"].to_numpy(np.int64)
    h = agg["n_hapax"].to_numpy(np.int64)
    agg["hapax_bp"] = (20_000 * h + d) // (2 * d)
    for c in ("n_distinct", "n_hapax", "hapax_bp"):
        agg[c] = agg[c].astype(np.int64)
    return agg


ORACLES69["docs_hapax_ratio"] = """
WITH tok AS (
  SELECT source,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                            x -> x <> '')) AS token
  FROM documents
),
tc AS (SELECT source, token, CAST(count(*) AS BIGINT) AS cnt
       FROM tok GROUP BY 1, 2),
a AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_distinct,
         CAST(coalesce(count(*) FILTER (cnt = 1), 0) AS BIGINT) AS n_hapax
  FROM tc GROUP BY 1
)
SELECT source, n_distinct, n_hapax,
       CAST((20000 * n_hapax + n_distinct) // (2 * n_distinct) AS BIGINT)
         AS hapax_bp
FROM a ORDER BY source"""


QUERIES69 = {
    "events_transition_latency": q_events_transition_latency,
    "docs_hapax_ratio": q_docs_hapax_ratio,
}
