"""Driver-contract queries, wave 13 — windowed rate capping (the batch-honest
analogue of the tail-sampling processor's rate_limiting policy), per-key
running totals (ordered prefix scan in exact integer cents), and corpus-wide
token-pair (bigram) vocabulary. Same contract as queries.py: column names AND
dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES13: dict[str, str] = {}

_RATE_CAP_K = 3
_NUM_BUCKETS = 32


# ---------------------------------------------------------------------------
# events_rate_cap — keep at most K events per (user, hour window)
# ---------------------------------------------------------------------------


def q_events_rate_cap(sf_dir: str):
    """Windowed rate capping: at most K events per (user_id, hour window),
    keeping the earliest by (ts, event_id). This is the deterministic batch
    analogue of the tail-sampling rate_limiting policy
    (/root/reference/agent-otel-builder.yaml:44 ships tailsamplingprocessor);
    the reference caps by arrival order, which a batch replay can't honor, so
    the contract here is replay order = (ts, event_id) — the same policy-set
    posture as stages/tailsampling.py. ONE bounded key-bucket exchange, then a
    vectorized sort + grouped cumcount per bucket (no per-key Python)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        b = (df["user_id"].to_numpy().astype(np.uint64) % _NUM_BUCKETS).astype(
            np.int32
        )
        return df.assign(_b=b)

    def cap(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_b"]).copy()
        g["win"] = g["ts"].dt.floor("h")
        g = g.sort_values(
            ["user_id", "win", "ts", "event_id"], kind="mergesort"
        )
        rk = g.groupby(["user_id", "win"], sort=False).cumcount().to_numpy() + 1
        g["rk"] = rk.astype(np.int64)
        return g.loc[g["rk"] <= _RATE_CAP_K, ["event_id", "user_id", "win", "rk"]]

    b = ds.map_batches(bucketize, batch_format="pandas")
    return b.groupby("_b").map_groups(cap, batch_format="pandas")


ORACLES13["events_rate_cap"] = f"""
SELECT event_id, user_id, win, rk FROM (
  SELECT event_id, user_id, date_trunc('hour', ts) AS win,
         ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                            ORDER BY ts, event_id) AS rk
  FROM events)
WHERE rk <= {_RATE_CAP_K}"""


# ---------------------------------------------------------------------------
# events_running_total — per-user cumulative sum in (ts, event_id) order
# ---------------------------------------------------------------------------


def q_events_running_total(sf_dir: str):
    """Per-key running total (prefix scan) in (ts, event_id) order — the
    cumulative counterpart of the A3 cumulative-flush semantics, per event
    instead of per run. Values sum as exact integer cents (round(value*100)
    is exactly representable) so the scan is bit-identical to the SQL window
    replay. Same shape as stages/clusters.py::rolling_sum: ONE bounded
    key-bucket exchange + a vectorized grouped cumsum per bucket."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        b = (df["user_id"].to_numpy().astype(np.uint64) % _NUM_BUCKETS).astype(
            np.int32
        )
        return df.assign(_b=b)

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        cents = np.round(g["value"].to_numpy(dtype=np.float64) * 100).astype(
            np.int64
        )
        run = (
            pd.Series(cents)
            .groupby(g["user_id"].to_numpy())
            .cumsum()
            .to_numpy()
        )
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "user_id": g["user_id"].to_numpy(),
                "running_cents": run,
            }
        )

    b = ds.map_batches(bucketize, batch_format="pandas")
    return b.groupby("_b").map_groups(scan, batch_format="pandas")


ORACLES13["events_running_total"] = """
SELECT event_id, user_id,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents
FROM events"""


# ---------------------------------------------------------------------------
# docs_token_pairs — corpus-wide top adjacent token pairs (bigram vocabulary)
# ---------------------------------------------------------------------------


def q_docs_token_pairs(sf_dir: str):
    """Bigram vocabulary: corpus-wide adjacent-token-pair counts → top-20.
    The pair stream never leaves the batch raw: a per-batch Arrow group_by
    combiner emits local (pair, count) partials, the global exchange carries
    only distinct pairs per batch, and the final hash aggregate + tiny sort
    produce the head. Pairs are built with one flatten + offset mask — no
    per-row Python (the docs_vocab wordcount idiom extended to order-2)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def local_pairs(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(t["text"], "")), r"\s+"
        ).combine_chunks()
        off = toks.offsets.to_numpy()
        vals = toks.values.slice(off[0], int(off[-1] - off[0]))
        off = off - off[0]
        keep = pc.not_equal(vals, "").to_numpy(zero_copy_only=False)
        fv = vals.filter(pa.array(keep))
        # per-doc token counts after the empty-token filter, then the offsets
        # of the filtered value stream
        cs = np.concatenate([[0], np.cumsum(keep, dtype=np.int64)])
        fcounts = cs[off[1:]] - cs[off[:-1]]
        fo = np.concatenate([[0], np.cumsum(fcounts)])
        n = len(fv)
        if n < 2:
            return pa.table(
                {"pair": pa.array([], pa.string()), "pn": pa.array([], pa.int64())}
            )
        # position i forms a pair with i+1 unless i is the last token of a doc
        valid = np.ones(n, dtype=bool)
        valid[-1] = False
        last = fo[1:][fcounts > 0] - 1
        valid[last] = False
        idx = np.nonzero(valid)[0]
        left = fv.take(pa.array(idx))
        right = fv.take(pa.array(idx + 1))
        pair = pc.binary_join_element_wise(left, right, " ")
        g = (
            pa.table({"pair": pair})
            .group_by(["pair"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["pair", "pn"])

    partials = ds.map_batches(local_pairs, batch_format="pyarrow")
    agg = partials.groupby("pair").aggregate(Sum("pn", alias_name="n"))
    return agg.sort(["n", "pair"], descending=[True, False]).limit(20)


ORACLES13["docs_token_pairs"] = r"""
WITH toks AS (
  SELECT list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                     x -> x <> '') AS l
  FROM documents
), pairs AS (
  SELECT l[i] || ' ' || l[i + 1] AS pair
  FROM toks, UNNEST(range(1, len(l)::BIGINT)) AS t(i)
)
SELECT pair, count(*) AS n
FROM pairs GROUP BY pair ORDER BY n DESC, pair LIMIT 20"""


QUERIES13 = {
    "events_rate_cap": q_events_rate_cap,
    "events_running_total": q_events_running_total,
    "docs_token_pairs": q_docs_token_pairs,
}
