"""Driver-contract queries, wave 202 — greedy maximum-coverage document
selection (Nemhauser-Wolsey-Fisher greedy, 10 rounds of a distributed
argmax with broadcast covered-set state) and runs-declustering of daily
count exceedances with the extremal-index estimate.
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES202: dict[str, str] = {}

_GC_STEPS = 10


# ---------------------------------------------------------------------------
# docs_greedy_coverage — 10-round greedy max-coverage selection
# ---------------------------------------------------------------------------


def q_docs_greedy_coverage(sf_dir: str):
    """Select 10 documents greedily maximizing covered vocabulary (ties →
    lowest doc_id; the classic (1−1/e) max-coverage greedy). Output per
    step: the chosen doc_id, its marginal gain and the cumulative covered
    vocabulary size.

    Scale shape: each round is ONE map_batches combiner over docs — every
    batch emits its local best (gain, doc_id) given the BROADCAST covered
    set (bounded vocabulary); the driver folds blocks×1 rows per round.
    10 rounds = 10 streaming passes, no shuffle, no driver text."""
    path = f"{sf_dir}/documents.parquet"
    ds = ray.data.read_parquet(path, columns=["doc_id", "text"]).materialize()
    covered: frozenset = frozenset()
    chosen: set = set()
    rows = []
    for step in range(1, _GC_STEPS + 1):
        cov, sel = covered, frozenset(chosen)

        def best_partial(t: pa.Table, cov=cov, sel=sel) -> pd.DataFrame:
            ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), np.int64)
            toks = pc.split_pattern(t["text"], " ")
            toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
            flat = np.asarray(toks.flatten().to_numpy(zero_copy_only=False), object)
            off = np.asarray(toks.offsets.to_numpy(zero_copy_only=False), np.int64)
            counts = np.diff(off)
            di = np.repeat(np.arange(len(ids)), counts)
            df = pd.DataFrame({"di": di, "w": flat})
            df = df[(df["w"] != "") & ~df["w"].isin(cov)].drop_duplicates()
            gains = np.zeros(len(ids), np.int64)
            if not df.empty:
                g = df.groupby("di").size()
                gains[g.index.to_numpy()] = g.to_numpy()
            keep = ~np.isin(ids, np.fromiter(sel, np.int64, len(sel)))
            if not keep.any():
                return pd.DataFrame(
                    {"doc_id": pd.Series([], dtype=np.int64),
                     "gain": pd.Series([], dtype=np.int64),
                     "new_words": pd.Series([], dtype=object)}
                )
            ids_k, gains_k = ids[keep], gains[keep]
            order = np.lexsort((ids_k, -gains_k))
            win = int(np.flatnonzero(keep)[order[0]])
            nw = " ".join(sorted(df[df["di"] == win]["w"].to_numpy(object)))
            return pd.DataFrame(
                {"doc_id": [np.int64(ids_k[order[0]])],
                 "gain": [np.int64(gains_k[order[0]])],
                 "new_words": [nw]}
            )

        part = ds.map_batches(best_partial, batch_format="pyarrow").to_pandas()
        if part.empty:
            break
        part = part.sort_values(
            ["gain", "doc_id"], ascending=[False, True], kind="mergesort"
        )
        doc_id = int(part["doc_id"].iloc[0])
        gain = int(part["gain"].iloc[0])
        words = {w for w in str(part["new_words"].iloc[0]).split(" ") if w != ""}
        covered = frozenset(covered | words)
        chosen.add(doc_id)
        rows.append(
            (np.int64(step), np.int64(doc_id), np.int64(gain),
             np.int64(len(covered)))
        )
    cols = ["step", "doc_id", "gain", "covered_total"]
    return pd.DataFrame(rows, columns=cols).astype(np.int64)


def _gc_oracle() -> str:
    parts = [
        """
WITH dw AS MATERIALIZED (
  SELECT doc_id,
         list_distinct(list_filter(string_split(text, ' '), w -> w <> '')) AS ws
  FROM documents
)"""
    ]
    prev_cov = "[]::VARCHAR[]"
    sel_clause = ""
    sel_names: list[str] = []
    for k in range(1, _GC_STEPS + 1):
        parts.append(f""",
s{k} AS MATERIALIZED (
  SELECT dw.doc_id, dw.ws,
         len(list_filter(dw.ws, w -> NOT list_contains({prev_cov}, w))) AS gain
  FROM dw{(', ' + ', '.join('c' + str(j) for j in range(1, k))) if k > 1 else ''}
  {sel_clause}
  ORDER BY gain DESC, dw.doc_id ASC LIMIT 1
),
c{k} AS MATERIALIZED (
  SELECT list_distinct(list_cat({prev_cov}, s{k}.ws)) AS cov, s{k}.doc_id,
         s{k}.gain
  FROM s{k}{(', ' + ', '.join('c' + str(j) for j in range(1, k))) if k > 1 else ''}
)""")
        sel_names.append(f"s{k}")
        prev_cov = f"c{k}.cov"
        sel_clause = "WHERE dw.doc_id NOT IN (" + " UNION ALL ".join(
            f"SELECT doc_id FROM c{j}" for j in range(1, k + 1)
        ) + ")"
    selects = " UNION ALL ".join(
        f"SELECT {k} AS step, CAST(c{k}.doc_id AS BIGINT) AS doc_id, "
        f"CAST(c{k}.gain AS BIGINT) AS gain, "
        f"CAST(len(c{k}.cov) AS BIGINT) AS covered_total FROM c{k}"
        for k in range(1, _GC_STEPS + 1)
    )
    return "".join(parts) + f"\nSELECT CAST(step AS BIGINT) AS step, doc_id, gain, covered_total FROM ({selects}) ORDER BY step"


ORACLES202["docs_greedy_coverage"] = _gc_oracle()


# ---------------------------------------------------------------------------
# events_extremal_index — runs declustering of daily exceedances
# ---------------------------------------------------------------------------


def q_events_extremal_index(sf_dir: str):
    """Per event type: daily counts exceeding u = mean + 1σ decluster into
    runs of CALENDAR-consecutive days; the runs (intervals) estimator of
    the extremal index is θ̂ = clusters/exceedances (Ferro & Segers 2003
    simplified to run declustering). Output: event_type, n_exceed,
    n_clusters, max_run, theta_micro.

    Scale shape: bounded daily fold + one vectorized run scan per type —
    no shuffle."""
    path = f"{sf_dir}/events.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["event_type", "ts"]).to_pandas()
        day = (df["ts"].dt.normalize() - pd.Timestamp("1970-01-01")).dt.days
        df["day"] = day.to_numpy(np.int64)
        g = (
            df.groupby(["event_type", "day"], sort=False, as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return g.astype({"n": np.int64})

    part = (
        ray.data.read_parquet(path, columns=["event_type", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["event_type", "n_exceed", "n_clusters", "max_run", "theta_micro"]
    empty = pd.DataFrame(
        {c: pd.Series([], dtype=(object if c == "event_type" else np.int64))
         for c in cols}
    )
    if part.empty:
        return empty
    daily = (
        part.groupby(["event_type", "day"], as_index=False)["n"]
        .sum()
        .sort_values(["event_type", "day"], kind="mergesort")
    )
    rows = []
    for et, sub in daily.groupby("event_type", sort=True):
        n = sub["n"].to_numpy(np.float64)
        day = sub["day"].to_numpy(np.int64)
        mean = n.sum() / len(n)
        sd = np.sqrt(max(n @ n / len(n) - mean * mean, 0.0))
        u = mean + sd
        exc = day[n > u]
        if len(exc) == 0:
            continue
        new = np.ones(len(exc), dtype=bool)
        new[1:] = exc[1:] != exc[:-1] + 1
        n_cl = int(new.sum())
        grp = np.cumsum(new) - 1
        max_run = int(np.bincount(grp).max())
        theta = n_cl / float(len(exc))
        rows.append(
            (et, np.int64(len(exc)), np.int64(n_cl), np.int64(max_run),
             np.int64(np.floor(theta * 1_000_000.0 + 0.5)))
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype({c: np.int64 for c in cols[1:]})


ORACLES202["events_extremal_index"] = """
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
         CAST(count(*) AS DOUBLE) AS n
  FROM events GROUP BY 1, 2
),
st AS (
  SELECT event_type,
         sum(n) / count(*) AS mu,
         sqrt(greatest(sum(n * n) / count(*)
              - (sum(n) / count(*)) * (sum(n) / count(*)), 0.0)) AS sd
  FROM daily GROUP BY 1
),
exc AS (
  SELECT daily.event_type, daily.day,
         CASE WHEN daily.day <> lag(daily.day) OVER
                (PARTITION BY daily.event_type ORDER BY daily.day) + 1
              OR lag(daily.day) OVER
                (PARTITION BY daily.event_type ORDER BY daily.day) IS NULL
              THEN 1 ELSE 0 END AS new_cl
  FROM daily JOIN st ON daily.event_type = st.event_type
  WHERE daily.n > st.mu + st.sd
),
cl AS (
  SELECT event_type, day, new_cl,
         sum(new_cl) OVER (PARTITION BY event_type ORDER BY day) AS cid
  FROM exc
),
runs AS (
  SELECT event_type, cid, count(*) AS run_len FROM cl GROUP BY 1, 2
)
SELECT exc2.event_type,
       CAST(exc2.n_exc AS BIGINT) AS n_exceed,
       CAST(exc2.n_cl AS BIGINT) AS n_clusters,
       CAST(r.mx AS BIGINT) AS max_run,
       CAST(floor(CAST(exc2.n_cl AS DOUBLE) / exc2.n_exc * 1000000.0 + 0.5)
            AS BIGINT) AS theta_micro
FROM (
  SELECT event_type, count(*) AS n_exc, sum(new_cl) AS n_cl FROM exc GROUP BY 1
) exc2
JOIN (SELECT event_type, max(run_len) AS mx FROM runs GROUP BY 1) r
  ON exc2.event_type = r.event_type
ORDER BY exc2.event_type"""


QUERIES202 = {
    "docs_greedy_coverage": q_docs_greedy_coverage,
    "events_extremal_index": q_events_extremal_index,
}
