"""Driver-contract queries, wave 46 — Kaplan–Meier survival estimation (the
time-to-conversion curve with right-censoring at a horizon) and Levenshtein
typo-pair mining over the corpus vocabulary (the fuzzy entity-dedup
candidate generator). Same contract as queries.py: column names AND dtypes
match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES46: dict[str, str] = {}

_KM_USER_BUCKETS = 32
_KM_HORIZON_DAYS = 30
_LEV_MAX_DIST = 2


# ---------------------------------------------------------------------------
# events_km_survival — Kaplan–Meier view→purchase conversion curve
# ---------------------------------------------------------------------------


def q_events_km_survival(sf_dir: str):
    """Kaplan–Meier estimator (Kaplan & Meier 1958) for time-to-conversion:
    per user, duration = days from first 'view' to first subsequent
    'purchase', right-censored at 30 days. S(t) = Π_{t_j ≤ t} (1 − d_j/n_j)
    over event days — computed as a SEQUENTIAL left fold on both sides
    (Python loop over the ≤31-day grid here, `list_reduce` in SQL), so the
    float product replays bit-for-bit, including d = n → S = 0.

    Per-batch per-user (min view ts, min purchase ts) partials → ONE
    user-bucket exchange → per-user duration rows → bounded duration
    histogram to the driver. Output per event day: t_day, n_risk, d_events,
    surv_micro."""

    H = _KM_HORIZON_DAYS
    DAY = 86_400_000_000

    def partial(t: pa.Table) -> pa.Table:
        # views reduce to a per-user min (min of mins is exact); purchases
        # ship UNREDUCED — a per-batch purchase min could mask a later
        # purchase that is the first one ≥ the GLOBAL first view
        tu = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"user_id": uid, "tu": tu, "et": et})
        views = df[df["et"] == "view"].groupby("user_id")["tu"].min()
        pur = df[df["et"] == "purchase"]
        res = pd.DataFrame(
            {
                "user_id": np.concatenate(
                    [views.index.to_numpy(), pur["user_id"].to_numpy()]
                ).astype(np.int64),
                "tu": np.concatenate(
                    [views.to_numpy(), pur["tu"].to_numpy()]
                ).astype(np.int64),
                "kind": np.concatenate(
                    [np.zeros(len(views), np.int8), np.ones(len(pur), np.int8)]
                ),
            }
        )
        res["_b"] = (res["user_id"].to_numpy() % _KM_USER_BUCKETS).astype(np.int32)
        return pa.Table.from_pandas(res, preserve_index=False).replace_schema_metadata(
            None
        )

    def durations(g: pd.DataFrame) -> pd.DataFrame:
        v = g[g["kind"] == 0].groupby("user_id")["tu"].min()
        users = pd.DataFrame(
            {"user_id": v.index.to_numpy(), "tv": v.to_numpy()}
        )
        p = g[g["kind"] == 1][["user_id", "tu"]].merge(users, on="user_id")
        p = p[p["tu"] >= p["tv"]]
        tp = p.groupby("user_id")["tu"].min()
        users["tp"] = users["user_id"].map(tp)
        dur_days = (users["tp"].to_numpy() - users["tv"].to_numpy()) // DAY
        has_event = users["tp"].notna().to_numpy() & (dur_days <= H)
        t = np.where(has_event, dur_days, H).astype(np.int64)
        ev = has_event.astype(np.int64)
        out = pd.DataFrame({"t": t, "ev": ev})
        hist = out.groupby(["t", "ev"]).size().rename("cnt").reset_index()
        hist["cnt"] = hist["cnt"].astype(np.int64)
        return hist

    hist = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["ts", "user_id", "event_type"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(
            lambda g: durations(g.drop(columns=["_b"])), batch_format="pandas"
        )
        .to_pandas()  # bounded: ≤ 2·(H+1) rows per bucket
        .groupby(["t", "ev"])["cnt"]
        .sum()
        .unstack(fill_value=0)
        .reindex(columns=[0, 1], fill_value=0)
        .sort_index()
    )
    total = int(hist.sum().sum())
    ts_ = hist.index.to_numpy()
    d = hist[1].to_numpy().astype(np.int64)
    c = hist[0].to_numpy().astype(np.int64)
    all_leaving = d + c
    at_risk = total - np.concatenate([[0], np.cumsum(all_leaving)[:-1]])
    rows = []
    s = 1.0
    for i in range(len(ts_)):
        if d[i] == 0:
            continue
        n_i = int(at_risk[i])
        s = s * (1.0 - d[i] / n_i)  # sequential fold ≡ SQL list_reduce
        rows.append(
            (
                np.int64(ts_[i]),
                np.int64(n_i),
                np.int64(d[i]),
                np.int64(np.floor(s * 1e6 + 0.5)),
            )
        )
    return pd.DataFrame(
        rows, columns=["t_day", "n_risk", "d_events", "surv_micro"]
    ).astype(
        {
            "t_day": np.int64,
            "n_risk": np.int64,
            "d_events": np.int64,
            "surv_micro": np.int64,
        }
    )


ORACLES46["events_km_survival"] = f"""
WITH v AS (
  SELECT user_id, min(epoch_us(ts)) AS tv FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
p AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS tp
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= v.tv
  GROUP BY e.user_id
),
dur AS (
  SELECT v.user_id,
         CASE WHEN p.tp IS NOT NULL
                   AND (p.tp - v.tv) // 86400000000 <= {_KM_HORIZON_DAYS}
              THEN (p.tp - v.tv) // 86400000000 ELSE {_KM_HORIZON_DAYS} END AS t,
         CASE WHEN p.tp IS NOT NULL
                   AND (p.tp - v.tv) // 86400000000 <= {_KM_HORIZON_DAYS}
              THEN 1 ELSE 0 END AS ev
  FROM v LEFT JOIN p USING (user_id)
),
hist AS (
  SELECT t, CAST(SUM(ev) AS BIGINT) AS d, CAST(count(*) AS BIGINT) AS leaving
  FROM dur GROUP BY t
),
risk AS (
  SELECT t, d,
         CAST((SELECT count(*) FROM dur) AS BIGINT)
           - CAST(coalesce(SUM(leaving) OVER (ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS n_risk
  FROM hist
),
ev AS (SELECT t, n_risk, d FROM risk WHERE d > 0)
SELECT e.t AS t_day, e.n_risk, e.d AS d_events,
       CAST(floor(
         list_reduce(
           list_prepend(1.0,
             (SELECT list(1.0 - e2.d / e2.n_risk ORDER BY e2.t)
              FROM ev e2 WHERE e2.t <= e.t)),
           (acc, x) -> acc * x) * 1000000 + 0.5) AS BIGINT) AS surv_micro
FROM ev e"""


# ---------------------------------------------------------------------------
# docs_typo_pairs — Levenshtein candidate pairs over the vocabulary
# ---------------------------------------------------------------------------


def q_docs_typo_pairs(sf_dir: str):
    """Typo/variant candidate mining (the fuzzy entity-dedup generator):
    all vocabulary word pairs within Levenshtein distance ≤ 2. The vocabulary
    is a bounded distinct fold (the dimension-size contract — corpus tokens
    never pairwise-join; only DISTINCT words do, on the driver, |V|² with
    |V| vocabulary-sized). The DP runs as a vectorized numpy table over ALL
    pairs at once — no per-pair Python loop."""
    import pyarrow.compute as pc

    vocab = sorted(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
        .map_batches(
            lambda t: pa.table(
                {
                    "w": pc.unique(
                        pc.list_flatten(
                            pc.split_pattern(pc.fill_null(t["text"], ""), " ")
                        )
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .to_pandas()["w"]
        .unique()
    )
    n = len(vocab)
    ia, ib = np.triu_indices(n, k=1)
    wa = np.array([vocab[i] for i in ia], dtype=object)
    wb = np.array([vocab[i] for i in ib], dtype=object)
    # vectorized Levenshtein over all pairs: DP rolling rows, chars as codes
    maxlen = max(len(w) for w in vocab) if n else 0
    ca = np.full((len(wa), maxlen), -1, dtype=np.int32)
    cb = np.full((len(wb), maxlen), -2, dtype=np.int32)
    for j in range(maxlen):
        for arr, words in ((ca, wa), (cb, wb)):
            mask = np.array([len(w) > j for w in words])
            arr[mask, j] = np.array(
                [ord(w[j]) for w in words[mask]], dtype=np.int32
            )
    la = np.array([len(w) for w in wa])
    lb = np.array([len(w) for w in wb])
    prev = np.tile(np.arange(maxlen + 1, dtype=np.int32), (len(wa), 1))
    for i in range(1, maxlen + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        ai = ca[:, i - 1][:, None]
        sub = prev[:, :-1] + (ai != cb).astype(np.int32)
        dele = prev[:, 1:] + 1
        for j in range(1, maxlen + 1):
            ins = cur[:, j - 1] + 1
            cur[:, j] = np.minimum(np.minimum(sub[:, j - 1], dele[:, j - 1]), ins)
        # rows where len(a) < i keep the previous final distances
        done = la < i
        cur[done] = prev[done]
        prev = cur
    dist = prev[np.arange(len(wa)), lb]
    keep = (dist <= _LEV_MAX_DIST) & (dist > 0)
    return (
        pd.DataFrame(
            {
                "word_a": wa[keep],
                "word_b": wb[keep],
                "dist": dist[keep].astype(np.int64),
            }
        )
        .sort_values(["word_a", "word_b"])
        .reset_index(drop=True)
    )


ORACLES46["docs_typo_pairs"] = f"""
WITH vocab AS (
  SELECT DISTINCT UNNEST(string_split(coalesce(text, ''), ' ')) AS w
  FROM documents
)
SELECT a.w AS word_a, b.w AS word_b,
       CAST(levenshtein(a.w, b.w) AS BIGINT) AS dist
FROM vocab a JOIN vocab b ON a.w < b.w
WHERE levenshtein(a.w, b.w) <= {_LEV_MAX_DIST}
  AND levenshtein(a.w, b.w) > 0"""


QUERIES46 = {
    "events_km_survival": q_events_km_survival,
    "docs_typo_pairs": q_docs_typo_pairs,
}
