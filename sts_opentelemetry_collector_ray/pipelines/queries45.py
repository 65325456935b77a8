"""Driver-contract queries, wave 45 — growth accounting (the
new/retained/resurrected/churned user ledger per week) and MMR diverse top-k
selection (maximal marginal relevance, the retrieval diversification pass).
Same contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES45: dict[str, str] = {}

_GA_USER_BUCKETS = 32
_GA_WEEK_US = 7 * 86_400_000_000
_MMR_K = 5


# ---------------------------------------------------------------------------
# events_growth_accounting — weekly new/retained/resurrected/churned
# ---------------------------------------------------------------------------


def q_events_growth_accounting(sf_dir: str):
    """Growth accounting (the standard product-analytics ledger): per epoch
    week, users split into NEW (first week ever), RETAINED (active previous
    week too), RESURRECTED (active before, but not the previous week); plus
    CHURNED — users active the previous week who went silent this week. The
    ledger identity new+retained+resurrected = WAU holds by construction.

    Per-batch distinct (user, week) partials → ONE user-bucket exchange →
    per-user vectorized week-lag classification; the driver folds the bounded
    (week, class) count grid and fills the min..max week range."""
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        tu = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        week = (tu // _GA_WEEK_US).astype(np.int64)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"user_id": uid, "week": week}).drop_duplicates()
        df["_b"] = (df["user_id"].to_numpy() % _GA_USER_BUCKETS).astype(np.int32)
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(
            None
        )

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["user_id", "week"]).sort_values(
            ["user_id", "week"], kind="mergesort"
        )
        uid = d["user_id"].to_numpy()
        wk = d["week"].to_numpy()
        first = np.concatenate([[True], uid[1:] != uid[:-1]])
        prev_wk = np.empty_like(wk)
        prev_wk[1:] = wk[:-1]
        cls = np.where(
            first, 0, np.where(wk - prev_wk == 1, 1, 2)
        )  # 0 new, 1 retained, 2 resurrected
        rows = [
            pd.DataFrame({"week": wk, "cls": cls, "cnt": np.ones(len(wk), np.int64)})
        ]
        # churn events: active at wk, not active at wk+1 → churned at wk+1
        nxt = np.empty_like(wk)
        nxt[:-1] = wk[1:]
        nxt[-1] = -1
        last = np.concatenate([uid[1:] != uid[:-1], [True]])
        churn = last | (nxt != wk + 1)
        rows.append(
            pd.DataFrame(
                {
                    "week": wk[churn] + 1,
                    "cls": np.full(int(churn.sum()), 3, np.int64),
                    "cnt": np.ones(int(churn.sum()), np.int64),
                }
            )
        )
        out = pd.concat(rows, ignore_index=True)
        return (
            out.groupby(["week", "cls"], sort=False)["cnt"].sum().reset_index()
        )

    grid = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(
            lambda g: classify(g.drop(columns=["_b"])), batch_format="pandas"
        )
        .to_pandas()  # bounded: (weeks × 4) per bucket
        .groupby(["week", "cls"])["cnt"]
        .sum()
        .unstack(fill_value=0)
        .reindex(columns=[0, 1, 2, 3], fill_value=0)
    )
    active_weeks = grid.index[(grid[[0, 1, 2]].sum(axis=1)) > 0]
    wmin, wmax = int(active_weeks.min()), int(active_weeks.max())
    weeks = np.arange(wmin, wmax + 1, dtype=np.int64)
    grid = grid.reindex(weeks, fill_value=0)
    return pd.DataFrame(
        {
            "week": weeks,
            "new_users": grid[0].to_numpy().astype(np.int64),
            "retained": grid[1].to_numpy().astype(np.int64),
            "resurrected": grid[2].to_numpy().astype(np.int64),
            "churned": grid[3].to_numpy().astype(np.int64),
        }
    )


ORACLES45["events_growth_accounting"] = f"""
WITH uw AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_GA_WEEK_US} AS week FROM events
),
lagged AS (
  SELECT user_id, week,
         lag(week) OVER (PARTITION BY user_id ORDER BY week) AS pw,
         lead(week) OVER (PARTITION BY user_id ORDER BY week) AS nw
  FROM uw
),
bounds AS (SELECT min(week) AS wmin, max(week) AS wmax FROM uw),
grid AS (
  SELECT wmin + i AS week FROM bounds,
         UNNEST(range(0, wmax - wmin + 1)) t(i)
),
act AS (
  SELECT week,
         CAST(count(*) FILTER (pw IS NULL) AS BIGINT) AS new_users,
         CAST(count(*) FILTER (pw = week - 1) AS BIGINT) AS retained,
         CAST(count(*) FILTER (pw IS NOT NULL AND pw < week - 1) AS BIGINT)
           AS resurrected
  FROM lagged GROUP BY week
),
ch AS (
  SELECT week + 1 AS week, CAST(count(*) AS BIGINT) AS churned
  FROM lagged WHERE nw IS NULL OR nw <> week + 1
  GROUP BY week + 1
)
SELECT CAST(g.week AS BIGINT) AS week,
       coalesce(a.new_users, 0) AS new_users,
       coalesce(a.retained, 0) AS retained,
       coalesce(a.resurrected, 0) AS resurrected,
       coalesce(c.churned, 0) AS churned
FROM grid g
LEFT JOIN act a ON a.week = g.week
LEFT JOIN ch c ON c.week = g.week"""


# ---------------------------------------------------------------------------
# emb_mmr_topk — maximal marginal relevance diverse selection
# ---------------------------------------------------------------------------


def q_emb_mmr_topk(sf_dir: str):
    """MMR diverse top-k (Carbonell & Goldstein 1998, λ = 0.5 scaled away):
    greedily pick the vector maximizing relevance − max-similarity-to-chosen,
    relevance = dot with the query (the smallest-vec_id vector). EXACT int64
    micro-quantized dot products (the k-center trick) so the unrolled-CTE
    oracle replays selection bit-for-bit; ties → smallest vec_id; chosen ids
    are excluded.

    k streaming passes, ≤k×dim broadcast, one candidate row per block —
    the q_emb_kcenter_coreset harness with the MMR objective."""
    from ..functions.vectors import stack_list_column

    path = f"{sf_dir}/embeddings.parquet"

    def quantize(t: pa.Table) -> np.ndarray:
        mat = stack_list_column(t["embedding"])
        return np.floor(mat * 1e6 + 0.5).astype(np.int64)

    def start_partial(t: pa.Table) -> pa.Table:
        vid = t["vec_id"].to_numpy(zero_copy_only=False)
        i = int(np.argmin(vid))
        q = quantize(t)
        return pa.table(
            {
                "vec_id": pa.array([vid[i]]),
                "qv": pa.array([q[i].tolist()], pa.list_(pa.int64())),
            }
        )

    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    starts = ds.map_batches(start_partial, batch_format="pyarrow").to_pandas()
    srow = starts.sort_values("vec_id").iloc[0]
    qvec = np.array(srow["qv"], dtype=np.int64)
    query_id = int(srow["vec_id"])

    chosen_ids: list[int] = []
    chosen_vecs: list[np.ndarray] = []
    out_rows = []
    for step in range(_MMR_K):
        cmat = np.stack(chosen_vecs) if chosen_vecs else None
        excl = np.array(chosen_ids + [query_id], dtype=np.int64)

        def cand(t: pa.Table, _cmat=cmat, _excl=excl) -> pa.Table:
            q = quantize(t)
            vid = t["vec_id"].to_numpy(zero_copy_only=False)
            rel = q @ qvec
            if _cmat is not None:
                maxsim = (q @ _cmat.T).max(axis=1)
            else:
                maxsim = np.zeros(len(q), dtype=np.int64)
            score = rel - maxsim
            ok = ~np.isin(vid, _excl)
            if not ok.any():
                return pa.table(
                    {
                        "vec_id": pa.array([], pa.int64()),
                        "score": pa.array([], pa.int64()),
                        "qv": pa.array([], pa.list_(pa.int64())),
                    }
                )
            s = np.where(ok, score, np.iinfo(np.int64).min)
            best = s.max()
            candi = np.flatnonzero(s == best)
            i = candi[np.argmin(vid[candi])]
            return pa.table(
                {
                    "vec_id": pa.array([vid[i]]),
                    "score": pa.array([np.int64(best)]),
                    "qv": pa.array([q[i].tolist()], pa.list_(pa.int64())),
                }
            )

        parts = ds.map_batches(cand, batch_format="pyarrow").to_pandas()
        if len(parts) == 0 or "score" not in parts.columns:
            break  # pool exhausted (k > selectable points) — oracle c_j is empty too
        parts = parts.sort_values(
            ["score", "vec_id"], ascending=[False, True]
        )
        top = parts.iloc[0]
        chosen_ids.append(int(top["vec_id"]))
        chosen_vecs.append(np.array(top["qv"], dtype=np.int64))
        out_rows.append((step, int(top["vec_id"]), int(top["score"])))

    return pd.DataFrame(
        {
            "step": np.array([r[0] for r in out_rows], np.int64),
            "vec_id": np.array([r[1] for r in out_rows], np.int64),
            "score": np.array([r[2] for r in out_rows], np.int64),
        }
    )


def _mmr_oracle(k: int = _MMR_K) -> str:
    ctes = [
        "q AS (SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),"
        " x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS qv FROM embeddings)",
        "qid AS (SELECT min(vec_id) AS vid FROM q)",
        "qv0 AS (SELECT q.qv FROM q JOIN qid ON q.vec_id = qid.vid)",
        "rel AS (SELECT a.vec_id,"
        " CAST(SUM(a.qv[i] * b.qv[i]) AS HUGEINT) AS r"
        " FROM q a, qv0 b, UNNEST(range(1, len(a.qv)::BIGINT + 1)) t(i)"
        " GROUP BY a.vec_id)",
    ]
    sel = []
    chosen_tbl = "(SELECT vid FROM qid)"
    for j in range(k):
        if j == 0:
            ctes.append(
                "c0 AS (SELECT rel.vec_id AS vid, rel.r AS score FROM rel"
                " JOIN qid ON rel.vec_id <> qid.vid"
                " ORDER BY rel.r DESC, rel.vec_id ASC LIMIT 1)"
            )
        else:
            prev = " UNION ALL ".join(f"SELECT vid FROM c{i}" for i in range(j))
            ctes.append(
                f"ms{j} AS (SELECT a.vec_id,"
                " CAST(MAX(d.s) AS HUGEINT) AS m FROM q a JOIN ("
                " SELECT a2.vec_id AS pid, c.vid AS cid,"
                " CAST(SUM(a2.qv[i] * b2.qv[i]) AS HUGEINT) AS s"
                f" FROM q a2 JOIN ({prev}) c ON TRUE JOIN q b2 ON b2.vec_id = c.vid,"
                " UNNEST(range(1, len(a2.qv)::BIGINT + 1)) t(i)"
                " GROUP BY a2.vec_id, c.vid) d ON d.pid = a.vec_id"
                " GROUP BY a.vec_id)"
            )
            ctes.append(
                f"c{j} AS (SELECT rel.vec_id AS vid, rel.r - ms{j}.m AS score"
                f" FROM rel JOIN ms{j} ON rel.vec_id = ms{j}.vec_id"
                f" WHERE rel.vec_id NOT IN (SELECT vid FROM qid"
                + "".join(f" UNION ALL SELECT vid FROM c{i}" for i in range(j))
                + ") ORDER BY score DESC, rel.vec_id ASC LIMIT 1)"
            )
        sel.append(
            f"SELECT {j} AS step, vid AS vec_id, CAST(score AS BIGINT) AS score"
            f" FROM c{j}"
        )
    union = " UNION ALL ".join(sel)
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT CAST(step AS BIGINT) AS step, vec_id, score FROM ({union})"
    )


ORACLES45["emb_mmr_topk"] = _mmr_oracle()


QUERIES45 = {
    "events_growth_accounting": q_events_growth_accounting,
    "emb_mmr_topk": q_emb_mmr_topk,
}
