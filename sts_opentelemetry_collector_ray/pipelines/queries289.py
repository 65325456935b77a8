"""Driver-contract queries, wave 289 — strongly-connected components of
the directed event-type transition graph (exact mutual-reachability
labels) and the Barlow-Proschan cumulative-TTT aging test on global
interarrival gaps (exact integer total-time-on-test algebra). Same
contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES289: dict[str, str] = {}


# ---------------------------------------------------------------------------
# events_type_scc — SCCs of the per-user transition digraph
# ---------------------------------------------------------------------------


def q_events_type_scc(sf_dir: str):
    """Strongly-connected components of the directed type-transition
    graph (edge f->t iff some user emits t directly after f, the
    `events_bowker_symmetry` transition machinery): in_cycle(v) = v
    reaches itself through >= 1 edge, and scc label = min over mutually
    reachable types (lexicographic). Pure reachability on the bounded
    type set — no floats at all. Per type: event_type, out_deg,
    in_cycle, scc_label.

    Scale shape: ONE user-bucket exchange emits distinct (f, t) pairs;
    the |types|^2 closure runs on the driver."""

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "u": t["user_id"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
                "ts": pa.compute.cast(t["ts"], pa.int64()).to_numpy(),
                "eid": t["event_id"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
                "et": t["event_type"].to_numpy(zero_copy_only=False),
            }
        )
        df["_b"] = (df["u"] % 64).astype(np.int64)
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        empty_m = pd.DataFrame(
            {"f": pd.Series([], dtype=object), "t": pd.Series([], dtype=object)}
        )
        if len(g) == 0:
            return empty_m
        g = g.sort_values(["u", "ts", "eid"], kind="stable")
        u = g["u"].to_numpy()
        et = g["et"].to_numpy(object)
        same = u[1:] == u[:-1]
        f, t = et[:-1][same], et[1:][same]
        if len(f) == 0:
            return empty_m
        return pd.DataFrame({"f": f, "t": t}).drop_duplicates()

    edges = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "ts", "event_id", "event_type"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    cols = ["event_type", "out_deg", "in_cycle", "scc_label"]
    empty = pd.DataFrame(
        {
            "event_type": pd.Series([], dtype=object),
            "out_deg": pd.Series([], dtype=np.int64),
            "in_cycle": pd.Series([], dtype=np.int64),
            "scc_label": pd.Series([], dtype=object),
        }
    )
    if edges.empty:
        return empty
    verts = sorted(set(edges["f"]) | set(edges["t"]))
    adj: dict[str, set[str]] = {v: set() for v in verts}
    for f, t in zip(edges["f"], edges["t"]):
        adj[f].add(t)

    def reach_from(v: str) -> set[str]:
        seen: set[str] = set()
        stack = list(adj[v])
        while stack:
            u = stack.pop()
            if u in seen:
                continue
            seen.add(u)
            stack.extend(adj[u])
        return seen

    reach = {v: reach_from(v) for v in verts}
    rows = []
    for v in verts:
        in_cycle = 1 if v in reach[v] else 0
        mutual = [u for u in verts if u != v and u in reach[v]
                  and v in reach[u]]
        label = min([v] + mutual)
        rows.append((v, np.int64(len(adj[v])), np.int64(in_cycle), label))
    return pd.DataFrame(rows, columns=cols).astype(
        {"out_deg": np.int64, "in_cycle": np.int64}
    )


ORACLES289["events_type_scc"] = """
WITH RECURSIVE seq AS (
  SELECT event_type AS f,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS t
  FROM events
),
e AS (SELECT DISTINCT f, t FROM seq WHERE t IS NOT NULL),
verts AS (SELECT DISTINCT v FROM (SELECT f AS v FROM e
                                  UNION ALL SELECT t FROM e)),
reach(src, dst) AS (
  SELECT f, t FROM e
  UNION
  SELECT r.src, e.t FROM reach r JOIN e ON e.f = r.dst
),
deg AS (SELECT f AS v, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY 1),
mutual AS (
  SELECT r1.src AS v, r1.dst AS u
  FROM reach r1 JOIN reach r2 ON r2.src = r1.dst AND r2.dst = r1.src
),
lab AS (
  SELECT v.v, least(v.v, coalesce(min(mutual.u), v.v)) AS scc_label
  FROM verts v LEFT JOIN mutual ON mutual.v = v.v
  GROUP BY 1
)
SELECT v.v AS event_type,
       CAST(coalesce(deg.d, 0) AS BIGINT) AS out_deg,
       CAST(CASE WHEN EXISTS (SELECT 1 FROM reach r
                              WHERE r.src = v.v AND r.dst = v.v)
                 THEN 1 ELSE 0 END AS BIGINT) AS in_cycle,
       lab.scc_label
FROM verts v
LEFT JOIN deg ON deg.v = v.v
JOIN lab ON lab.v = v.v
ORDER BY event_type"""


# ---------------------------------------------------------------------------
# events_barlow_proschan — cumulative-TTT aging test on gaps
# ---------------------------------------------------------------------------


def q_events_barlow_proschan(sf_dir: str):
    """Barlow-Proschan test for aging in the global interarrival
    process: with m sorted gap values (ms) the cumulative
    total-time-on-test sum is sum_{k<m} TTT_k = sum over distinct-value
    boundaries (m-j+1)(m-j)(v_g - v_{g-1}) with j the 1-based start
    rank of group g — EXACT integers off the gap histogram. The
    statistic W = that / span_ms has E = (m-1)/2,
    Var = (m-1)/12 under exponentiality; z is the single float step.
    One row: m_gaps, w_milli, z_micro — increasing hazard pushes W
    above its null mean.

    Scale shape: the `events_mean_residual_life` sorted-block gap
    histogram (ms quantization bounds the domain)."""

    def block_fold(t: pa.Table) -> pd.DataFrame:
        ts = pa.compute.cast(t["ts"], pa.int64()).to_numpy()
        if len(ts) == 0:
            return pd.DataFrame(
                {c: pd.Series([], dtype=np.int64)
                 for c in ("g", "c", "first", "last")}
            )
        d = (np.diff(ts) // 1000) if len(ts) > 1 else np.array([], np.int64)
        h = pd.Series(d).groupby(d).size() if len(d) else pd.Series(dtype=int)
        hist = pd.DataFrame(
            {
                "g": h.index.to_numpy(np.int64),
                "c": h.to_numpy(np.int64),
                "first": np.int64(-1),
                "last": np.int64(-1),
            }
        )
        head = pd.DataFrame(
            {
                "g": [np.int64(-1)],
                "c": [np.int64(0)],
                "first": [np.int64(ts[0])],
                "last": [np.int64(ts[-1])],
            }
        )
        return pd.concat([head, hist], ignore_index=True)

    parts = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        .sort("ts")
        .map_batches(block_fold, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["m_gaps", "w_milli", "z_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if parts.empty:
        return empty
    heads = parts[parts["g"] == -1].sort_values("first")
    hist = parts[parts["g"] >= 0].groupby("g")["c"].sum().to_dict()
    firsts = heads["first"].to_numpy(np.int64)
    lasts = heads["last"].to_numpy(np.int64)
    for b in (firsts[1:] - lasts[:-1]) // 1000:
        hist[int(b)] = hist.get(int(b), 0) + 1
    if not hist:
        return empty
    v = np.array(sorted(hist), np.int64).astype(object)
    c = np.array([hist[int(x)] for x in sorted(hist)], np.int64).astype(object)
    m = int(c.sum())
    if m < 2:
        return empty
    span = int((v * c).sum())
    if span <= 0:
        return empty
    cum_below = np.concatenate([[0], np.cumsum(c)[:-1]])
    j = cum_below + 1  # 1-based start rank of each distinct-value group
    prev_v = np.concatenate([[0], v[:-1]])
    ssum = int(((m - j + 1) * (m - j) * (v - prev_v)).sum())
    w = float(ssum) / float(span)
    z = (w - float(m - 1) / 2.0) / float(np.sqrt(float(m - 1) / 12.0))
    return pd.DataFrame(
        [
            (
                np.int64(m),
                np.int64(np.floor(w * 1_000.0 + 0.5)),
                np.int64(np.floor(z * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c_: np.int64 for c_ in cols})


ORACLES289["events_barlow_proschan"] = """
WITH s AS (
  SELECT epoch_us(ts) AS us, lag(epoch_us(ts)) OVER (ORDER BY ts) AS prev
  FROM events
),
gaps AS (
  SELECT CAST((us - prev) // 1000 AS BIGINT) AS d
  FROM s WHERE prev IS NOT NULL
),
h AS (SELECT d, CAST(count(*) AS BIGINT) AS c FROM gaps GROUP BY 1),
nn AS (SELECT CAST(sum(c) AS BIGINT) AS m, CAST(sum(d * c) AS BIGINT)
         AS span FROM h),
grp AS (
  SELECT d, c,
         CAST(coalesce(sum(c) OVER (ORDER BY d
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) + 1 AS j,
         CAST(coalesce(lag(d) OVER (ORDER BY d), 0) AS BIGINT) AS pv
  FROM h
),
ss AS (
  SELECT CAST(sum(CAST(nn.m - grp.j + 1 AS HUGEINT)
                  * (nn.m - grp.j) * (grp.d - grp.pv)) AS HUGEINT) AS ssum
  FROM grp, nn
)
SELECT nn.m AS m_gaps,
       CAST(floor(CAST(ss.ssum AS DOUBLE) / CAST(nn.span AS DOUBLE)
                  * 1000.0 + 0.5) AS BIGINT) AS w_milli,
       CAST(floor((CAST(ss.ssum AS DOUBLE) / CAST(nn.span AS DOUBLE)
                   - CAST(nn.m - 1 AS DOUBLE) / 2.0)
                  / sqrt(CAST(nn.m - 1 AS DOUBLE) / 12.0)
                  * 1000000.0 + 0.5) AS BIGINT) AS z_micro
FROM nn, ss
WHERE nn.m >= 2 AND nn.span > 0"""


QUERIES289 = {
    "events_type_scc": q_events_type_scc,
    "events_barlow_proschan": q_events_barlow_proschan,
}
