"""Driver-contract queries, wave 349 — the Bloom-filter capacity
planner (optimal bits/hashes for the dedup membership filter at target
false-positive rates) and the allowed-lateness admission curve (what
share of events a streaming window admits at each lateness budget).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES349: dict[str, str] = {}

_RB_GROUP = 65_536
_LATENESS_US = (0, 1_000_000, 10_000_000, 60_000_000)


# ---------------------------------------------------------------------------
# docs_bloom_planner — dedup-filter sizing at target FPRs
# ---------------------------------------------------------------------------


def q_docs_bloom_planner(sf_dir: str):
    """Bloom planning for an exact-dedup membership filter over the
    DISTINCT document texts: for target FPR p in {1%, 0.1%},
    m = ceil(-n ln p / ln^2 2) bits and k = round(m/n ln 2) hashes.
    n folds exactly; the sizing algebra is mirrored float. Per target:
    fpr_label, n_distinct, m_bits, k_hashes, bits_per_doc_milli."""
    from ..functions.hashing import fnv1a64_array

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {"text": np.asarray(t["text"].to_numpy(zero_copy_only=False))}
        ).drop_duplicates()
        df["_b"] = (
            fnv1a64_array(df["text"].to_numpy(object)) % np.uint64(64)
        ).astype(np.int64)
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"n": [np.int64(int(g["text"].nunique()))]}
        )

    n = int(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()["n"]
        .sum()
    )
    cols = ["fpr_label", "n_distinct", "m_bits", "k_hashes",
            "bits_per_doc_milli"]
    empty = pd.DataFrame(
        {
            "fpr_label": pd.Series([], dtype=object),
            **{c: pd.Series([], dtype=np.int64) for c in cols[1:]},
        }
    )
    if n == 0:
        return empty
    ln2 = float(np.log(2.0))
    rows = []
    for label, p in (("p01", 0.01), ("p001", 0.001)):
        m = int(np.ceil(-float(n) * float(np.log(p)) / (ln2 * ln2)))
        k = int(np.floor(float(m) / float(n) * ln2 + 0.5))
        rows.append(
            (
                label, np.int64(n), np.int64(m), np.int64(k),
                np.int64(np.floor(
                    float(m) / float(n) * 1_000.0 + 0.5
                )),
            )
        )
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols[1:]}
    )


ORACLES349["docs_bloom_planner"] = """
WITH nn AS (
  SELECT CAST(count(DISTINCT text) AS BIGINT) AS n FROM documents
),
t AS (
  SELECT 'p01' AS fpr_label, 0.01 AS p
  UNION ALL SELECT 'p001', 0.001
),
calc AS (
  SELECT t.fpr_label, nn.n,
         CAST(ceil(-CAST(nn.n AS DOUBLE) * ln(t.p)
                   / (ln(2.0) * ln(2.0))) AS BIGINT) AS m
  FROM t, nn WHERE nn.n > 0
)
SELECT fpr_label, n AS n_distinct, m AS m_bits,
       CAST(floor(CAST(m AS DOUBLE) / n * ln(2.0) + 0.5) AS BIGINT)
         AS k_hashes,
       CAST(floor(CAST(m AS DOUBLE) / n * 1000.0 + 0.5) AS BIGINT)
         AS bits_per_doc_milli
FROM calc
ORDER BY fpr_label"""


# ---------------------------------------------------------------------------
# events_lateness_admission_curve — admitted share per lateness budget
# ---------------------------------------------------------------------------


def q_events_lateness_admission_curve(sf_dir: str):
    """Allowed-lateness tuning: in arrival order (event_id), an event is
    ADMITTED under budget L when (running max ts before it) - own ts
    <= L. Per budget {0, 1s, 10s, 60s}: lateness_us, n_admitted,
    share_micro. Pure integer folds.

    Scale shape: the `events_reorder_buffer` two-pass carry over fixed
    event_id ranges; each group emits one count per budget."""
    import ray as _ray

    def partial(t: pa.Table) -> pd.DataFrame:
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pd.DataFrame(
            {
                "g": eid // _RB_GROUP,
                "eid": eid,
                "us": pa.compute.cast(t["ts"], pa.int64()).to_numpy(),
            }
        )

    ds = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_id", "ts"]
        )
        .map_batches(partial, batch_format="pyarrow")
    )

    def gmax(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("g")["us"].max().rename("mx").reset_index()
        return out.astype(np.int64)

    maxes = (
        ds.groupby("g")
        .map_groups(gmax, batch_format="pandas")
        .to_pandas()
        .groupby("g")["mx"]
        .max()
        .sort_index()
    )
    cols = ["lateness_us", "n_admitted", "share_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if maxes.empty:
        return empty
    carry: dict[int, int] = {}
    run = -1
    for gk, mx in maxes.items():
        carry[int(gk)] = run
        run = max(run, int(mx))
    carry_ref = _ray.put(carry)

    def admit(g: pd.DataFrame) -> pd.DataFrame:
        c = _ray.get(carry_ref)
        rows = []
        for gk, sub in g.groupby("g", sort=False):
            sub = sub.sort_values("eid", kind="stable")
            us = sub["us"].to_numpy(np.int64)
            prev = np.maximum.accumulate(us)
            runmax_before = np.concatenate(
                [[c.get(int(gk), -1)], prev[:-1]]
            )
            runmax_before = np.maximum(runmax_before, c.get(int(gk), -1))
            late = np.where(
                runmax_before >= 0, runmax_before - us, 0
            )
            late = np.maximum(late, 0)
            row = {"n": np.int64(len(us))}
            for i, lw in enumerate(_LATENESS_US):
                row[f"a{i}"] = np.int64(int((late <= lw).sum()))
            rows.append(row)
        return pd.DataFrame(rows)

    p = (
        ds.groupby("g")
        .map_groups(admit, batch_format="pandas")
        .to_pandas()
        .sum()
    )
    n = int(p["n"])
    if n == 0:
        return empty
    rows = []
    for i, lw in enumerate(_LATENESS_US):
        a = int(p[f"a{i}"])
        rows.append(
            (
                np.int64(lw), np.int64(a),
                np.int64(np.floor(float(a) / float(n) * 1_000_000.0 + 0.5)),
            )
        )
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols}
    )


ORACLES349["events_lateness_admission_curve"] = f"""
WITH s AS (
  SELECT epoch_us(ts) AS us,
         max(epoch_us(ts)) OVER (
           ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS runmax
  FROM events
),
late AS (
  SELECT CASE WHEN runmax IS NOT NULL AND runmax > us
              THEN runmax - us ELSE 0 END AS lt
  FROM s
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM late),
ls AS (SELECT CAST(u.l AS BIGINT) AS l
       FROM (SELECT unnest([{", ".join(str(x) for x in _LATENESS_US)}])
               AS l) u),
agg AS (
  SELECT ls.l,
         CAST(sum(CASE WHEN late.lt <= ls.l THEN 1 ELSE 0 END) AS BIGINT)
           AS a
  FROM ls CROSS JOIN late
  GROUP BY 1
)
SELECT agg.l AS lateness_us, agg.a AS n_admitted,
       CAST(floor(CAST(agg.a AS DOUBLE) / nn.n * 1000000.0 + 0.5)
            AS BIGINT) AS share_micro
FROM agg, nn
WHERE nn.n > 0
ORDER BY agg.l"""


QUERIES349 = {
    "docs_bloom_planner": q_docs_bloom_planner,
    "events_lateness_admission_curve": q_events_lateness_admission_curve,
}
