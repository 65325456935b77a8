"""Driver-contract queries, wave 330 — the cron detector (minute-of-hour
concentration of events — scheduled jobs leave a spike) and the
size-to-price monotonicity audit (exact rational inversion counting of
mean unit price over part sizes). Same contract as queries.py: column
names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES330: dict[str, str] = {}


# ---------------------------------------------------------------------------
# events_cron_detector — minute-of-hour concentration
# ---------------------------------------------------------------------------


def q_events_cron_detector(sf_dir: str):
    """Cron detection: the minute-of-hour histogram of all events
    should be uniform for organic traffic; scheduled jobs concentrate
    on one minute. Report the top minute (count desc, minute asc), its
    share, and the chi-square against uniform 1/60. Pure integer
    counting. One row: n, top_minute, top_share_micro, chi2_micro."""

    def partial(t: pa.Table) -> pd.DataFrame:
        mi = (
            pa.compute.cast(t["ts"], pa.int64()).to_numpy() // 60_000_000
        ) % 60
        h = pd.Series(mi).groupby(mi).size()
        return pd.DataFrame(
            {"mi": h.index.to_numpy(np.int64), "c": h.to_numpy(np.int64)}
        )

    h = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("mi")["c"]
        .sum()
    )
    cols = ["n", "top_minute", "top_share_micro", "chi2_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if h.empty:
        return empty
    n = int(h.sum())
    if n == 0:
        return empty
    counts = np.array([int(h.get(m, 0)) for m in range(60)], np.int64)
    top_c = int(counts.max())
    top_m = int(np.argmax(counts))  # earliest max
    e = float(n) / 60.0
    chi2 = float((((counts.astype(np.float64) - e) ** 2) / e).sum())
    return pd.DataFrame(
        [
            (
                np.int64(n), np.int64(top_m),
                np.int64(np.floor(
                    float(top_c) / float(n) * 1_000_000.0 + 0.5
                )),
                np.int64(np.floor(chi2 * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES330["events_cron_detector"] = """
WITH b AS (
  SELECT CAST((epoch_us(ts) // 60000000) % 60 AS BIGINT) AS mi FROM events
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b),
mins AS (SELECT CAST(r.range AS BIGINT) AS mi FROM range(0, 60) r),
h AS (
  SELECT mins.mi,
         CAST(coalesce(sum(CASE WHEN b.mi = mins.mi THEN 1 END), 0)
              AS BIGINT) AS c
  FROM mins LEFT JOIN b ON b.mi = mins.mi
  GROUP BY 1
),
top AS (SELECT mi, c FROM h ORDER BY c DESC, mi LIMIT 1),
chi AS (
  SELECT sum((CAST(c AS DOUBLE) - CAST(nn.n AS DOUBLE) / 60.0)
             * (CAST(c AS DOUBLE) - CAST(nn.n AS DOUBLE) / 60.0)
             / (CAST(nn.n AS DOUBLE) / 60.0)) AS chi2
  FROM h, nn WHERE nn.n > 0
)
SELECT nn.n, top.mi AS top_minute,
       CAST(floor(CAST(top.c AS DOUBLE) / nn.n * 1000000.0 + 0.5)
            AS BIGINT) AS top_share_micro,
       CAST(floor(chi.chi2 * 1000000.0 + 0.5) AS BIGINT) AS chi2_micro
FROM nn, top, chi
WHERE nn.n > 0"""


# ---------------------------------------------------------------------------
# part_size_price_monotonicity — inversion audit of size vs unit price
# ---------------------------------------------------------------------------


def q_part_size_price_monotonicity(sf_dir: str):
    """Monotonicity audit: mean unit price (cents) per part size should
    rise with size; count adjacent violations and total pairwise
    inversions among size levels. Mean comparisons are EXACT rational
    cross-multiplications (s_a n_b vs s_b n_a) — no float ordering
    anywhere. One row: n_sizes, n_adjacent_violations, n_inversions,
    concordant_share_micro.

    Scale shape: a (size -> n, cents sum) combiner via the broadcast
    part->size map; the bounded level scan runs on the driver."""
    import ray as _ray
    import pyarrow.parquet as pq_mod

    part_t = pq_mod.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_size"]
    )
    p2s = dict(zip(part_t["p_partkey"].to_pylist(), part_t["p_size"].to_pylist()))
    dims_ref = _ray.put(p2s)

    def partial(t: pa.Table) -> pd.DataFrame:
        p2s_ = _ray.get(dims_ref)
        size = pd.Series(
            t["l_partkey"].to_numpy(zero_copy_only=False)
        ).map(p2s_).to_numpy(np.int64)
        unit = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)
            / t["l_quantity"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame({"sz": size, "n": 1, "s": unit})
            .groupby("sz", as_index=False)
            .sum()
        )
        return g.astype(np.int64)

    m = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_quantity", "l_extendedprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("sz")[["n", "s"]]
        .sum()
        .sort_index()
    )
    cols = [
        "n_sizes", "n_adjacent_violations", "n_inversions",
        "concordant_share_micro",
    ]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if len(m) < 2:
        return empty
    nv = m["n"].to_numpy(np.int64).astype(object)
    sv = m["s"].to_numpy(np.int64).astype(object)
    k = len(m)
    adj = 0
    for i in range(k - 1):
        # mean_i > mean_{i+1}  <=>  s_i * n_{i+1} > s_{i+1} * n_i
        if int(sv[i]) * int(nv[i + 1]) > int(sv[i + 1]) * int(nv[i]):
            adj += 1
    inv = 0
    conc = 0
    pairs = 0
    for i in range(k):
        for j in range(i + 1, k):
            pairs += 1
            lhs = int(sv[i]) * int(nv[j])
            rhs = int(sv[j]) * int(nv[i])
            if lhs > rhs:
                inv += 1
            elif lhs < rhs:
                conc += 1
    return pd.DataFrame(
        [
            (
                np.int64(k), np.int64(adj), np.int64(inv),
                np.int64(np.floor(
                    float(conc) / float(pairs) * 1_000_000.0 + 0.5
                )),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES330["part_size_price_monotonicity"] = """
WITH base AS (
  SELECT p.p_size AS sz,
         CAST(floor(l.l_extendedprice / l.l_quantity * 100.0 + 0.5)
              AS BIGINT) AS unit
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
m AS (
  SELECT CAST(sz AS BIGINT) AS sz, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(unit) AS BIGINT) AS s
  FROM base GROUP BY 1
),
adj AS (
  SELECT CAST(sum(CASE WHEN CAST(a.s AS HUGEINT) * b.n
                            > CAST(b.s AS HUGEINT) * a.n
                       THEN 1 ELSE 0 END) AS BIGINT) AS v
  FROM m a JOIN m b
    ON b.sz = (SELECT min(sz) FROM m WHERE sz > a.sz)
),
pairs AS (
  SELECT CAST(count(*) AS BIGINT) AS p,
         CAST(sum(CASE WHEN CAST(a.s AS HUGEINT) * b.n
                            > CAST(b.s AS HUGEINT) * a.n
                       THEN 1 ELSE 0 END) AS BIGINT) AS inv,
         CAST(sum(CASE WHEN CAST(a.s AS HUGEINT) * b.n
                            < CAST(b.s AS HUGEINT) * a.n
                       THEN 1 ELSE 0 END) AS BIGINT) AS conc
  FROM m a JOIN m b ON a.sz < b.sz
),
k AS (SELECT CAST(count(*) AS BIGINT) AS k FROM m)
SELECT k.k AS n_sizes, adj.v AS n_adjacent_violations,
       pairs.inv AS n_inversions,
       CAST(floor(CAST(pairs.conc AS DOUBLE) / pairs.p * 1000000.0 + 0.5)
            AS BIGINT) AS concordant_share_micro
FROM k, adj, pairs
WHERE k.k >= 2"""


QUERIES330 = {
    "events_cron_detector": q_events_cron_detector,
    "part_size_price_monotonicity": q_part_size_price_monotonicity,
}
