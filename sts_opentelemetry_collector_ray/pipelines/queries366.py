"""Driver-contract queries, wave 366 — measured Bloom-filter false-
positive rate on provably-absent probes (4096 bits, 3 FNV hashes) and
the accuracy of equi-width histogram quantile estimation against exact
order statistics. Same contract as queries.py: column names AND dtypes
match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES366: dict[str, str] = {}

_BF_M = 4096
_BF_K = 3
_BF_PROBES = 1000
_HG_BINS = 128


def _fnv32(key: str) -> int:
    acc = 2166136261
    for ch in key:
        acc = ((acc ^ ord(ch)) * 16777619) % 4294967296
    return acc


# ---------------------------------------------------------------------------
# events_bloom_fpr_measured — measured vs theoretical FPR
# ---------------------------------------------------------------------------


def q_events_bloom_fpr_measured(sf_dir: str):
    """Bloom audit: distinct user ids set k=3 FNV bits ('id#d' decimal
    keys) in an m=4096 filter; 1000 probe ids starting at max_id + 1
    (guaranteed absent) are tested — a probe is a false positive iff
    all 3 of its bits are set. Measured FPR vs the theoretical
    (1 - e^(-kn/m))^k. One row: n_distinct, n_bits_set, n_false_pos,
    fpr_micro, fpr_theory_micro."""

    def partial(t: pa.Table) -> pd.DataFrame:
        u = np.unique(
            t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        return pd.DataFrame({"u": u})

    users = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()["u"]
        .unique()
    )
    cols = ["n_distinct", "n_bits_set", "n_false_pos", "fpr_micro",
            "fpr_theory_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    n = len(users)
    if n == 0:
        return empty
    bits = set()
    for u in users:
        for d in range(_BF_K):
            bits.add(_fnv32(f"{int(u)}#{d}") % _BF_M)
    max_id = int(max(int(x) for x in users))
    fp = 0
    for p in range(max_id + 1, max_id + 1 + _BF_PROBES):
        if all(_fnv32(f"{p}#{d}") % _BF_M in bits for d in range(_BF_K)):
            fp += 1
    theory = (
        1.0 - float(np.exp(-float(_BF_K) * float(n) / float(_BF_M)))
    ) ** _BF_K
    return pd.DataFrame(
        [
            (
                np.int64(n), np.int64(len(bits)), np.int64(fp),
                np.int64(np.floor(
                    float(fp) / float(_BF_PROBES) * 1_000_000.0 + 0.5
                )),
                np.int64(np.floor(theory * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


def _bf_hash_sql(expr: str, d: int) -> str:
    return (
        "list_reduce(list_prepend(2166136261::BIGINT, "
        f"list_transform(string_split(CAST({expr} AS VARCHAR) || '#{d}', "
        "''), c -> unicode(c)::BIGINT)), "
        "(acc, x) -> (xor(acc, x) * 16777619) % 4294967296) % "
        f"{_BF_M}"
    )


ORACLES366["events_bloom_fpr_measured"] = f"""
WITH du AS (SELECT DISTINCT user_id AS u FROM events),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n, max(u) AS mx FROM du),
bits AS (
  SELECT DISTINCT b FROM (
    SELECT ({_bf_hash_sql('u', 0)}) AS b FROM du
    UNION ALL SELECT ({_bf_hash_sql('u', 1)}) FROM du
    UNION ALL SELECT ({_bf_hash_sql('u', 2)}) FROM du
  )
),
probes AS (
  SELECT nn.mx + 1 + CAST(r.range AS BIGINT) AS p
  FROM nn, range(0, {_BF_PROBES}) r
),
hit AS (
  SELECT p FROM probes
  WHERE EXISTS (SELECT 1 FROM bits
                WHERE b = ({_bf_hash_sql('p', 0)}))
    AND EXISTS (SELECT 1 FROM bits
                WHERE b = ({_bf_hash_sql('p', 1)}))
    AND EXISTS (SELECT 1 FROM bits
                WHERE b = ({_bf_hash_sql('p', 2)}))
),
f AS (
  SELECT nn.n,
         (SELECT CAST(count(*) AS BIGINT) FROM bits) AS nb,
         (SELECT CAST(count(*) AS BIGINT) FROM hit) AS fp
  FROM nn
)
SELECT n AS n_distinct, nb AS n_bits_set, fp AS n_false_pos,
       CAST(floor(CAST(fp AS DOUBLE) / {_BF_PROBES}
                  * 1000000.0 + 0.5) AS BIGINT) AS fpr_micro,
       CAST(floor(pow(1.0 - exp(-{_BF_K}.0 * n / {_BF_M}.0), {_BF_K})
                  * 1000000.0 + 0.5) AS BIGINT) AS fpr_theory_micro
FROM f
WHERE n > 0"""


# ---------------------------------------------------------------------------
# events_hist_quantile_accuracy — histogram sketch vs exact quantiles
# ---------------------------------------------------------------------------


def q_events_hist_quantile_accuracy(sf_dir: str):
    """Approximate-quantile audit: a 128-bin equi-width histogram over
    value cents estimates P50/P90/P99 by within-bin linear
    interpolation; compared against the exact ceil(q n) order
    statistics. Per quantile: q_label, exact_cents, est_cents_micro,
    abs_err_cents_micro."""

    def partial(t: pa.Table) -> pd.DataFrame:
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        h = pd.Series(cents).groupby(cents).size()
        return pd.DataFrame(
            {"y": h.index.to_numpy(np.int64), "c": h.to_numpy(np.int64)}
        )

    hist = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("y")["c"]
        .sum()
        .sort_index()
    )
    cols = ["q_label", "exact_cents", "est_cents_micro",
            "abs_err_cents_micro"]
    empty = pd.DataFrame(
        {
            "q_label": pd.Series([], dtype=object),
            "exact_cents": pd.Series([], dtype=np.int64),
            "est_cents_micro": pd.Series([], dtype=np.int64),
            "abs_err_cents_micro": pd.Series([], dtype=np.int64),
        }
    )
    if hist.empty:
        return empty
    y = hist.index.to_numpy(np.int64)
    c = hist.to_numpy(np.int64)
    n = int(c.sum())
    lo, hi = int(y[0]), int(y[-1])
    span = hi - lo + 1
    if n < 100 or span < _HG_BINS:
        return empty
    # coarse histogram
    bins = (y - lo) * _HG_BINS // span
    coarse = pd.Series(c).groupby(bins).sum()
    bvals = np.zeros(_HG_BINS, np.int64)
    bvals[coarse.index.to_numpy(np.int64)] = coarse.to_numpy(np.int64)
    bcum = np.cumsum(bvals)
    cum = np.cumsum(c)
    w = float(span) / float(_HG_BINS)
    rows = []
    for label, num, den in (("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)):
        need = (num * n + den - 1) // den
        exact = int(y[int(np.searchsorted(cum, need, side="left"))])
        b = int(np.searchsorted(bcum, need, side="left"))
        before = int(bcum[b - 1]) if b > 0 else 0
        cb = int(bvals[b])
        est = float(lo) + (float(b) + float(need - before) / float(cb)) * w
        err = abs(est - float(exact))
        rows.append(
            (
                label, np.int64(exact),
                np.int64(np.floor(est * 1_000_000.0 + 0.5)),
                np.int64(np.floor(err * 1_000_000.0 + 0.5)),
            )
        )
    return pd.DataFrame(rows, columns=cols).astype(
        {"exact_cents": np.int64, "est_cents_micro": np.int64,
         "abs_err_cents_micro": np.int64}
    )


ORACLES366["events_hist_quantile_accuracy"] = f"""
WITH b AS (
  SELECT CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS y FROM events
),
h AS (SELECT y, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1),
g AS (
  SELECT CAST(sum(c) AS BIGINT) AS n, min(y) AS lo, max(y) AS hi
  FROM h
),
qs AS (
  SELECT * FROM (VALUES ('p50', 1, 2), ('p90', 9, 10), ('p99', 99, 100))
    AS t(q_label, num, den)
),
need AS (
  SELECT qs.q_label, (qs.num * g.n + qs.den - 1) // qs.den AS k
  FROM qs, g
),
cumv AS (
  SELECT y, sum(c) OVER (ORDER BY y) AS cc FROM h
),
exact AS (
  SELECT need.q_label, min(cumv.y) AS v
  FROM need JOIN cumv ON cumv.cc >= need.k
  GROUP BY 1
),
coarse AS (
  SELECT (h.y - g.lo) * {_HG_BINS} // (g.hi - g.lo + 1) AS bin,
         CAST(sum(h.c) AS BIGINT) AS c
  FROM h, g GROUP BY 1
),
ccum AS (
  SELECT bin, c, sum(c) OVER (ORDER BY bin) AS cc FROM coarse
),
pick AS (
  SELECT need.q_label, need.k, min(ccum.bin) AS bin
  FROM need JOIN ccum ON ccum.cc >= need.k
  GROUP BY 1, 2
),
est AS (
  SELECT pick.q_label, pick.k, pick.bin,
         ccum.c AS cb, ccum.cc - ccum.c AS before
  FROM pick JOIN ccum ON ccum.bin = pick.bin
),
f AS (
  SELECT est.q_label, exact.v,
         CAST(g.lo AS DOUBLE)
           + (CAST(est.bin AS DOUBLE)
              + CAST(est.k - est.before AS DOUBLE) / est.cb)
             * (CAST(g.hi - g.lo + 1 AS DOUBLE) / {_HG_BINS}) AS e
  FROM est JOIN exact USING (q_label), g
  WHERE g.n >= 100 AND g.hi - g.lo + 1 >= {_HG_BINS}
)
SELECT q_label, CAST(v AS BIGINT) AS exact_cents,
       CAST(floor(e * 1000000.0 + 0.5) AS BIGINT) AS est_cents_micro,
       CAST(floor(abs(e - v) * 1000000.0 + 0.5) AS BIGINT)
         AS abs_err_cents_micro
FROM f
ORDER BY q_label"""


QUERIES366 = {
    "events_bloom_fpr_measured": q_events_bloom_fpr_measured,
    "events_hist_quantile_accuracy": q_events_hist_quantile_accuracy,
}
