"""Driver-contract queries, wave 368 — MinHash Jaccard-estimate
accuracy between the vocabularies of the first two document sources
(64 FNV permutations vs the true Jaccard) and winsorized/trimmed
robust means of customer balances off the exact cents histogram. Same
contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES368: dict[str, str] = {}

_MH_K = 64


def _fnv32(key: str) -> int:
    acc = 2166136261
    for ch in key:
        acc = ((acc ^ ord(ch)) * 16777619) % 4294967296
    return acc


# ---------------------------------------------------------------------------
# docs_minhash_jaccard_accuracy — 64-perm MinHash vs true Jaccard
# ---------------------------------------------------------------------------


def q_docs_minhash_jaccard_accuracy(sf_dir: str):
    """MinHash audit: the vocabularies of the two alphabetically-first
    sources; for each of 64 FNV permutations ('token#i') the per-set
    minimum hash; the match fraction estimates Jaccard, compared with
    the exact value. One row: source_a, source_b, n_a, n_b,
    true_jaccard_micro, n_matches, est_jaccard_micro, abs_err_micro.

    Scale shape: (source, token) DISTINCT pairs reduce on the
    wordcount exchange; the 64-permutation min fold is a bounded
    per-set summary any node can hold."""

    def partial(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t["text"]), r"\s+"
        ).combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = np.asarray(toks.flatten().to_numpy(zero_copy_only=False))
        src = np.repeat(t["source"].to_numpy(zero_copy_only=False), lens)
        keep = flat != ""
        return pd.DataFrame(
            {"src": src[keep], "w": flat[keep]}
        ).drop_duplicates()

    pairs = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["source", "text"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .drop_duplicates()
    )
    cols = ["source_a", "source_b", "n_a", "n_b", "true_jaccard_micro",
            "n_matches", "est_jaccard_micro", "abs_err_micro"]
    empty = pd.DataFrame(
        {
            "source_a": pd.Series([], dtype=object),
            "source_b": pd.Series([], dtype=object),
            **{c: pd.Series([], dtype=np.int64) for c in cols[2:]},
        }
    )
    srcs = sorted(pairs["src"].unique())
    if len(srcs) < 2:
        return empty
    a_name, b_name = srcs[0], srcs[1]
    va = set(pairs[pairs["src"] == a_name]["w"])
    vb = set(pairs[pairs["src"] == b_name]["w"])
    if not va or not vb:
        return empty
    union = len(va | vb)
    inter = len(va & vb)
    true_j = float(inter) / float(union)

    def mins(vocab: set) -> list[int]:
        out = []
        for i in range(_MH_K):
            out.append(min(_fnv32(f"{w}#{i}") for w in vocab))
        return out

    ma, mb = mins(va), mins(vb)
    matches = sum(1 for x, y in zip(ma, mb) if x == y)
    est = float(matches) / float(_MH_K)
    return pd.DataFrame(
        [
            (
                a_name, b_name, np.int64(len(va)), np.int64(len(vb)),
                np.int64(np.floor(true_j * 1_000_000.0 + 0.5)),
                np.int64(matches),
                np.int64(np.floor(est * 1_000_000.0 + 0.5)),
                np.int64(np.floor(
                    abs(est - true_j) * 1_000_000.0 + 0.5
                )),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols[2:]})


_MH_HASH_SQL = (
    "list_reduce(list_prepend(2166136261::BIGINT, "
    "list_transform(string_split(w || '#' || CAST(i AS VARCHAR), ''), "
    "c -> unicode(c)::BIGINT)), "
    "(acc, x) -> (xor(acc, x) * 16777619) % 4294967296)"
)

ORACLES368["docs_minhash_jaccard_accuracy"] = rf"""
WITH tok AS (
  SELECT DISTINCT source AS src,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS w
  FROM documents
),
two AS (
  SELECT src, row_number() OVER (ORDER BY src) AS rn
  FROM (SELECT DISTINCT src FROM tok)
  QUALIFY rn <= 2
),
a AS (SELECT w FROM tok WHERE src = (SELECT src FROM two WHERE rn = 1)),
b AS (SELECT w FROM tok WHERE src = (SELECT src FROM two WHERE rn = 2)),
names AS (
  SELECT (SELECT src FROM two WHERE rn = 1) AS sa,
         (SELECT src FROM two WHERE rn = 2) AS sb
),
sz AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM a) AS na,
         (SELECT CAST(count(*) AS BIGINT) FROM b) AS nb,
         (SELECT CAST(count(*) AS BIGINT)
          FROM a JOIN b USING (w)) AS i
),
perms AS (SELECT CAST(r.range AS BIGINT) AS i FROM range(0, {_MH_K}) r),
mina AS (
  SELECT perms.i, min({_MH_HASH_SQL}) AS m
  FROM a, perms GROUP BY 1
),
minb AS (
  SELECT perms.i, min({_MH_HASH_SQL}) AS m
  FROM b, perms GROUP BY 1
),
mm AS (
  SELECT CAST(sum(CASE WHEN mina.m = minb.m THEN 1 ELSE 0 END)
              AS BIGINT) AS k
  FROM mina JOIN minb USING (i)
),
f AS (
  SELECT names.sa, names.sb, sz.na, sz.nb, sz.i, mm.k,
         CAST(sz.i AS DOUBLE) / (sz.na + sz.nb - sz.i) AS tj,
         CAST(mm.k AS DOUBLE) / {_MH_K} AS ej
  FROM names, sz, mm
  WHERE sz.na > 0 AND sz.nb > 0
)
SELECT sa AS source_a, sb AS source_b, na AS n_a, nb AS n_b,
       CAST(floor(tj * 1000000.0 + 0.5) AS BIGINT)
         AS true_jaccard_micro,
       k AS n_matches,
       CAST(floor(ej * 1000000.0 + 0.5) AS BIGINT)
         AS est_jaccard_micro,
       CAST(floor(abs(ej - tj) * 1000000.0 + 0.5) AS BIGINT)
         AS abs_err_micro
FROM f"""


# ---------------------------------------------------------------------------
# customer_acctbal_robust_means — winsorized and trimmed means
# ---------------------------------------------------------------------------


def q_customer_acctbal_robust_means(sf_dir: str):
    """Robust location: the 5% winsorized and 5% trimmed means of
    customer balances, computed exactly off the cents histogram
    (k = floor(0.05 n) clamped/shed per tail; integer sums), vs the
    raw mean. One row: n, k_tail, mean_micro, winsor_mean_micro,
    trim_mean_micro."""

    def partial(t: pa.Table) -> pd.DataFrame:
        cents = np.floor(
            t["c_acctbal"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        h = pd.Series(cents).groupby(cents).size()
        return pd.DataFrame(
            {"y": h.index.to_numpy(np.int64), "c": h.to_numpy(np.int64)}
        )

    hist = (
        ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                              columns=["c_acctbal"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("y")["c"]
        .sum()
        .sort_index()
    )
    cols = ["n", "k_tail", "mean_micro", "winsor_mean_micro",
            "trim_mean_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if hist.empty:
        return empty
    y = hist.index.to_numpy(np.int64).astype(object)
    c = hist.to_numpy(np.int64).astype(object)
    n = int(sum(int(x) for x in c))
    k = n // 20
    if n < 40 or 2 * k >= n:
        return empty
    total = int(sum(int(a) * int(b) for a, b in zip(y, c)))
    cum = np.cumsum(c)
    # sum of the k smallest and the value at rank k+1
    low_sum = 0
    taken = 0
    for yi, ci in zip(y, c):
        take = min(int(ci), k - taken)
        if take <= 0:
            break
        low_sum += take * int(yi)
        taken += take
    v_lo = int(y[int(np.searchsorted(cum, k + 1, side="left"))])
    # mirror from the top
    rc = c[::-1]
    ry = y[::-1]
    rcum = np.cumsum(rc)
    high_sum = 0
    taken = 0
    for yi, ci in zip(ry, rc):
        take = min(int(ci), k - taken)
        if take <= 0:
            break
        high_sum += take * int(yi)
        taken += take
    v_hi = int(ry[int(np.searchsorted(rcum, k + 1, side="left"))])
    winsor = total - low_sum - high_sum + k * v_lo + k * v_hi
    trim = total - low_sum - high_sum
    return pd.DataFrame(
        [
            (
                np.int64(n), np.int64(k),
                np.int64(np.floor(
                    float(total) / float(n) / 100.0 * 1_000_000.0 + 0.5
                )),
                np.int64(np.floor(
                    float(winsor) / float(n) / 100.0 * 1_000_000.0 + 0.5
                )),
                np.int64(np.floor(
                    float(trim) / float(n - 2 * k) / 100.0
                    * 1_000_000.0 + 0.5
                )),
            )
        ],
        columns=cols,
    ).astype({c_: np.int64 for c_ in cols})


ORACLES368["customer_acctbal_robust_means"] = """
WITH b AS (
  SELECT CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS y
  FROM customer
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n,
              (CAST(count(*) AS BIGINT)) // 20 AS k,
              CAST(sum(y) AS BIGINT) AS total FROM b),
r AS (
  SELECT y, row_number() OVER (ORDER BY y) AS rn FROM b
),
lo AS (
  SELECT CAST(coalesce(sum(CASE WHEN rn <= nn.k THEN y END), 0)
              AS BIGINT) AS s,
         max(CASE WHEN rn = nn.k + 1 THEN y END) AS v
  FROM r, nn
),
hi AS (
  SELECT CAST(coalesce(sum(CASE WHEN rn > nn.n - nn.k THEN y END), 0)
              AS BIGINT) AS s,
         max(CASE WHEN rn = nn.n - nn.k THEN y END) AS v
  FROM r, nn
),
f AS (
  SELECT nn.n, nn.k, nn.total,
         nn.total - lo.s - hi.s + nn.k * lo.v + nn.k * hi.v AS w,
         nn.total - lo.s - hi.s AS t
  FROM nn, lo, hi
  WHERE nn.n >= 40 AND 2 * nn.k < nn.n
)
SELECT n, k AS k_tail,
       CAST(floor(CAST(total AS DOUBLE) / n / 100.0 * 1000000.0 + 0.5)
            AS BIGINT) AS mean_micro,
       CAST(floor(CAST(w AS DOUBLE) / n / 100.0 * 1000000.0 + 0.5)
            AS BIGINT) AS winsor_mean_micro,
       CAST(floor(CAST(t AS DOUBLE) / (n - 2 * k) / 100.0
                  * 1000000.0 + 0.5) AS BIGINT) AS trim_mean_micro
FROM f"""


QUERIES368 = {
    "docs_minhash_jaccard_accuracy": q_docs_minhash_jaccard_accuracy,
    "customer_acctbal_robust_means": q_customer_acctbal_robust_means,
}
