"""Driver-contract queries, wave 387 — MinHash-LSH near-duplicate
candidate precision (16 FNV permutations in 4 bands of 4) and the
Jonckheere-Terpstra ordered trend test of order value across
priorities. Same contract as queries.py: column names AND dtypes match
the DuckDB oracle exactly."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES387: dict[str, str] = {}

_LSH_PERMS = 16
_LSH_BANDS = 4
_LSH_ROWS = 4
_SIM_THRESH_NUM = 1
_SIM_THRESH_DEN = 2  # true pair iff Jaccard >= 1/2


def _fnv32(key: str) -> int:
    acc = 2166136261
    for ch in key:
        acc = ((acc ^ ord(ch)) * 16777619) % 4294967296
    return acc


# ---------------------------------------------------------------------------
# docs_minhash_lsh_precision — banded LSH candidate audit
# ---------------------------------------------------------------------------


def q_docs_minhash_lsh_precision(sf_dir: str):
    """LSH audit: per doc a 16-perm MinHash signature over its token
    set (FNV 'token#i'); docs pair up as candidates when any of the 4
    bands (4 rows each) matches exactly. Among candidates, precision
    against true token-set Jaccard >= 1/2. One row: n_docs,
    n_candidate_pairs, n_true_among_candidates, precision_micro.

    Scale shape: vocab hashes once; doc x perm mins ride the wordcount
    exchange; band buckets group-by into candidate pairs."""

    def partial(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t["text"]), r"\s+"
        ).combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = np.asarray(toks.flatten().to_numpy(zero_copy_only=False))
        did = np.repeat(
            t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64),
            lens,
        )
        keep = flat != ""
        return pd.DataFrame(
            {"d": did[keep], "w": flat[keep]}
        ).drop_duplicates()

    pairs = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .drop_duplicates()
    )
    cols = ["n_docs", "n_candidate_pairs", "n_true_among_candidates",
            "precision_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if pairs.empty:
        return empty
    vocab = sorted(pairs["w"].unique())
    hmat = {
        w: [_fnv32(f"{w}#{i}") for i in range(_LSH_PERMS)] for w in vocab
    }
    doc_words = {
        int(d): list(sub["w"]) for d, sub in pairs.groupby("d")
    }
    sigs = {}
    for d_, words in doc_words.items():
        sigs[d_] = [
            min(hmat[w][i] for w in words) for i in range(_LSH_PERMS)
        ]
    buckets = {}
    for d_, sig in sigs.items():
        for b in range(_LSH_BANDS):
            key = (b, tuple(sig[b * _LSH_ROWS:(b + 1) * _LSH_ROWS]))
            buckets.setdefault(key, []).append(d_)
    cand = set()
    for members in buckets.values():
        if len(members) < 2:
            continue
        for a, b in itertools.combinations(sorted(members), 2):
            cand.add((a, b))
    n_docs = len(doc_words)
    if not cand:
        return pd.DataFrame(
            [(np.int64(n_docs), np.int64(0), np.int64(0), np.int64(0))],
            columns=cols,
        ).astype({c: np.int64 for c in cols})
    word_sets = {d_: set(ws) for d_, ws in doc_words.items()}
    true_n = 0
    for a, b in cand:
        sa, sb = word_sets[a], word_sets[b]
        inter = len(sa & sb)
        union = len(sa) + len(sb) - inter
        if _SIM_THRESH_DEN * inter >= _SIM_THRESH_NUM * union:
            true_n += 1
    return pd.DataFrame(
        [
            (
                np.int64(n_docs), np.int64(len(cand)), np.int64(true_n),
                np.int64(np.floor(
                    float(true_n) / float(len(cand)) * 1_000_000.0 + 0.5
                )),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


_LSH_HASH_SQL = (
    "list_reduce(list_prepend(2166136261::BIGINT, "
    "list_transform(string_split(w || '#' || CAST(i AS VARCHAR), ''), "
    "c -> unicode(c)::BIGINT)), "
    "(acc, x) -> (xor(acc, x) * 16777619) % 4294967296)"
)

ORACLES387["docs_minhash_lsh_precision"] = rf"""
WITH ws AS (
  SELECT DISTINCT doc_id AS d,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS w
  FROM documents
),
vocab AS (SELECT DISTINCT w FROM ws),
perms AS (SELECT CAST(r.range AS BIGINT) AS i
          FROM range(0, {_LSH_PERMS}) r),
hw AS (
  SELECT vocab.w, perms.i, ({_LSH_HASH_SQL}) AS h
  FROM vocab, perms
),
sig AS (
  SELECT ws.d, hw.i, min(hw.h) AS m
  FROM ws JOIN hw USING (w)
  GROUP BY 1, 2
),
bands AS (
  SELECT d, i // {_LSH_ROWS} AS band,
         string_agg(CAST(m AS VARCHAR), ',' ORDER BY i) AS key
  FROM sig GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT a.d AS da, b.d AS db
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.d < b.d
),
sz AS (SELECT d, CAST(count(*) AS BIGINT) AS n FROM ws GROUP BY 1),
inter AS (
  SELECT cand.da, cand.db, CAST(count(*) AS BIGINT) AS i
  FROM cand
  JOIN ws wa ON wa.d = cand.da
  JOIN ws wb ON wb.d = cand.db AND wb.w = wa.w
  GROUP BY 1, 2
),
judged AS (
  SELECT cand.da, cand.db,
         CASE WHEN {_SIM_THRESH_DEN} * coalesce(inter.i, 0)
                   >= {_SIM_THRESH_NUM}
                      * (sa.n + sb.n - coalesce(inter.i, 0))
              THEN 1 ELSE 0 END AS ok
  FROM cand
  JOIN sz sa ON sa.d = cand.da
  JOIN sz sb ON sb.d = cand.db
  LEFT JOIN inter ON inter.da = cand.da AND inter.db = cand.db
),
f AS (
  SELECT (SELECT CAST(count(DISTINCT d) AS BIGINT) FROM ws) AS nd,
         CAST(count(*) AS BIGINT) AS nc,
         CAST(coalesce(sum(ok), 0) AS BIGINT) AS nt
  FROM judged
)
SELECT nd AS n_docs, nc AS n_candidate_pairs,
       nt AS n_true_among_candidates,
       CAST(CASE WHEN nc > 0
                 THEN floor(CAST(nt AS DOUBLE) / nc * 1000000.0 + 0.5)
                 ELSE 0 END AS BIGINT) AS precision_micro
FROM f"""


# ---------------------------------------------------------------------------
# orders_jonckheere_priority_trend — ordered-alternative trend test
# ---------------------------------------------------------------------------


def q_orders_jonckheere_priority_trend(sf_dir: str):
    """Jonckheere-Terpstra: does order value trend across the ordered
    priorities (1-URGENT .. 5-LOW)? Doubled JT statistic
    2*JT = sum over ordered group pairs of (2*#(x_a < x_b) + #ties)
    via per-priority cents histograms — exact integers; the no-tie
    normal approximation gives z. One row: n, n_groups, jt2, z_micro."""

    def partial(t: pa.Table) -> pd.DataFrame:
        cents = np.floor(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame(
                {"pri": t["o_orderpriority"].to_numpy(zero_copy_only=False),
                 "y": cents}
            )
            .groupby(["pri", "y"])
            .size()
            .rename("c")
            .reset_index()
        )
        g["c"] = g["c"].astype(np.int64)
        return g

    hist = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderpriority", "o_totalprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["pri", "y"])["c"]
        .sum()
        .reset_index()
    )
    cols = ["n", "n_groups", "jt2", "z_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if hist.empty:
        return empty
    pris = sorted(hist["pri"].unique())
    k = len(pris)
    if k < 2:
        return empty
    per = {}
    for p_ in pris:
        sub = hist[hist["pri"] == p_].sort_values("y")
        per[p_] = (
            sub["y"].to_numpy(np.int64),
            sub["c"].to_numpy(np.int64).astype(object),
        )
    sizes = {p_: int(sum(int(x) for x in per[p_][1])) for p_ in pris}
    n = sum(sizes.values())
    jt2 = 0
    for a, b in itertools.combinations(pris, 2):
        ya, ca = per[a]
        yb, cb = per[b]
        cum_a = np.cumsum(ca)
        # for each value in b: count of a-values strictly below / equal
        pos = np.searchsorted(ya, yb, side="left")
        below = np.where(pos > 0, cum_a[np.maximum(pos - 1, 0)], 0)
        eq_idx = np.searchsorted(ya, yb, side="left")
        eq = np.zeros(len(yb), object)
        in_range = (eq_idx < len(ya))
        for i in range(len(yb)):
            if in_range[i] and int(ya[eq_idx[i]]) == int(yb[i]):
                eq[i] = int(ca[eq_idx[i]])
        jt2 += int(sum(
            int(c_) * (2 * int(bl) + int(e_))
            for c_, bl, e_ in zip(cb, below, eq)
        ))
    mean2 = 0
    for a, b in itertools.combinations(pris, 2):
        mean2 += sizes[a] * sizes[b]
    # 2*JT has mean sum(na*nb) * ... : E[2JT] = sum na*nb ; no-tie var
    var = (
        float(n) * float(n) * (2.0 * float(n) + 3.0)
        - sum(
            float(sizes[p_]) ** 2 * (2.0 * float(sizes[p_]) + 3.0)
            for p_ in pris
        )
    ) / 72.0
    if var <= 0.0:
        return empty
    z = (float(jt2) / 2.0 - float(mean2) / 2.0) / float(np.sqrt(var))
    return pd.DataFrame(
        [
            (
                np.int64(n), np.int64(k), np.int64(jt2),
                np.int64(np.floor(z * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES387["orders_jonckheere_priority_trend"] = """
WITH b AS (
  SELECT o_orderpriority AS pri,
         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS y
  FROM orders
),
h AS (
  SELECT pri, y, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1, 2
),
sizes AS (SELECT pri, CAST(sum(c) AS BIGINT) AS m FROM h GROUP BY 1),
nn AS (SELECT CAST(sum(m) AS BIGINT) AS n,
              CAST(count(*) AS BIGINT) AS k FROM sizes),
cum AS (
  SELECT pri, y, c,
         sum(c) OVER (PARTITION BY pri ORDER BY y) - c AS below
  FROM h
),
jt AS (
  SELECT CAST(sum(CAST(hb.c AS HUGEINT)
                  * (2 * (SELECT coalesce(max(ca.below + ca.c), 0)
                          FROM cum ca
                          WHERE ca.pri = pa.pri AND ca.y < hb.y)
                     + coalesce((SELECT ca2.c FROM h ca2
                                 WHERE ca2.pri = pa.pri
                                   AND ca2.y = hb.y), 0)))
              AS HUGEINT) AS jt2
  FROM h hb
  JOIN sizes pa ON pa.pri < hb.pri
),
mean2 AS (
  SELECT CAST(sum(CAST(a.m AS HUGEINT) * b.m) AS HUGEINT) AS m2
  FROM sizes a JOIN sizes b ON a.pri < b.pri
),
var AS (
  SELECT (CAST(nn.n AS DOUBLE) * nn.n * (2.0 * nn.n + 3.0)
          - (SELECT sum(CAST(m AS DOUBLE) * m * (2.0 * m + 3.0))
             FROM sizes)) / 72.0 AS v
  FROM nn
)
SELECT nn.n, nn.k AS n_groups, CAST(jt.jt2 AS BIGINT) AS jt2,
       CAST(floor((CAST(jt.jt2 AS DOUBLE) / 2.0
                   - CAST(mean2.m2 AS DOUBLE) / 2.0) / sqrt(var.v)
                  * 1000000.0 + 0.5) AS BIGINT) AS z_micro
FROM nn, jt, mean2, var
WHERE nn.k >= 2 AND var.v > 0"""


QUERIES387 = {
    "docs_minhash_lsh_precision": q_docs_minhash_lsh_precision,
    "orders_jonckheere_priority_trend": q_orders_jonckheere_priority_trend,
}
