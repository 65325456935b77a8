"""Driver-contract queries, wave 340 — mutual-best trade partners (pairs
of nations that are each other's top export destination) and the Gopher
binding-rule diagnostics (which single rule is responsible for each
rejected document). Same contract as queries.py: column names AND
dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES340: dict[str, str] = {}


# ---------------------------------------------------------------------------
# nation_mutual_best — reciprocated top export destinations
# ---------------------------------------------------------------------------


def q_nation_mutual_best(sf_dir: str):
    """Mutual-best partners: each exporting nation's TOP destination
    (max flow, ties to the smallest nationkey); emit the unordered
    pairs where the relation is reciprocated. Pure integer counting.
    Per pair: nation_a, nation_b, w_ab, w_ba.

    Scale shape: the tagged flow-count exchange; the bounded top-pick
    runs on the driver."""
    import ray as _ray
    import pyarrow.parquet as pq_mod

    cust = pq_mod.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    supp = pq_mod.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    nat = pq_mod.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    c2n = dict(zip(cust["c_custkey"].to_pylist(), cust["c_nationkey"].to_pylist()))
    s2n = dict(zip(supp["s_suppkey"].to_pylist(), supp["s_nationkey"].to_pylist()))
    dims_ref = _ray.put((c2n, s2n))

    def li_rows(t: pa.Table) -> pd.DataFrame:
        k = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pd.DataFrame(
            {
                "k": k,
                "supp": t["l_suppkey"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
                "cust": np.int64(-1),
                "_b": (k % 64).astype(np.int64),
            }
        )

    def o_rows(t: pa.Table) -> pd.DataFrame:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pd.DataFrame(
            {
                "k": k,
                "supp": np.int64(-1),
                "cust": t["o_custkey"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
                "_b": (k % 64).astype(np.int64),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        c2n_, s2n_ = _ray.get(dims_ref)
        is_o = (g["cust"] >= 0).to_numpy()
        o = g.loc[is_o, ["k", "cust"]]
        li = g.loc[~is_o, ["k", "supp"]]
        m = li.merge(o, on="k")
        s = m["supp"].map(s2n_).to_numpy(np.int64)
        c = m["cust"].map(c2n_).to_numpy(np.int64)
        keep = s != c
        out = (
            pd.DataFrame({"s": s[keep], "c": c[keep]})
            .groupby(["s", "c"], sort=False)
            .size()
            .rename("w")
            .reset_index()
        )
        out["w"] = out["w"].astype(np.int64)
        return out

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    ).map_batches(li_rows, batch_format="pyarrow")
    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(o_rows, batch_format="pyarrow")
    w = (
        li.union(o)
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .groupby(["s", "c"])["w"]
        .sum()
        .reset_index()
    )
    cols = ["nation_a", "nation_b", "w_ab", "w_ba"]
    empty = pd.DataFrame(
        {
            **{c: pd.Series([], dtype=object) for c in cols[:2]},
            **{c: pd.Series([], dtype=np.int64) for c in cols[2:]},
        }
    )
    if w.empty:
        return empty
    names = dict(zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist()))
    best = {}
    for s_key, sub in w.groupby("s"):
        sub = sub.sort_values(["w", "c"], ascending=[False, True])
        best[int(s_key)] = int(sub.iloc[0]["c"])
    wmap = {(int(r["s"]), int(r["c"])): int(r["w"]) for _, r in w.iterrows()}
    rows = []
    for a in sorted(best):
        b = best[a]
        if b > a and best.get(b) == a:
            rows.append(
                (
                    names[a], names[b],
                    np.int64(wmap.get((a, b), 0)),
                    np.int64(wmap.get((b, a), 0)),
                )
            )
    if not rows:
        return empty
    return (
        pd.DataFrame(rows, columns=cols)
        .sort_values(["nation_a", "nation_b"])
        .reset_index(drop=True)
        .astype({c: np.int64 for c in cols[2:]})
    )


ORACLES340["nation_mutual_best"] = """
WITH w AS (
  SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
         CAST(count(*) AS BIGINT) AS w
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE c.c_nationkey <> s.s_nationkey
  GROUP BY 1, 2
),
best AS (
  SELECT src, dst
  FROM (
    SELECT src, dst,
           row_number() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rk
    FROM w
  ) WHERE rk = 1
),
mutual AS (
  SELECT a.src AS ka, a.dst AS kb
  FROM best a JOIN best b ON b.src = a.dst AND b.dst = a.src
  WHERE a.src < a.dst
)
SELECT na.n_name AS nation_a, nb.n_name AS nation_b,
       CAST((SELECT w FROM w WHERE w.src = m.ka AND w.dst = m.kb)
            AS BIGINT) AS w_ab,
       CAST((SELECT w FROM w WHERE w.src = m.kb AND w.dst = m.ka)
            AS BIGINT) AS w_ba
FROM mutual m
JOIN nation na ON na.n_nationkey = m.ka
JOIN nation nb ON nb.n_nationkey = m.kb
ORDER BY nation_a, nation_b"""


# ---------------------------------------------------------------------------
# docs_gopher_binding_rules — which rule rejects each failing doc
# ---------------------------------------------------------------------------


def q_docs_gopher_binding_rules(sf_dir: str):
    """Filter diagnostics: among documents FAILING the combined Gopher
    keep, count per rule how many fail it, and how many fail ONLY that
    rule (the binding constraint — relaxing it would rescue exactly
    those). Reuses the `docs_gopher` kernel flags verbatim. Per rule:
    rule, n_fail_rule, n_sole_fail; n_fail_total repeated."""
    from ..stages.text_analysis import gopher_quality_batch

    RULES = ("ok_word_count", "ok_mean_word_len", "ok_symbol_ratio",
             "ok_stopwords")

    def partial(t: pa.Table) -> pd.DataFrame:
        g = gopher_quality_batch(t)
        flags = {
            r: g[r].to_numpy(zero_copy_only=False).astype(np.int64)
            for r in RULES
        }
        keep = g["keep"].to_numpy(zero_copy_only=False).astype(np.int64)
        fail = keep == 0
        n_fail = int(fail.sum())
        rows = []
        fails = {r: (flags[r] == 0) for r in RULES}
        n_failed_rules = np.zeros(len(keep), np.int64)
        for r in RULES:
            n_failed_rules += fails[r].astype(np.int64)
        for r in RULES:
            rows.append(
                (
                    r,
                    np.int64(int((fails[r] & fail).sum())),
                    np.int64(int(
                        (fails[r] & fail & (n_failed_rules == 1)).sum()
                    )),
                    np.int64(n_fail),
                )
            )
        return pd.DataFrame(
            rows, columns=["rule", "nf", "ns", "nt"]
        )

    m = (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("rule")[["nf", "ns", "nt"]]
        .sum()
        .sort_index()
    )
    cols = ["rule", "n_fail_rule", "n_sole_fail", "n_fail_total"]
    empty = pd.DataFrame(
        {
            "rule": pd.Series([], dtype=object),
            **{c: pd.Series([], dtype=np.int64) for c in cols[1:]},
        }
    )
    if m.empty:
        return empty
    out = m.reset_index().rename(
        columns={"nf": "n_fail_rule", "ns": "n_sole_fail",
                 "nt": "n_fail_total"}
    )
    return out.astype({c: np.int64 for c in cols[1:]})[cols]


ORACLES340["docs_gopher_binding_rules"] = """
WITH w AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS words
  FROM documents
),
m AS (
  SELECT doc_id,
         CAST(len(words) AS BIGINT) AS word_count,
         list_sum(list_transform(words, x -> strlen(x))) * 1.0
             / greatest(len(words), 1) AS mean_len,
         (length(text) - length(replace(text, '#', ''))) AS hashes,
         (length(text) - length(replace(text, '...', ''))) / 3 AS ellipses,
         (CAST(regexp_matches(lower(text), '\\bthe\\b') AS INT)
          + CAST(regexp_matches(lower(text), '\\bbe\\b') AS INT)
          + CAST(regexp_matches(lower(text), '\\bto\\b') AS INT)
          + CAST(regexp_matches(lower(text), '\\bof\\b') AS INT)
          + CAST(regexp_matches(lower(text), '\\band\\b') AS INT)
          + CAST(regexp_matches(lower(text), '\\bthat\\b') AS INT)
          + CAST(regexp_matches(lower(text), '\\bhave\\b') AS INT)
          + CAST(regexp_matches(lower(text), '\\bwith\\b') AS INT))
           AS stop_hits
  FROM w
),
fl AS (
  SELECT doc_id,
         CAST(NOT (word_count >= 50 AND word_count <= 100000) AS BIGINT)
           AS f_wc,
         CAST(NOT (mean_len >= 3.0 AND mean_len <= 10.0) AS BIGINT)
           AS f_ml,
         CAST(NOT (hashes * 1.0 / greatest(word_count, 1) <= 0.1
                   AND ellipses * 1.0 / greatest(word_count, 1) <= 0.1)
              AS BIGINT) AS f_sr,
         CAST(NOT (stop_hits >= 2) AS BIGINT) AS f_sw
  FROM m
),
fail AS (
  SELECT *, f_wc + f_ml + f_sr + f_sw AS nf
  FROM fl WHERE f_wc + f_ml + f_sr + f_sw >= 1
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM fail),
rules AS (
  SELECT 'ok_mean_word_len' AS rule,
         CAST(sum(f_ml) AS BIGINT) AS n_fail_rule,
         CAST(sum(CASE WHEN f_ml = 1 AND nf = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_sole_fail
  FROM fail
  UNION ALL
  SELECT 'ok_stopwords', CAST(sum(f_sw) AS BIGINT),
         CAST(sum(CASE WHEN f_sw = 1 AND nf = 1 THEN 1 ELSE 0 END)
              AS BIGINT)
  FROM fail
  UNION ALL
  SELECT 'ok_symbol_ratio', CAST(sum(f_sr) AS BIGINT),
         CAST(sum(CASE WHEN f_sr = 1 AND nf = 1 THEN 1 ELSE 0 END)
              AS BIGINT)
  FROM fail
  UNION ALL
  SELECT 'ok_word_count', CAST(sum(f_wc) AS BIGINT),
         CAST(sum(CASE WHEN f_wc = 1 AND nf = 1 THEN 1 ELSE 0 END)
              AS BIGINT)
  FROM fail
)
SELECT r.rule, r.n_fail_rule, r.n_sole_fail, tot.t AS n_fail_total
FROM rules r, tot
ORDER BY r.rule"""


QUERIES340 = {
    "nation_mutual_best": q_nation_mutual_best,
    "docs_gopher_binding_rules": q_docs_gopher_binding_rules,
}
