"""Driver-contract queries, wave 87 — Q9-shaped profit by supplier nation
and year (4-way join lineitem×part×supplier×nation with an exact
integer-micro margin proxy) and LSH dedup evaluation (MinHash-LSH candidate
pairs vs the exact n-gram Jaccard ground truth on the 200-doc validation
slice: precision/recall — the quality gate every approximate dedup needs).
Same contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

ORACLES87: dict[str, str] = {}

_Q9_BUCKETS = 32
_LSH_SLICE = 200


# ---------------------------------------------------------------------------
# q9_profit — margin proxy per supplier nation and ship year
# ---------------------------------------------------------------------------


def q_q9_profit(sf_dir: str):
    """TPC-H Q9 shape (adapted: the schema carries p_retailprice instead of
    partsupp cost): margin = ext·(1−disc) − p_retailprice·qty, per-row
    micro-quantized, summed per (supplier nation, ship year).

    Scale shape: lineitems join part in ONE partkey-bucket exchange (the
    revenue side pre-aggregates per (partkey, suppkey, year) inside batches);
    the margin partials then re-key by suppkey for a SECOND bounded exchange
    against the supplier→nation map; per-(nation, year) integer partials
    reach the driver (≤ |nations|·|years| rows)."""

    def li_partial(t: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        pk = t["l_partkey"].to_numpy().astype(np.int64)
        sk = t["l_suppkey"].to_numpy().astype(np.int64)
        yr = pc.year(t["l_shipdate"]).to_numpy(zero_copy_only=False).astype(np.int64)
        ext = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        rev = np.floor(ext * (1.0 - disc) * 1_000_000.0 + 0.5).astype(np.int64)
        g = (
            pd.DataFrame({"pk": pk, "sk": sk, "yr": yr, "rev": rev, "qty": qty})
            .groupby(["pk", "sk", "yr"], sort=False, as_index=False)
            .sum()
        )
        return pd.DataFrame(
            {
                "pk": g["pk"].to_numpy(np.int64),
                "sk": g["sk"].to_numpy(np.int64),
                "yr": g["yr"].to_numpy(np.int64),
                "rev": g["rev"].to_numpy(np.int64),
                "qty": g["qty"].to_numpy(np.float64),
                "rp": np.float64(-1.0),
                "_b": (g["pk"].to_numpy(np.int64) % _Q9_BUCKETS).astype(np.int64),
            }
        )

    def p_rows(t: pa.Table) -> pd.DataFrame:
        pk = t["p_partkey"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "pk": pk,
                "sk": np.int64(-1),
                "yr": np.int64(-1),
                "rev": np.int64(0),
                "qty": np.float64(0.0),
                "rp": t["p_retailprice"].to_numpy(zero_copy_only=False),
                "_b": (pk % _Q9_BUCKETS).astype(np.int64),
            }
        )

    def join_part(g: pd.DataFrame) -> pd.DataFrame:
        p = g.loc[(g["sk"] < 0).to_numpy(), ["pk", "rp"]]
        li = g.loc[(g["sk"] >= 0).to_numpy(), ["pk", "sk", "yr", "rev", "qty"]]
        j = li.merge(p, on="pk")
        # cost = retail · qty, micro-quantized with the same association the
        # SQL uses: floor(rp * qty * 1e6 + 0.5) per pre-aggregated row
        cost = np.floor(
            j["rp"].to_numpy() * j["qty"].to_numpy() * 1_000_000.0 + 0.5
        ).astype(np.int64)
        out = pd.DataFrame(
            {
                "sk": j["sk"].to_numpy(np.int64),
                "yr": j["yr"].to_numpy(np.int64),
                "m": j["rev"].to_numpy(np.int64) - cost,
            }
        ).groupby(["sk", "yr"], sort=False, as_index=False).sum()
        out["_b"] = (out["sk"].to_numpy(np.int64) % _Q9_BUCKETS).astype(np.int64)
        return out

    def s_rows(t: pa.Table) -> pd.DataFrame:
        sk = t["s_suppkey"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "sk": sk,
                "yr": np.int64(-1),
                "m": np.int64(0),
                "nk": t["s_nationkey"].to_numpy().astype(np.int64),
                "_b": (sk % _Q9_BUCKETS).astype(np.int64),
            }
        )

    def join_supp(g: pd.DataFrame) -> pd.DataFrame:
        s = g.loc[(g["yr"] < 0).to_numpy(), ["sk", "nk"]]
        m = g.loc[(g["yr"] >= 0).to_numpy(), ["sk", "yr", "m"]]
        j = m.merge(s, on="sk")
        out = j.groupby(["nk", "yr"], sort=False, as_index=False)["m"].sum()
        return pd.DataFrame(
            {
                "nk": out["nk"].to_numpy(np.int64),
                "yr": out["yr"].to_numpy(np.int64),
                "m": out["m"].to_numpy(np.int64),
            }
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_partkey", "l_suppkey", "l_shipdate",
            "l_extendedprice", "l_discount", "l_quantity",
        ],
    ).map_batches(li_partial, batch_format="pyarrow")
    p = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_retailprice"]
    ).map_batches(p_rows, batch_format="pyarrow")
    margins = (
        li.union(p).groupby("_b").map_groups(join_part, batch_format="pandas")
    )
    sup = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).map_batches(s_rows, batch_format="pyarrow")
    margins = margins.map_batches(
        lambda df: df.assign(nk=np.int64(-1))[["sk", "yr", "m", "nk", "_b"]],
        batch_format="pandas",
    )
    part = (
        margins.union(sup)
        .groupby("_b")
        .map_groups(join_supp, batch_format="pandas")
        .to_pandas()  # bounded: |nations|·|years| rows per bucket
        .groupby(["nk", "yr"], as_index=False)["m"]
        .sum()
    )
    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    out = (
        part.merge(nat, left_on="nk", right_on="n_nationkey")
        .sort_values(["n_name", "yr"], kind="mergesort")
        .reset_index(drop=True)
    )
    return pd.DataFrame(
        {
            "nation_name": out["n_name"].astype(object),
            "ship_year": out["yr"].to_numpy(np.int64),
            "margin_micro": out["m"].to_numpy(np.int64),
        }
    )


ORACLES87["q9_profit"] = """
WITH li AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
         CAST(year(l_shipdate) AS BIGINT) AS yr,
         sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1000000 + 0.5)
                  AS HUGEINT)) AS rev,
         sum(l_quantity) AS qty
  FROM lineitem GROUP BY 1, 2, 3
),
m AS (
  SELECT sk, yr,
         rev - CAST(floor(p_retailprice * qty * 1000000 + 0.5) AS HUGEINT)
           AS m
  FROM li JOIN part ON p_partkey = pk
)
SELECT n_name AS nation_name, yr AS ship_year,
       CAST(sum(m.m) AS BIGINT) AS margin_micro
FROM m JOIN supplier ON s_suppkey = sk
       JOIN nation ON n_nationkey = s_nationkey
GROUP BY 1, 2 ORDER BY 1, 2"""


# ---------------------------------------------------------------------------
# docs_lsh_eval — MinHash-LSH precision/recall vs exact Jaccard
# ---------------------------------------------------------------------------


def q_docs_lsh_eval(sf_dir: str):
    """Approximate-dedup quality gate on the 200-doc validation slice: run
    MinHash-LSH (signature-estimate ≥ 0.5) AND the exact n-gram Jaccard
    baseline; report pair counts, the overlap, and exact micro
    precision/recall.

    Scale shape: both operators already run distributed (banded shuffle /
    block-pair join); only their PAIR LISTS — bounded by the fixed
    validation slice — reach the driver for the set comparison. The slice
    size is the documented evaluation contract, not a scalability cap on the
    underlying operators."""
    from ..stages.dedup_docs import minhash_lsh_pairs, ngram_jaccard_pairs

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    idx = np.argsort(t["doc_id"].to_numpy(), kind="stable")[:_LSH_SLICE]
    t = t.take(idx)
    lsh = (
        minhash_lsh_pairs(ray.data.from_arrow(t), jaccard_threshold=0.5)
        .to_pandas()
    )
    exact = (
        ngram_jaccard_pairs(ray.data.from_arrow(t), threshold=0.5).to_pandas()
    )
    # an all-empty pair Dataset loses its schema through Ray (CLAUDE.md
    # empty-block hazard — at sf0.1 the 200-doc slice has no ≥0.5 pair), so
    # guard the column access, not just emptiness
    def _pairs(df: pd.DataFrame) -> set:
        if "a" not in df.columns:
            return set()
        return set(zip(df["a"].astype(int), df["b"].astype(int)))

    lp = _pairs(lsh)
    ep = _pairs(exact)
    common = lp & ep
    nl, ne, nc = len(lp), len(ep), len(common)
    return pd.DataFrame(
        {
            "n_lsh_pairs": np.array([nl], np.int64),
            "n_exact_pairs": np.array([ne], np.int64),
            "n_common": np.array([nc], np.int64),
            "precision_micro": np.array(
                [(nc * 1_000_000) // nl if nl else 0], np.int64
            ),
            "recall_micro": np.array(
                [(nc * 1_000_000) // ne if ne else 0], np.int64
            ),
        }
    )


def _lsh_eval_oracle() -> str:
    from .queries2 import ORACLES2, _minhash_oracle

    slice_src = f"(SELECT * FROM documents ORDER BY doc_id LIMIT {_LSH_SLICE})"
    mh = _minhash_oracle(slice_src)
    exact = ORACLES2["docs_ngram_jaccard"]
    return f"""
WITH lshp AS (SELECT a, b FROM ({mh}) t1),
exactp AS (SELECT a, b FROM ({exact}) t2),
c AS (
  SELECT CAST((SELECT count(*) FROM lshp) AS HUGEINT) AS nl,
         CAST((SELECT count(*) FROM exactp) AS HUGEINT) AS ne,
         CAST((SELECT count(*) FROM lshp JOIN exactp
               ON exactp.a = lshp.a AND exactp.b = lshp.b) AS HUGEINT) AS nc
)
SELECT CAST(nl AS BIGINT) AS n_lsh_pairs,
       CAST(ne AS BIGINT) AS n_exact_pairs,
       CAST(nc AS BIGINT) AS n_common,
       CAST(CASE WHEN nl > 0 THEN nc * 1000000 // nl ELSE 0 END AS BIGINT)
         AS precision_micro,
       CAST(CASE WHEN ne > 0 THEN nc * 1000000 // ne ELSE 0 END AS BIGINT)
         AS recall_micro
FROM c"""


ORACLES87["docs_lsh_eval"] = _lsh_eval_oracle()


QUERIES87 = {
    "q9_profit": q_q9_profit,
    "docs_lsh_eval": q_docs_lsh_eval,
}
