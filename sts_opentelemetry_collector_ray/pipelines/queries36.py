"""Driver-contract queries, wave 36 — TPC-H Q5-shaped six-table join (local
supplier volume: the cyclic join graph with a same-nation equality between two
fact-side dimensions) and c-TF-IDF top terms per embedding label (the BERTopic
class-based TF-IDF topic-description recipe). Same contract as queries.py:
column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES36: dict[str, str] = {}

_Q5_LO = "1996-01-01"
_Q5_HI = "1998-01-01"
_CTFIDF_TOPK = 3


# ---------------------------------------------------------------------------
# q5_local_supplier — TPC-H Q5 shape over 6 tables
# ---------------------------------------------------------------------------


def q_q5_local_supplier(sf_dir: str):
    """TPC-H Q5 shape (local supplier volume): customer ⋈ orders ⋈ lineitem ⋈
    supplier with the cyclic s_nationkey = c_nationkey condition, rolled up to
    region. The two corpus-sized joins are native hash joins with both sides
    filtered + column-pruned BEFORE the shuffle (the q3_shipping discipline);
    supplier/nation/region are dimension-sized and broadcast ONCE as sorted
    arrays resolved with searchsorted inside one map_batches (the star_flatten
    discipline — at a scale where supplier outgrows broadcast it becomes a
    third native join). Revenue accumulates in EXACT integer 10⁻⁴-dollars.
    Output: r_name, revenue4 (BIGINT), n_items (BIGINT)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    # dimension broadcast: suppkey→nationkey, nationkey→(region name)
    sup = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    sup_keys = sup["s_suppkey"].to_numpy()
    sup_nat = sup["s_nationkey"].to_numpy().astype(np.int64)
    so = np.argsort(sup_keys)
    sup_keys, sup_nat = sup_keys[so], sup_nat[so]

    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    )
    reg = pq.read_table(f"{sf_dir}/region.parquet")
    nat_keys = nat["n_nationkey"].to_numpy().astype(np.int64)
    nat_reg = nat["n_regionkey"].to_numpy().astype(np.int64)
    no = np.argsort(nat_keys)
    nat_keys, nat_reg = nat_keys[no], nat_reg[no]
    reg_keys = reg["r_regionkey"].to_numpy().astype(np.int64)
    reg_names = np.asarray(reg["r_name"].to_pylist(), dtype=object)
    ro = np.argsort(reg_keys)
    reg_keys, reg_names = reg_keys[ro], reg_names[ro]

    lo = np.datetime64(_Q5_LO, "us")
    hi = np.datetime64(_Q5_HI, "us")

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: t.filter(
            pa.array(
                (t["o_orderdate"].to_numpy(zero_copy_only=False) >= lo)
                & (t["o_orderdate"].to_numpy(zero_copy_only=False) < hi)
            )
        ).select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow",
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )

    def li_prep(t: pa.Table) -> pa.Table:
        ep = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        dc = np.floor(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_suppkey": t["l_suppkey"],
                "rev4": pa.array(ep * (100 - dc), pa.int64()),
            }
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(li_prep, batch_format="pyarrow")

    oc = orders.join(
        cust,
        join_type="inner",
        num_partitions=8,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )
    j = li.join(
        oc,
        join_type="inner",
        num_partitions=8,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def region_partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "r_name": pa.array([], pa.string()),
                    "rev4": pa.array([], pa.int64()),
                    "n_items": pa.array([], pa.int64()),
                }
            )
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False)
        cn = t["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sn = sup_nat[np.searchsorted(sup_keys, sk)]
        keep = sn == cn  # the Q5 cyclic same-nation condition
        rev = t["rev4"].to_numpy(zero_copy_only=False)[keep]
        nk = cn[keep]
        rname = reg_names[np.searchsorted(reg_keys, nat_reg[np.searchsorted(nat_keys, nk)])]
        if not len(rname):
            return pa.table(
                {
                    "r_name": pa.array([], pa.string()),
                    "rev4": pa.array([], pa.int64()),
                    "n_items": pa.array([], pa.int64()),
                }
            )
        df = pd.DataFrame({"r_name": rname, "rev4": rev})
        out = (
            df.groupby("r_name", sort=False)
            .agg(rev4=("rev4", "sum"), n_items=("rev4", "size"))
            .reset_index()
        )
        out["rev4"] = out["rev4"].astype(np.int64)
        out["n_items"] = out["n_items"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
            None
        )

    parts = j.map_batches(region_partial, batch_format="pyarrow").to_pandas()
    final = (
        parts.groupby("r_name")
        .agg(revenue4=("rev4", "sum"), n_items=("n_items", "sum"))
        .reset_index()
        .sort_values("r_name")
        .reset_index(drop=True)
    )
    final["revenue4"] = final["revenue4"].astype(np.int64)
    final["n_items"] = final["n_items"].astype(np.int64)
    return final


ORACLES36["q5_local_supplier"] = f"""
SELECT r_name,
       CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
            AS BIGINT) AS revenue4,
       count(*) AS n_items
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
 AND o.o_orderdate >= TIMESTAMP '{_Q5_LO}' AND o.o_orderdate < TIMESTAMP '{_Q5_HI}'
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY r_name"""


# ---------------------------------------------------------------------------
# docs_ctfidf_terms — class-based TF-IDF topic terms per embedding label
# ---------------------------------------------------------------------------


def q_docs_ctfidf_terms(sf_dir: str):
    """c-TF-IDF topic descriptions (Grootendorst 2022, the BERTopic recipe):
    documents join their embedding labels, per-(label, token) counts roll up,
    and each term scores tf_{t,c} · ln(1 + A / f_t) with A = mean tokens per
    class and f_t the corpus frequency; top-3 terms per label.

    One native hash join (both sides column-pruned), then per-batch
    (label, token) count partials — the exchange carries distinct pairs
    (vocabulary-bounded), never token streams; the scoring/top-k runs on the
    bounded labels×vocab grid. Ties break by term ASC on both sides."""
    import pyarrow.compute as pc

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    labs = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label"]
    )
    j = docs.join(
        labs,
        join_type="inner",
        num_partitions=8,
        on=("doc_id",),
        right_on=("vec_id",),
    )

    def pair_counts(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "label": pa.array([], pa.int64()),
                    "term": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        toks = pc.split_pattern(pc.fill_null(t["text"], ""), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        n_per = pc.list_value_length(toks).to_numpy().astype(np.int64)
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        flat = toks.flatten().to_pandas().to_numpy(dtype=object)
        lab_rep = np.repeat(lab, n_per)
        df = pd.DataFrame({"label": lab_rep, "term": flat})
        out = df.groupby(["label", "term"], sort=False).size().rename("cnt").reset_index()
        out["cnt"] = out["cnt"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
            None
        )

    counts = (
        j.map_batches(pair_counts, batch_format="pyarrow")
        .to_pandas()  # bounded: ≤ labels×vocab rows per block
        .groupby(["label", "term"])["cnt"]
        .sum()
        .reset_index()
    )
    f_t = counts.groupby("term")["cnt"].sum()  # corpus term frequency
    n_labels = counts["label"].nunique()
    total = counts["cnt"].sum()
    A = float(total) / float(n_labels)  # mean tokens per class

    counts["score"] = counts["cnt"].to_numpy().astype(np.float64) * np.log(
        1.0 + A / f_t.loc[counts["term"]].to_numpy().astype(np.float64)
    )
    counts = counts.sort_values(
        ["label", "score", "term"], ascending=[True, False, True], kind="mergesort"
    )
    top = counts.groupby("label").head(_CTFIDF_TOPK).reset_index(drop=True)
    return pd.DataFrame(
        {
            "label": top["label"].astype(np.int64),
            "term": top["term"],
            "score_micro": np.floor(top["score"].to_numpy() * 1e6 + 0.5).astype(
                np.int64
            ),
        }
    )


ORACLES36["docs_ctfidf_terms"] = f"""
WITH joined AS (
  SELECT e.label, d.text FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
),
toks AS (
  SELECT label, UNNEST(string_split(coalesce(text, ''), ' ')) AS term FROM joined
),
cnts AS (
  SELECT CAST(label AS BIGINT) AS label, term, CAST(count(*) AS BIGINT) AS cnt
  FROM toks GROUP BY 1, 2
),
ft AS (SELECT term, CAST(SUM(cnt) AS BIGINT) AS f FROM cnts GROUP BY term),
consts AS (
  SELECT CAST(SUM(cnt) AS DOUBLE) / CAST(count(DISTINCT label) AS DOUBLE) AS a
  FROM cnts
),
scored AS (
  SELECT c.label, c.term,
         CAST(c.cnt AS DOUBLE) * ln(1.0 + consts.a / CAST(ft.f AS DOUBLE)) AS score
  FROM cnts c JOIN ft USING (term) CROSS JOIN consts
),
ranked AS (
  SELECT label, term, score,
         row_number() OVER (PARTITION BY label ORDER BY score DESC, term ASC) AS r
  FROM scored
)
SELECT label, term,
       CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS score_micro
FROM ranked WHERE r <= {_CTFIDF_TOPK}"""


QUERIES36 = {
    "q5_local_supplier": q_q5_local_supplier,
    "docs_ctfidf_terms": q_docs_ctfidf_terms,
}
