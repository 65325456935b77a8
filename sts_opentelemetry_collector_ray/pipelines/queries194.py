"""Driver-contract queries, wave 194 — b-bit MinHash resemblance estimation
(Li & Konig 2010: 1-bit signatures, estimate 2·agree − 1) compared against
the full-signature estimate, and binned 1D Wasserstein (earth mover's)
distance between each market segment's order-value distribution and the
global one. Same contract as queries.py: column names AND dtypes match the
DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

ORACLES194: dict[str, str] = {}

_BB_DOCS = 200  # small-N baseline scope (mirrors docs_ngram_jaccard)
_BB_THRESHOLD = 0.3
_EMD_BINS = 20
_EMD_WIDTH = 30_000.0


# ---------------------------------------------------------------------------
# docs_bbit_minhash — 1-bit minhash resemblance vs full signatures
# ---------------------------------------------------------------------------


def q_docs_bbit_minhash(sf_dir: str):
    """For all pairs among the first 200 docs (the documented small-N
    validation scope, like docs_ngram_jaccard): the FULL 64-permutation
    signature agreement estimate and the 1-bit estimate 2·agree₁ − 1
    (Li & Konig 2010, b = 1 ⇒ random-collision C = ½), both micro; pairs
    with full estimate ≥ 0.3, ORDER BY a, b.

    Scale note: the all-pairs step is the labeled baseline; the scale path
    is the banded minhash_lsh_pairs. Signatures are whole-batch vectorized
    (stages/dedup_docs.py::_minhash_signatures)."""
    from ..stages.dedup_docs import _minhash_signatures, _perm_params

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    t = t.slice(0, _BB_DOCS)
    ds = ray.data.from_arrow(t.replace_schema_metadata(None))
    a_par, b_par = _perm_params(64)

    def all_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id", kind="mergesort")
        ids = df["doc_id"].to_numpy(np.int64)
        sig = _minhash_signatures(df["text"].to_numpy(object), a_par, b_par, 5)
        bits = (sig & np.uint64(1)).astype(np.uint8)
        out = []
        for i in range(len(ids) - 1):
            full = (sig[i + 1 :] == sig[i]).mean(axis=1)
            bit = (bits[i + 1 :] == bits[i]).mean(axis=1)
            keep = np.nonzero(full >= _BB_THRESHOLD)[0]
            for off in keep:
                out.append(
                    (
                        int(ids[i]),
                        int(ids[i + 1 + off]),
                        int(np.floor(full[off] * 1_000_000.0 + 0.5)),
                        int(
                            np.floor(
                                (2.0 * bit[off] - 1.0) * 1_000_000.0 + 0.5
                            )
                        ),
                    )
                )
        return pd.DataFrame(
            out, columns=["a", "b", "est_full_micro", "est_1bit_micro"]
        ).astype(np.int64)

    part = ds.repartition(1).map_batches(
        all_pairs, batch_format="pandas", batch_size=_BB_DOCS
    ).to_pandas()
    if part.empty:
        return pd.DataFrame(
            {c: pd.Series([], dtype=np.int64)
             for c in ["a", "b", "est_full_micro", "est_1bit_micro"]}
        )
    return part.sort_values(["a", "b"], kind="mergesort").reset_index(drop=True)


def _bbit_oracle() -> str:
    from ..stages.dedup_docs import _perm_params

    a_par, b_par = _perm_params(64)
    pa_sql = ", ".join(f"CAST({int(v)} AS HUGEINT)" for v in a_par)
    pb_sql = ", ".join(f"CAST({int(v)} AS HUGEINT)" for v in b_par)
    w = 1 << 64
    m = (1 << 61) - 1
    fnv5 = "CAST(14695981039346656037 AS HUGEINT)"
    for i in range(1, 6):
        fnv5 = (
            f"(xor({fnv5}, CAST(unicode(substring(g, {i}, 1)) AS HUGEINT))"
            f" * 1099511628211) % {w}"
        )
    return f"""
WITH lim AS (
  SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT {_BB_DOCS}
),
docs0 AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS s
  FROM lim
),
sh AS (
  SELECT doc_id,
         unnest(CASE WHEN length(s) = 0 THEN []::VARCHAR[]
                     WHEN length(s) < 5 THEN [s]
                     ELSE list_transform(range(length(s) - 4),
                          i -> substring(s, CAST(i AS INT) + 1, 5)) END) AS g
  FROM docs0
),
hh AS (
  SELECT doc_id,
         CASE WHEN length(g) = 5 THEN {fnv5}
              ELSE list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT),
                list_transform(string_split(g, ''), c -> CAST(unicode(c) AS HUGEINT))),
                (acc, x) -> (xor(acc, x) * 1099511628211) % {w}) END AS hv
  FROM sh
),
perms AS (SELECT unnest(range(64)) AS perm,
                 unnest([{pa_sql}]) AS pa, unnest([{pb_sql}]) AS pb),
hd AS MATERIALIZED (SELECT DISTINCT doc_id, hv FROM hh),
sig0 AS (
  SELECT doc_id, perm, MIN((((hv * pa) % {w}) + pb) % {w} % {m}) AS mh
  FROM hd CROSS JOIN perms GROUP BY doc_id, perm
),
sigfull AS (
  SELECT d.doc_id, p.perm, coalesce(s.mh, CAST({m} AS HUGEINT)) AS mh
  FROM (SELECT doc_id FROM lim) d
  CROSS JOIN perms p
  LEFT JOIN sig0 s ON s.doc_id = d.doc_id AND s.perm = p.perm
),
pairs AS (
  SELECT x.doc_id AS a, y.doc_id AS b,
         avg(CASE WHEN x.mh = y.mh THEN 1.0 ELSE 0.0 END) AS agree_full,
         avg(CASE WHEN x.mh % 2 = y.mh % 2 THEN 1.0 ELSE 0.0 END) AS agree_bit
  FROM sigfull x JOIN sigfull y ON x.perm = y.perm AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       CAST(floor(agree_full * 1000000.0 + 0.5) AS BIGINT) AS est_full_micro,
       CAST(floor((2.0 * agree_bit - 1.0) * 1000000.0 + 0.5) AS BIGINT)
         AS est_1bit_micro
FROM pairs WHERE agree_full >= {_BB_THRESHOLD} ORDER BY a, b"""


ORACLES194["docs_bbit_minhash"] = _bbit_oracle()


# ---------------------------------------------------------------------------
# orders_emd_by_segment — binned Wasserstein-1 vs the global distribution
# ---------------------------------------------------------------------------


def q_orders_emd_by_segment(sf_dir: str):
    """Per market segment: binned 1D Wasserstein distance between the
    segment's order-value distribution and the GLOBAL one — 20 fixed
    30 000-wide bins (top bin open), W₁ = Σ|CDF_seg − CDF_all|·width.
    Output: c_mktsegment, n_orders, emd_micro.

    Scale shape: the customer→segment map is dimension-sized and broadcast
    into a per-batch (segment, bin, n) combiner; the driver folds the
    bounded |segments|×|bins| grid — no shuffle (J4-style broadcast join,
    stages/enrich.py)."""
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    ckeys = np.asarray(cust["c_custkey"].to_numpy(zero_copy_only=False), np.int64)
    csegs = np.asarray(cust["c_mktsegment"].to_numpy(zero_copy_only=False), object)
    order = np.argsort(ckeys)
    ckeys, csegs = ckeys[order], csegs[order]

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["o_custkey", "o_totalprice"]).to_pandas()
        seg = csegs[np.searchsorted(ckeys, df["o_custkey"].to_numpy(np.int64))]
        b = np.minimum(
            (df["o_totalprice"].to_numpy(np.float64) // _EMD_WIDTH).astype(np.int64),
            _EMD_BINS - 1,
        )
        return (
            pd.DataFrame({"seg": seg, "bin": b, "n": 1})
            .groupby(["seg", "bin"], sort=False, as_index=False)
            .sum()
            .astype({"n": np.int64})
        )

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["c_mktsegment", "n_orders", "emd_micro"]
    if part.empty:
        return pd.DataFrame(
            {
                "c_mktsegment": pd.Series([], dtype=object),
                "n_orders": pd.Series([], dtype=np.int64),
                "emd_micro": pd.Series([], dtype=np.int64),
            }
        )
    g = part.groupby(["seg", "bin"])["n"].sum()
    segs = sorted(g.index.get_level_values(0).unique())
    grid = np.zeros((len(segs), _EMD_BINS), np.int64)
    for i, s in enumerate(segs):
        sub = g.loc[s]
        grid[i, sub.index.to_numpy(np.int64)] = sub.to_numpy(np.int64)
    tot = grid.sum(axis=0)
    n_all = float(tot.sum())
    cdf_all = np.cumsum(tot.astype(np.float64) / n_all)
    rows = []
    for i, s in enumerate(segs):
        n_s = float(grid[i].sum())
        cdf_s = np.cumsum(grid[i].astype(np.float64) / n_s)
        emd = float(np.abs(cdf_s - cdf_all).sum() * _EMD_WIDTH)
        rows.append(
            (s, np.int64(grid[i].sum()),
             np.int64(np.floor(emd * 1_000_000.0 + 0.5)))
        )
    return pd.DataFrame(rows, columns=cols).astype(
        {"n_orders": np.int64, "emd_micro": np.int64}
    )


ORACLES194["orders_emd_by_segment"] = f"""
WITH o AS (
  SELECT c.c_mktsegment AS seg,
         least(CAST(floor(o_totalprice / {_EMD_WIDTH}) AS BIGINT), {_EMD_BINS - 1}) AS bin
  FROM orders JOIN customer c ON o_custkey = c.c_custkey
),
grid AS (
  SELECT s.seg, b.range AS bin FROM (SELECT DISTINCT seg FROM o) s,
       range({_EMD_BINS}) b
),
cnt AS (
  SELECT grid.seg, grid.bin,
         CAST(coalesce(x.n, 0) AS BIGINT) AS n
  FROM grid LEFT JOIN (
    SELECT seg, bin, count(*) AS n FROM o GROUP BY 1, 2
  ) x ON grid.seg = x.seg AND grid.bin = x.bin
),
tot AS (SELECT bin, sum(n) AS nt FROM cnt GROUP BY 1),
gl AS (SELECT sum(n) AS n_all FROM cnt),
sg AS (SELECT seg, sum(n) AS n_seg FROM cnt GROUP BY 1),
cdf AS (
  SELECT cnt.seg, cnt.bin,
         sum(CAST(cnt.n AS DOUBLE) / sg.n_seg)
           OVER (PARTITION BY cnt.seg ORDER BY cnt.bin) AS cs,
         sum(CAST(tot.nt AS DOUBLE) / gl.n_all)
           OVER (PARTITION BY cnt.seg ORDER BY cnt.bin) AS ca
  FROM cnt JOIN tot ON cnt.bin = tot.bin
  JOIN sg ON cnt.seg = sg.seg, gl
)
SELECT seg AS c_mktsegment,
       (SELECT CAST(sg2.n_seg AS BIGINT) FROM sg sg2 WHERE sg2.seg = cdf.seg)
         AS n_orders,
       CAST(floor(sum(abs(cs - ca)) * {_EMD_WIDTH} * 1000000.0 + 0.5) AS BIGINT)
         AS emd_micro
FROM cdf GROUP BY seg ORDER BY seg"""


QUERIES194 = {
    "docs_bbit_minhash": q_docs_bbit_minhash,
    "orders_emd_by_segment": q_orders_emd_by_segment,
}
