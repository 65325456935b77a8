"""Driver-contract queries, wave 168 — supplier balance-vs-volume
correlation (does account balance track shipped line volume? exact-integer
Pearson over per-supplier aggregates) and conversation echo rate (Jaccard of
user vs assistant word sets per conversation — the parroting diagnostic for
assistant-quality screens). Same contract as queries.py: column names AND
dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES168: dict[str, str] = {}


# ---------------------------------------------------------------------------
# supplier_balance_vs_volume — Pearson(acctbal cents, line count)
# ---------------------------------------------------------------------------


def q_supplier_balance_vs_volume(sf_dir: str):
    """One row: suppliers with >= 1 line item, and the exact-integer Pearson
    (micro units) between account balance cents and shipped line count.
    Suppliers with no lines are absent on both engines (inner semantics).

    Scale shape: per-batch (supplier, n) combiner, ONE supplier-bucket
    exchange completes counts; the supplier→balance map broadcasts via
    ``ray.put`` (bounded dimension), per-bucket bigint moment partials fold
    on the driver; ONE shared double finish."""
    import pyarrow.parquet as pq_mod

    sup = pq_mod.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_acctbal"]
    )
    sk = sup["s_suppkey"].to_numpy()
    order = np.argsort(sk)
    bal_cents = np.floor(
        sup["s_acctbal"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
    ).astype(np.int64)
    ref = ray.put((sk[order], bal_cents[order]))

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_suppkey"]
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        g = (
            pd.DataFrame(
                {
                    "s": t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64),
                    "n": 1,
                }
            )
            .groupby("s", sort=False, as_index=False)["n"]
            .sum()
        )
        g["_b"] = (g["s"].to_numpy(np.int64).astype(np.uint64) % np.uint64(64)).astype(
            np.int64
        )
        return g.astype({"n": np.int64})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        keys, bals = ray.get(ref)
        tot = g.groupby("s", sort=False, as_index=False)["n"].sum()
        idx = np.searchsorted(keys, tot["s"].to_numpy(np.int64))
        idx = np.minimum(idx, len(keys) - 1)
        x = bals[idx]  # balance cents
        y = tot["n"].to_numpy(np.int64)  # line count
        xo, yo = x.astype(object), y.astype(object)
        return pd.DataFrame(
            {
                "n": [np.int64(len(tot))],
                "sx": [int((xo).sum())],
                "sy": [int(yo.sum())],
                "sxx": [int((xo * xo).sum())],
                "syy": [int((yo * yo).sum())],
                "sxy": [int((xo * yo).sum())],
            }
        )

    part = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: one moment row per bucket
    )
    empty = pd.DataFrame(
        {
            "n_suppliers": pd.Series([], dtype=np.int64),
            "pearson_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty or "n" not in part.columns:
        return empty
    n = int(part["n"].sum())
    if n < 2:
        return empty
    sx = sum(int(v) for v in part["sx"])
    sy = sum(int(v) for v in part["sy"])
    sxx = sum(int(v) for v in part["sxx"])
    syy = sum(int(v) for v in part["syy"])
    sxy = sum(int(v) for v in part["sxy"])
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    if vx <= 0 or vy <= 0:
        return empty
    r = float(n * sxy - sx * sy) / (np.sqrt(float(vx)) * np.sqrt(float(vy)))
    return pd.DataFrame(
        {
            "n_suppliers": [np.int64(n)],
            "pearson_micro": [np.int64(np.floor(r * 1_000_000.0 + 0.5))],
        }
    )


ORACLES168["supplier_balance_vs_volume"] = """
WITH v AS (
  SELECT l_suppkey AS s, CAST(count(*) AS HUGEINT) AS y
  FROM lineitem GROUP BY 1
),
j AS (
  SELECT CAST(floor(sup.s_acctbal * 100.0 + 0.5) AS HUGEINT) AS x, v.y
  FROM v JOIN supplier sup ON sup.s_suppkey = v.s
),
m AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
  FROM j
)
SELECT CAST(n AS BIGINT) AS n_suppliers,
       CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
                  / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                     * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
                  * 1000000.0 + 0.5) AS BIGINT) AS pearson_micro
FROM m
WHERE n >= 2 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0"""


# ---------------------------------------------------------------------------
# conv_echo_rate — Jaccard of user vs assistant word sets per conversation
# ---------------------------------------------------------------------------


def q_conv_echo_rate(sf_dir: str):
    """Per conversation with BOTH user and assistant text: distinct word
    counts per side and their Jaccard overlap in micro units — high echo
    means the assistant parrots the user. Tokenization matches docs_vocab.

    Scale shape: per-batch distinct (conv, role, word) triples ride ONE
    conv-bucket exchange; per-bucket set sizes + one self-merge intersection
    per conversation (the users_week_stability pattern) emit one row per
    qualifying conversation."""
    from ..sources.transcripts import derive_transcripts_from_events
    from ..functions.hashing import fnv1a64_array

    ds = derive_transcripts_from_events(sf_dir)

    def partial(t: pa.Table) -> pd.DataFrame:
        role = np.asarray(t["role"].to_numpy(zero_copy_only=False))
        keep = (role == "user") | (role == "assistant")
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t["text"]), r"\s+"
        ).combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = np.asarray(toks.flatten().to_numpy(zero_copy_only=False))
        conv = np.repeat(
            np.asarray(t["conv_id"].to_numpy(zero_copy_only=False)), lens
        )
        rrole = np.repeat(role, lens)
        kexp = np.repeat(keep, lens) & (flat != "")
        df = pd.DataFrame(
            {"conv": conv[kexp], "role": rrole[kexp], "w": flat[kexp]}
        ).drop_duplicates()
        df["_b"] = (
            fnv1a64_array(df["conv"].to_numpy(object)) % np.uint64(64)
        ).astype(np.int64)
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "conv_id": pd.Series([], dtype=object),
                "n_user_words": pd.Series([], dtype=np.int64),
                "n_assistant_words": pd.Series([], dtype=np.int64),
                "jaccard_micro": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        gg = g.drop_duplicates(["conv", "role", "w"])
        u = gg[gg["role"] == "user"]
        a = gg[gg["role"] == "assistant"]
        nu = u.groupby("conv", sort=False).size()
        na = a.groupby("conv", sort=False).size()
        inter = (
            u.merge(a, on=["conv", "w"]).groupby("conv", sort=False).size()
        )
        convs = nu.index.intersection(na.index)
        if len(convs) == 0:
            return empty
        nu_v = nu.reindex(convs).to_numpy(np.int64)
        na_v = na.reindex(convs).to_numpy(np.int64)
        iv = inter.reindex(convs).fillna(0).to_numpy(np.int64)
        union = nu_v + na_v - iv
        micro = np.floor(
            iv.astype(np.float64) / union.astype(np.float64) * 1_000_000.0 + 0.5
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "conv_id": convs.to_numpy(object),
                "n_user_words": nu_v,
                "n_assistant_words": na_v,
                "jaccard_micro": micro,
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
    )


def _echo_rate_oracle() -> str:
    from ..sources.transcripts import TRANSCRIPTS_FROM_EVENTS_SQL

    return (
        TRANSCRIPTS_FROM_EVENTS_SQL
        + r""",
w AS (
  SELECT DISTINCT conv_id, role,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS w
  FROM transcripts WHERE role IN ('user', 'assistant')
),
sz AS (
  SELECT conv_id,
         CAST(count(*) FILTER (role = 'user') AS BIGINT) AS nu,
         CAST(count(*) FILTER (role = 'assistant') AS BIGINT) AS na
  FROM (SELECT DISTINCT conv_id, role, w FROM w) GROUP BY 1
),
iv AS (
  SELECT a.conv_id, CAST(count(DISTINCT a.w) AS BIGINT) AS ni
  FROM w a JOIN w b ON a.conv_id = b.conv_id AND a.w = b.w
  WHERE a.role = 'user' AND b.role = 'assistant'
  GROUP BY 1
)
SELECT sz.conv_id,
       sz.nu AS n_user_words,
       sz.na AS n_assistant_words,
       CAST(floor(CAST(coalesce(iv.ni, 0) AS DOUBLE)
                  / CAST(sz.nu + sz.na - coalesce(iv.ni, 0) AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS jaccard_micro
FROM sz LEFT JOIN iv USING (conv_id)
WHERE sz.nu > 0 AND sz.na > 0"""
    )


ORACLES168["conv_echo_rate"] = _echo_rate_oracle()


QUERIES168 = {
    "supplier_balance_vs_volume": q_supplier_balance_vs_volume,
    "conv_echo_rate": q_conv_echo_rate,
}
