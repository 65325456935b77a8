"""Driver-contract queries, wave 329 — vocabulary exclusivity per
source (types no other source uses, and the token mass they carry) and
user activity persistence (do first-half-active users stay active in
the second half?). Same contract as queries.py: column names AND dtypes
match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES329: dict[str, str] = {}

_AP_BUCKETS = 64


# ---------------------------------------------------------------------------
# docs_vocab_exclusivity — source-exclusive types and their token mass
# ---------------------------------------------------------------------------


def q_docs_vocab_exclusivity(sf_dir: str):
    """Exclusivity census: per source, how many of its types appear in
    NO other source, and what share of the source's token mass those
    exclusive types carry. Pure integer counting over the wordcount
    exchange. Per source: source, n_types, n_exclusive,
    excl_type_share_micro, excl_token_share_micro."""
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def local_counts(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), r"\s+")
        n_per = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        src = pa.array(
            np.repeat(t["source"].to_numpy(zero_copy_only=False), n_per),
            pa.string(),
        )
        flat = toks.combine_chunks().flatten()
        keep = pc.not_equal(flat, "")
        g = (
            pa.table({"source": src.filter(keep), "token": flat.filter(keep)})
            .group_by(["source", "token"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["source", "token", "pn"])

    counts = (
        ds.map_batches(local_counts, batch_format="pyarrow")
        .groupby(["source", "token"])
        .aggregate(Sum("pn", alias_name="c"))
        .to_pandas()  # vocabulary-bounded
    )
    cols = [
        "source", "n_types", "n_exclusive", "excl_type_share_micro",
        "excl_token_share_micro",
    ]
    empty = pd.DataFrame(
        {
            "source": pd.Series([], dtype=object),
            **{c: pd.Series([], dtype=np.int64) for c in cols[1:]},
        }
    )
    if counts.empty:
        return empty
    n_src_per_tok = counts.groupby("token")["source"].nunique()
    counts = counts.assign(
        excl=(counts["token"].map(n_src_per_tok) == 1).astype(np.int64)
    )
    agg = counts.groupby("source").agg(
        n_types=("token", "size"),
        n_excl=("excl", "sum"),
        tok_total=("c", "sum"),
        tok_excl=("c", lambda s: 0),  # placeholder, filled below
    )
    tok_excl = (
        counts[counts["excl"] == 1].groupby("source")["c"].sum()
    )
    agg["tok_excl"] = tok_excl.reindex(agg.index).fillna(0).astype(np.int64)
    out = agg.reset_index().sort_values("source")
    out["excl_type_share_micro"] = np.floor(
        out["n_excl"].to_numpy(np.float64)
        / out["n_types"].to_numpy(np.float64) * 1_000_000.0 + 0.5
    ).astype(np.int64)
    out["excl_token_share_micro"] = np.floor(
        out["tok_excl"].to_numpy(np.float64)
        / out["tok_total"].to_numpy(np.float64) * 1_000_000.0 + 0.5
    ).astype(np.int64)
    out = out.rename(columns={"n_excl": "n_exclusive"})
    return out.reset_index(drop=True).astype(
        {c: np.int64 for c in cols[1:]}
    )[cols]


ORACLES329["docs_vocab_exclusivity"] = r"""
WITH tok AS (
  SELECT source,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS token
  FROM documents
),
c AS (
  SELECT source, token, CAST(count(*) AS BIGINT) AS c
  FROM tok GROUP BY 1, 2
),
spread AS (
  SELECT token, CAST(count(DISTINCT source) AS BIGINT) AS ns
  FROM c GROUP BY 1
),
agg AS (
  SELECT c.source,
         CAST(count(*) AS BIGINT) AS n_types,
         CAST(sum(CASE WHEN spread.ns = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_exclusive,
         CAST(sum(c.c) AS BIGINT) AS tok_total,
         CAST(sum(CASE WHEN spread.ns = 1 THEN c.c ELSE 0 END) AS BIGINT)
           AS tok_excl
  FROM c JOIN spread USING (token)
  GROUP BY 1
)
SELECT source, n_types, n_exclusive,
       CAST(floor(CAST(n_exclusive AS DOUBLE) / n_types * 1000000.0 + 0.5)
            AS BIGINT) AS excl_type_share_micro,
       CAST(floor(CAST(tok_excl AS DOUBLE) / tok_total * 1000000.0 + 0.5)
            AS BIGINT) AS excl_token_share_micro
FROM agg
ORDER BY source"""


# ---------------------------------------------------------------------------
# users_activity_persistence — first-half vs second-half activity
# ---------------------------------------------------------------------------


def q_users_activity_persistence(sf_dir: str):
    """Persistence: split the window at the midpoint timestamp
    (us midpoint, second half inclusive); per user the (first-half,
    second-half) event counts; Pearson r and the OLS slope of n2 on n1
    over ALL users seen in either half — exact integer moments, float
    composition. One row: n_users, r_micro, slope_micro.

    Scale shape: per-user half-counts ride one user-bucket exchange;
    each bucket emits six scalars."""

    meta = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        .map_batches(
            lambda t: pd.DataFrame(
                {
                    "mn": [np.int64(
                        pa.compute.cast(t["ts"], pa.int64()).to_numpy().min()
                    )],
                    "mx": [np.int64(
                        pa.compute.cast(t["ts"], pa.int64()).to_numpy().max()
                    )],
                }
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    cols = ["n_users", "r_micro", "slope_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if meta.empty:
        return empty
    mid = (int(meta["mn"].min()) + int(meta["mx"].max())) // 2

    def partial(t: pa.Table) -> pd.DataFrame:
        us = pa.compute.cast(t["ts"], pa.int64()).to_numpy()
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = (us >= mid).astype(np.int64)
        g = (
            pd.DataFrame({"u": u, "n1": 1 - h, "n2": h})
            .groupby("u", as_index=False)
            .sum()
        )
        g["_b"] = (g["u"].to_numpy(np.int64) % _AP_BUCKETS).astype(np.int64)
        return g.astype(np.int64)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby("u")[["n1", "n2"]].sum()
        x = per["n1"].to_numpy(np.int64).astype(object)
        y = per["n2"].to_numpy(np.int64).astype(object)
        return pd.DataFrame(
            {
                "n": [np.int64(len(per))],
                "sx": [np.int64(int(x.sum()))],
                "sy": [np.int64(int(y.sum()))],
                "sxx": [np.int64(int((x * x).sum()))],
                "syy": [np.int64(int((y * y).sum()))],
                "sxy": [np.int64(int((x * y).sum()))],
            }
        )

    p = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .sum()
    )
    n = int(p["n"])
    if n < 3:
        return empty
    sx, sy = int(p["sx"]), int(p["sy"])
    sxx, syy, sxy = int(p["sxx"]), int(p["syy"]), int(p["sxy"])
    cx = n * sxx - sx * sx
    cy = n * syy - sy * sy
    cxy = n * sxy - sx * sy
    if cx <= 0 or cy <= 0:
        return empty
    r = float(cxy) / (
        float(np.sqrt(float(cx))) * float(np.sqrt(float(cy)))
    )
    slope = float(cxy) / float(cx)
    return pd.DataFrame(
        [
            (
                np.int64(n),
                np.int64(np.floor(r * 1_000_000.0 + 0.5)),
                np.int64(np.floor(slope * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES329["users_activity_persistence"] = """
WITH span AS (
  SELECT (CAST(min(epoch_us(ts)) AS BIGINT)
          + CAST(max(epoch_us(ts)) AS BIGINT)) // 2 AS mid
  FROM events
),
per AS (
  SELECT user_id,
         CAST(sum(CASE WHEN epoch_us(ts) < span.mid THEN 1 ELSE 0 END)
              AS BIGINT) AS n1,
         CAST(sum(CASE WHEN epoch_us(ts) >= span.mid THEN 1 ELSE 0 END)
              AS BIGINT) AS n2
  FROM events, span GROUP BY 1
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(n1) AS BIGINT) AS sx, CAST(sum(n2) AS BIGINT) AS sy,
         CAST(sum(CAST(n1 AS HUGEINT) * n1) AS HUGEINT) AS sxx,
         CAST(sum(CAST(n2 AS HUGEINT) * n2) AS HUGEINT) AS syy,
         CAST(sum(CAST(n1 AS HUGEINT) * n2) AS HUGEINT) AS sxy
  FROM per
)
SELECT n AS n_users,
       CAST(floor(CAST(CAST(n AS HUGEINT) * sxy
                       - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                  / (sqrt(CAST(CAST(n AS HUGEINT) * sxx
                               - CAST(sx AS HUGEINT) * sx AS DOUBLE))
                     * sqrt(CAST(CAST(n AS HUGEINT) * syy
                                 - CAST(sy AS HUGEINT) * sy AS DOUBLE)))
                  * 1000000.0 + 0.5) AS BIGINT) AS r_micro,
       CAST(floor(CAST(CAST(n AS HUGEINT) * sxy
                       - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                  / CAST(CAST(n AS HUGEINT) * sxx
                         - CAST(sx AS HUGEINT) * sx AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS slope_micro
FROM m
WHERE n >= 3
  AND (CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx) > 0
  AND (CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy) > 0"""


QUERIES329 = {
    "docs_vocab_exclusivity": q_docs_vocab_exclusivity,
    "users_activity_persistence": q_users_activity_persistence,
}
