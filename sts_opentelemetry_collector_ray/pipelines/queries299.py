"""Driver-contract queries, wave 299 — the classic length-corrected
lexical richness indices (Herdan's C, Guiraud's R, Maas a^2) per source
and Jain's fairness index of per-user event load (the networking
fairness classic). Same contract as queries.py: column names AND dtypes
match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES299: dict[str, str] = {}

_JF_BUCKETS = 64


# ---------------------------------------------------------------------------
# docs_lexical_indices — Herdan / Guiraud / Maas per source
# ---------------------------------------------------------------------------


def q_docs_lexical_indices(sf_dir: str):
    """Length-corrected lexical richness per source over the docs_vocab
    tokenizer: Herdan's C = ln V / ln N, Guiraud's R = V / sqrt(N), and
    Maas a^2 = (ln N - ln V) / (ln N)^2 (LOWER = richer for Maas). V
    and N are exact integers; three float compositions. Per source:
    source, n_tokens, n_types, herdan_micro, guiraud_micro, maas_micro.

    Scale shape: the `docs_yule_k` wordcount exchange; the driver folds
    |sources| x 2 scalars."""
    import pyarrow.compute as pc
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
    )

    def fold(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "source": t["source"].to_numpy(zero_copy_only=False),
                "c": t["c"].to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )
        g = df.groupby("source")["c"].agg(n_tokens="sum", n_types="size")
        return g.reset_index().astype(
            {"n_tokens": np.int64, "n_types": np.int64}
        )

    m = (
        counts.map_batches(fold, batch_format="pyarrow")
        .to_pandas()
        .groupby("source")[["n_tokens", "n_types"]]
        .sum()
        .sort_index()
    )
    cols = [
        "source", "n_tokens", "n_types", "herdan_micro", "guiraud_micro",
        "maas_micro",
    ]
    empty = pd.DataFrame(
        {
            "source": pd.Series([], dtype=object),
            **{c: pd.Series([], dtype=np.int64) for c in cols[1:]},
        }
    )
    if m.empty:
        return empty
    rows = []
    for source, r in m.iterrows():
        n, v = int(r["n_tokens"]), int(r["n_types"])
        if n < 2 or v < 1:
            continue
        ln_n, ln_v = float(np.log(float(n))), float(np.log(float(v)))
        herdan = ln_v / ln_n
        guiraud = float(v) / float(np.sqrt(float(n)))
        maas = (ln_n - ln_v) / (ln_n * ln_n)
        rows.append(
            (
                source, np.int64(n), np.int64(v),
                np.int64(np.floor(herdan * 1_000_000.0 + 0.5)),
                np.int64(np.floor(guiraud * 1_000_000.0 + 0.5)),
                np.int64(np.floor(maas * 1_000_000.0 + 0.5)),
            )
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols[1:]}
    )


ORACLES299["docs_lexical_indices"] = r"""
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
agg AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS v
  FROM c GROUP BY 1
)
SELECT source, n AS n_tokens, v AS n_types,
       CAST(floor(ln(CAST(v AS DOUBLE)) / ln(CAST(n AS DOUBLE))
                  * 1000000.0 + 0.5) AS BIGINT) AS herdan_micro,
       CAST(floor(CAST(v AS DOUBLE) / sqrt(CAST(n AS DOUBLE))
                  * 1000000.0 + 0.5) AS BIGINT) AS guiraud_micro,
       CAST(floor((ln(CAST(n AS DOUBLE)) - ln(CAST(v AS DOUBLE)))
                  / (ln(CAST(n AS DOUBLE)) * ln(CAST(n AS DOUBLE)))
                  * 1000000.0 + 0.5) AS BIGINT) AS maas_micro
FROM agg
WHERE n >= 2 AND v >= 1
ORDER BY source"""


# ---------------------------------------------------------------------------
# users_jain_fairness — Jain's index of per-user load
# ---------------------------------------------------------------------------


def q_users_jain_fairness(sf_dir: str):
    """Jain's fairness index of per-user event load:
    J = (sum x)^2 / (n sum x^2) in (1/n, 1] — 1 means perfectly even
    load, 1/n means one user has everything. Exact integer moments, one
    division; also reports the 'effective user count' n_eff = J n. One
    row: n_users, sum_events, jain_micro, n_eff_milli.

    Scale shape: the `users_nb_vs_poisson` bucketed count reduce; each
    bucket emits (n, sum, sum of squares) scalars."""

    def partial(t: pa.Table) -> pd.DataFrame:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = pd.Series(u).groupby(u).size()
        out = pd.DataFrame(
            {"u": g.index.to_numpy(np.int64), "k": g.to_numpy(np.int64)}
        )
        out["_b"] = (out["u"] % _JF_BUCKETS).astype(np.int64)
        return out

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby("u")["k"].sum()
        k = per.to_numpy(np.int64).astype(object)
        return pd.DataFrame(
            {
                "n": [np.int64(len(per))],
                "s": [np.int64(int(k.sum()))],
                "s2": [np.int64(int((k * k).sum()))],
            }
        )

    parts = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .sum()
    )
    cols = ["n_users", "sum_events", "jain_micro", "n_eff_milli"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if parts.empty:
        return empty
    n, s, s2 = int(parts["n"]), int(parts["s"]), int(parts["s2"])
    if n == 0 or s2 == 0:
        return empty
    j = float(s) * float(s) / (float(n) * float(s2))
    return pd.DataFrame(
        [
            (
                np.int64(n), np.int64(s),
                np.int64(np.floor(j * 1_000_000.0 + 0.5)),
                np.int64(np.floor(j * float(n) * 1_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES299["users_jain_fairness"] = """
WITH per AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS k
  FROM events GROUP BY 1
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(k) AS BIGINT) AS s,
         CAST(sum(CAST(k AS HUGEINT) * k) AS HUGEINT) AS s2
  FROM per
)
SELECT n AS n_users, s AS sum_events,
       CAST(floor(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                  / (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE))
                  * 1000000.0 + 0.5) AS BIGINT) AS jain_micro,
       CAST(floor(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                  / (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE))
                  * CAST(n AS DOUBLE) * 1000.0 + 0.5) AS BIGINT)
         AS n_eff_milli
FROM m
WHERE n > 0 AND s2 > 0"""


QUERIES299 = {
    "docs_lexical_indices": q_docs_lexical_indices,
    "users_jain_fairness": q_users_jain_fairness,
}
