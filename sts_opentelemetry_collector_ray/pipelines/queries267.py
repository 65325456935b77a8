"""Driver-contract queries, wave 267 — Yule's characteristic K (lexical
richness from the squared type-frequency sum) per document source, and
the partial correlation of the two busiest event types' daily series
controlling for the third. Same contract as queries.py: column names
AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES267: dict[str, str] = {}

_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# docs_yule_k — Yule's characteristic K per source
# ---------------------------------------------------------------------------


def q_docs_yule_k(sf_dir: str):
    """Yule's K per source: K = 10^4 (sum_w c_w^2 - N) / N^2 over the
    lowercase whitespace vocabulary (the `docs_vocab` tokenizer). The
    repeat-rate core sum_w c_w^2 and N are EXACT integers; K is one
    division. Per source: source, n_tokens, n_types, sum_c2, yule_micro.

    Scale shape: per-batch (source, token) combiner -> Ray hash
    aggregate over (source, token) (the `docs_vocab` wordcount
    exchange) -> per-batch squared-sum partials -> a |sources|-bounded
    driver fold. Corpus text never reaches the driver."""
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

    counts = ds.map_batches(local_counts, batch_format="pyarrow").groupby(
        ["source", "token"]
    ).aggregate(Sum("pn", alias_name="c"))

    def square_fold(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "source": t["source"].to_numpy(zero_copy_only=False),
                "c": t["c"].to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )
        g = df.groupby("source")["c"].agg(
            n_tokens="sum", n_types="size", sum_c2=lambda s: int((s * s).sum())
        )
        return pa.Table.from_pandas(
            g.reset_index(), preserve_index=False
        ).replace_schema_metadata(None)

    parts = (
        counts.map_batches(square_fold, batch_format="pyarrow")
        .to_pandas()  # bounded: |sources| x |blocks|
        .groupby("source")[["n_tokens", "n_types", "sum_c2"]]
        .sum()
        .reset_index()
    )
    cols = ["source", "n_tokens", "n_types", "sum_c2", "yule_micro"]
    if parts.empty:
        return pd.DataFrame(
            {
                "source": pd.Series([], dtype=object),
                **{c: pd.Series([], dtype=np.int64) for c in cols[1:]},
            }
        )
    n = parts["n_tokens"].to_numpy(np.int64)
    c2 = parts["sum_c2"].to_numpy(np.int64)
    k = (
        10000.0
        * (c2.astype(np.float64) - n.astype(np.float64))
        / (n.astype(np.float64) * n.astype(np.float64))
    )
    parts["yule_micro"] = np.floor(k * 1_000_000.0 + 0.5).astype(np.int64)
    parts = parts.astype({c: np.int64 for c in cols[1:]})
    return parts.sort_values("source").reset_index(drop=True)[cols]


ORACLES267["docs_yule_k"] = r"""
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
  SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_types,
         CAST(sum(c * c) AS BIGINT) AS sum_c2
  FROM c GROUP BY 1
)
SELECT source, n_tokens, n_types, sum_c2,
       CAST(floor(10000.0
                  * (CAST(sum_c2 AS DOUBLE) - CAST(n_tokens AS DOUBLE))
                  / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE))
                  * 1000000.0 + 0.5) AS BIGINT) AS yule_micro
FROM agg
WHERE n_tokens > 0
ORDER BY source"""


# ---------------------------------------------------------------------------
# events_partial_correlation — r(A,B | C) of top-3 type daily series
# ---------------------------------------------------------------------------


def q_events_partial_correlation(sf_dir: str):
    """First-order partial correlation of the two busiest event types'
    zero-filled daily count series, controlling for the third busiest:
    r_AB.C = (r_AB - r_AC r_BC) / sqrt((1-r_AC^2)(1-r_BC^2)). Top-3
    selection is (count desc, name asc); every moment (sums, squared
    sums, cross-products over the shared all-events day grid) is an
    EXACT integer; the three r's and the composition are the only float
    steps. One row: type_a, type_b, type_c, n_days, r_ab_micro,
    r_ac_micro, r_bc_micro, partial_micro.

    Scale shape: one bounded (day, event_type) combiner per batch; the
    |days| x |types| histogram is the only thing the driver sees."""

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "dy": pa.compute.cast(t["ts"], pa.int64()).to_numpy()
                // _DAY_US,
                "et": t["event_type"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby(["dy", "et"]).size()
        idx = g.index.to_frame(index=False)
        return pa.table(
            {
                "dy": pa.array(idx["dy"].to_numpy(np.int64)),
                "et": pa.array(idx["et"].astype(str), pa.string()),
                "cnt": pa.array(g.to_numpy(np.int64)),
            }
        )

    h = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["dy", "et"])["cnt"]
        .sum()
        .reset_index()
    )
    cols = [
        "type_a", "type_b", "type_c", "n_days",
        "r_ab_micro", "r_ac_micro", "r_bc_micro", "partial_micro",
    ]
    empty = pd.DataFrame(
        {
            **{c: pd.Series([], dtype=object) for c in cols[:3]},
            **{c: pd.Series([], dtype=np.int64) for c in cols[3:]},
        }
    )
    if h.empty:
        return empty
    totals = (
        h.groupby("et")["cnt"].sum().reset_index()
        .sort_values(["cnt", "et"], ascending=[False, True])
    )
    if len(totals) < 3:
        return empty
    ta, tb, tc = totals["et"].tolist()[:3]
    d0, d1 = int(h["dy"].min()), int(h["dy"].max())
    n = d1 - d0 + 1
    if n < 3:
        return empty
    series = {}
    for name in (ta, tb, tc):
        y = np.zeros(n, np.int64)
        sub = h[h["et"] == name]
        y[sub["dy"].to_numpy(np.int64) - d0] = sub["cnt"].to_numpy(np.int64)
        series[name] = y
    a, b, c = series[ta], series[tb], series[tc]

    def corr(u: np.ndarray, v: np.ndarray) -> float:
        su, sv = int(u.sum()), int(v.sum())
        suu, svv = int((u * u).sum()), int((v * v).sum())
        suv = int((u * v).sum())
        num = float(n * suv - su * sv)
        den = float(np.sqrt(float(n * suu - su * su))) * float(
            np.sqrt(float(n * svv - sv * sv))
        )
        return num / den

    r_ab, r_ac, r_bc = corr(a, b), corr(a, c), corr(b, c)
    part = (r_ab - r_ac * r_bc) / float(
        np.sqrt((1.0 - r_ac * r_ac) * (1.0 - r_bc * r_bc))
    )

    def micro(v: float) -> np.int64:
        return np.int64(np.floor(v * 1_000_000.0 + 0.5))

    return pd.DataFrame(
        [
            (
                ta, tb, tc, np.int64(n),
                micro(r_ab), micro(r_ac), micro(r_bc), micro(part),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols[3:]})


ORACLES267["events_partial_correlation"] = f"""
WITH tc AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         row_number() OVER (ORDER BY count(*) DESC, event_type) AS rk
  FROM events GROUP BY 1
),
h AS (
  SELECT epoch_us(ts) // {_DAY_US} AS dy, event_type,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
),
g AS (SELECT min(dy) AS d0, max(dy) AS d1 FROM h),
grid AS (
  SELECT g.d0 + CAST(r.range AS BIGINT) AS dy
  FROM g CROSS JOIN range(0, 20000) r
  WHERE r.range <= g.d1 - g.d0
),
series AS (
  SELECT grid.dy,
         CAST(coalesce(sum(CASE WHEN h.event_type =
                (SELECT event_type FROM tc WHERE rk = 1)
              THEN h.cnt END), 0) AS BIGINT) AS a,
         CAST(coalesce(sum(CASE WHEN h.event_type =
                (SELECT event_type FROM tc WHERE rk = 2)
              THEN h.cnt END), 0) AS BIGINT) AS b,
         CAST(coalesce(sum(CASE WHEN h.event_type =
                (SELECT event_type FROM tc WHERE rk = 3)
              THEN h.cnt END), 0) AS BIGINT) AS c
  FROM grid LEFT JOIN h ON h.dy = grid.dy
  GROUP BY 1
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(a) AS BIGINT) AS sa, CAST(sum(b) AS BIGINT) AS sb,
         CAST(sum(c) AS BIGINT) AS sc,
         CAST(sum(a * a) AS BIGINT) AS saa,
         CAST(sum(b * b) AS BIGINT) AS sbb,
         CAST(sum(c * c) AS BIGINT) AS scc,
         CAST(sum(a * b) AS BIGINT) AS sab,
         CAST(sum(a * c) AS BIGINT) AS sac,
         CAST(sum(b * c) AS BIGINT) AS sbc
  FROM series
),
r AS (
  SELECT n,
         CAST(n * sab - sa * sb AS DOUBLE)
           / (sqrt(CAST(n * saa - sa * sa AS DOUBLE))
              * sqrt(CAST(n * sbb - sb * sb AS DOUBLE))) AS r_ab,
         CAST(n * sac - sa * sc AS DOUBLE)
           / (sqrt(CAST(n * saa - sa * sa AS DOUBLE))
              * sqrt(CAST(n * scc - sc * sc AS DOUBLE))) AS r_ac,
         CAST(n * sbc - sb * sc AS DOUBLE)
           / (sqrt(CAST(n * sbb - sb * sb AS DOUBLE))
              * sqrt(CAST(n * scc - sc * sc AS DOUBLE))) AS r_bc
  FROM m
)
SELECT (SELECT event_type FROM tc WHERE rk = 1) AS type_a,
       (SELECT event_type FROM tc WHERE rk = 2) AS type_b,
       (SELECT event_type FROM tc WHERE rk = 3) AS type_c,
       n AS n_days,
       CAST(floor(r_ab * 1000000.0 + 0.5) AS BIGINT) AS r_ab_micro,
       CAST(floor(r_ac * 1000000.0 + 0.5) AS BIGINT) AS r_ac_micro,
       CAST(floor(r_bc * 1000000.0 + 0.5) AS BIGINT) AS r_bc_micro,
       CAST(floor((r_ab - r_ac * r_bc)
                  / sqrt((1.0 - r_ac * r_ac) * (1.0 - r_bc * r_bc))
                  * 1000000.0 + 0.5) AS BIGINT) AS partial_micro
FROM r
WHERE n >= 3 AND (SELECT count(*) FROM tc) >= 3"""


QUERIES267 = {
    "docs_yule_k": q_docs_yule_k,
    "events_partial_correlation": q_events_partial_correlation,
}
