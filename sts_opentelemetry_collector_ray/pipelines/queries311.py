"""Driver-contract queries, wave 311 — per-role vocabulary entropy of
the transcripts (who speaks with the richer token distribution) and the
monthly return-rate p-chart (attribute SPC with 3-sigma binomial
limits). Same contract as queries.py: column names AND dtypes match the
DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES311: dict[str, str] = {}


# ---------------------------------------------------------------------------
# conv_role_vocab_entropy — token-distribution entropy per role
# ---------------------------------------------------------------------------


def q_conv_role_vocab_entropy(sf_dir: str):
    """Shannon entropy of each role's token distribution (docs_vocab
    tokenizer over transcript text): H = ln N - (1/N) sum c ln c from
    EXACT (role, token) counts, with the perplexity-style effective
    vocabulary exp(H). Per role: role, n_tokens, n_types, h_micro,
    eff_vocab_milli.

    Scale shape: (role, token) wordcount exchange (the docs_yule_k
    idiom over the transcripts source)."""
    from ray.data.aggregate import Sum
    from ..sources.transcripts import derive_transcripts_from_events

    ds = derive_transcripts_from_events(sf_dir)

    def local_counts(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), r"\s+")
        n_per = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        role = pa.array(
            np.repeat(t["role"].to_numpy(zero_copy_only=False), n_per),
            pa.string(),
        )
        flat = toks.combine_chunks().flatten()
        keep = pc.not_equal(flat, "")
        g = (
            pa.table({"role": role.filter(keep), "token": flat.filter(keep)})
            .group_by(["role", "token"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["role", "token", "pn"])

    counts = (
        ds.map_batches(local_counts, batch_format="pyarrow")
        .groupby(["role", "token"])
        .aggregate(Sum("pn", alias_name="c"))
    )

    def fold(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "role": t["role"].to_numpy(zero_copy_only=False),
                "c": t["c"].to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )
        g = df.groupby("role")["c"].agg(
            n="sum", v="size",
            clnc=lambda s: float(
                (s.to_numpy(np.float64) * np.log(s.to_numpy(np.float64)))
                .sum()
            ),
        )
        return g.reset_index()

    m = (
        counts.map_batches(fold, batch_format="pyarrow")
        .to_pandas()
        .groupby("role")
        .agg(n=("n", "sum"), v=("v", "sum"), clnc=("clnc", "sum"))
        .sort_index()
    )
    cols = ["role", "n_tokens", "n_types", "h_micro", "eff_vocab_milli"]
    empty = pd.DataFrame(
        {
            "role": pd.Series([], dtype=object),
            **{c: pd.Series([], dtype=np.int64) for c in cols[1:]},
        }
    )
    if m.empty:
        return empty
    rows = []
    for role, r in m.iterrows():
        n = int(r["n"])
        if n == 0:
            continue
        h = float(np.log(float(n))) - float(r["clnc"]) / float(n)
        rows.append(
            (
                role, np.int64(n), np.int64(int(r["v"])),
                np.int64(np.floor(h * 1_000_000.0 + 0.5)),
                np.int64(np.floor(float(np.exp(h)) * 1_000.0 + 0.5)),
            )
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols[1:]}
    )


def _role_entropy_oracle() -> str:
    from ..sources.transcripts import TRANSCRIPTS_FROM_EVENTS_SQL

    return (
        TRANSCRIPTS_FROM_EVENTS_SQL
        + r""",
tok AS (
  SELECT role,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS token
  FROM transcripts
),
c AS (
  SELECT role, token, CAST(count(*) AS BIGINT) AS c
  FROM tok GROUP BY 1, 2
),
agg AS (
  SELECT role, CAST(sum(c) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS v,
         sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS clnc
  FROM c GROUP BY 1
)
SELECT role, n AS n_tokens, v AS n_types,
       CAST(floor((ln(CAST(n AS DOUBLE)) - clnc / CAST(n AS DOUBLE))
                  * 1000000.0 + 0.5) AS BIGINT) AS h_micro,
       CAST(floor(exp(ln(CAST(n AS DOUBLE)) - clnc / CAST(n AS DOUBLE))
                  * 1000.0 + 0.5) AS BIGINT) AS eff_vocab_milli
FROM agg
WHERE n > 0
ORDER BY role"""
    )


# ---------------------------------------------------------------------------
# lineitem_p_chart — monthly return-rate attribute control chart
# ---------------------------------------------------------------------------


def q_lineitem_p_chart(sf_dir: str):
    """Attribute p-chart of the monthly return share: centerline
    pbar = total returns / total lines; per month the 3-sigma binomial
    limits pbar +- 3 sqrt(pbar (1-pbar) / n_m) (clamped to [0, 1]);
    months outside their limits are flagged. Per month: ship_month
    (year*12+month-1), n, x, p_micro, oob — counting exact, limits
    mirrored float."""

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        ym = (
            df["l_shipdate"].dt.year.to_numpy(np.int64) * 12
            + df["l_shipdate"].dt.month.to_numpy(np.int64) - 1
        )
        r = (df["l_returnflag"].to_numpy(object) == "R").astype(np.int64)
        g = pd.DataFrame({"ym": ym, "n": 1, "x": r}).groupby(
            "ym", as_index=False
        ).sum()
        return g.astype(np.int64)

    m = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_shipdate", "l_returnflag"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("ym")[["n", "x"]]
        .sum()
        .sort_index()
    )
    cols = ["ship_month", "n", "x", "p_micro", "oob"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if m.empty:
        return empty
    n_tot = int(m["n"].sum())
    x_tot = int(m["x"].sum())
    if n_tot == 0:
        return empty
    pbar = float(x_tot) / float(n_tot)
    rows = []
    for ym, r in m.iterrows():
        n, x = int(r["n"]), int(r["x"])
        p = float(x) / float(n)
        half = 3.0 * float(np.sqrt(pbar * (1.0 - pbar) / float(n)))
        ucl = min(pbar + half, 1.0)
        lcl = max(pbar - half, 0.0)
        oob = 1 if (p > ucl or p < lcl) else 0
        rows.append(
            (
                np.int64(int(ym)), np.int64(n), np.int64(x),
                np.int64(np.floor(p * 1_000_000.0 + 0.5)), np.int64(oob),
            )
        )
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols}
    )


ORACLES311["lineitem_p_chart"] = """
WITH base AS (
  SELECT CAST(year(l_shipdate) * 12 + month(l_shipdate) - 1 AS BIGINT)
           AS ym,
         CAST(l_returnflag = 'R' AS BIGINT) AS r
  FROM lineitem
),
m AS (
  SELECT ym, CAST(count(*) AS BIGINT) AS n, CAST(sum(r) AS BIGINT) AS x
  FROM base GROUP BY 1
),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(sum(x) AS BIGINT) AS xt FROM m
),
lim AS (
  SELECT m.ym, m.n, m.x,
         CAST(m.x AS DOUBLE) / m.n AS p,
         CAST(tot.xt AS DOUBLE) / tot.nt AS pbar,
         3.0 * sqrt((CAST(tot.xt AS DOUBLE) / tot.nt)
                    * (1.0 - CAST(tot.xt AS DOUBLE) / tot.nt) / m.n) AS half
  FROM m, tot
  WHERE tot.nt > 0
)
SELECT ym AS ship_month, n, x,
       CAST(floor(p * 1000000.0 + 0.5) AS BIGINT) AS p_micro,
       CAST(CASE WHEN p > least(pbar + half, 1.0)
                  OR p < greatest(pbar - half, 0.0)
                 THEN 1 ELSE 0 END AS BIGINT) AS oob
FROM lim
ORDER BY ship_month"""


def _register_dynamic() -> None:
    ORACLES311["conv_role_vocab_entropy"] = _role_entropy_oracle()


_register_dynamic()

QUERIES311 = {
    "conv_role_vocab_entropy": q_conv_role_vocab_entropy,
    "lineitem_p_chart": q_lineitem_p_chart,
}
