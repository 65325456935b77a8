"""Driver-contract queries, wave 302 — the centered 7-day rolling
MEDIAN smoother of the daily event series (the robust companion of the
moving average, exact odd-window order statistics) and the numeric-token
profile per document source (integers / decimals / year-like tokens).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES302: dict[str, str] = {}

_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# events_rolling_median — centered 7-day running median
# ---------------------------------------------------------------------------


def q_events_rolling_median(sf_dir: str):
    """Centered 7-day rolling median of the zero-filled daily series
    (defined where the full window exists): the odd window makes the
    median an EXACT order statistic — the robust trend extraction that
    ignores single-day spikes; also reports the residual y - med. Per
    day: dy, y, med7, resid.

    Scale shape: bounded daily fold; the window sort is a vectorized
    (n x 7) reshape on the calendar-bounded driver grid (at 100 TB the
    same contract runs as a partitioned window with 3-row overlap)."""
    from sts_opentelemetry_collector_ray.pipelines.queries264 import (
        _daily_counts,
        _grid,
    )

    days = _daily_counts(sf_dir)
    cols = ["dy", "y", "med7", "resid"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if days.empty:
        return empty
    y = _grid(days)
    n = len(y)
    if n < 7:
        return empty
    d0 = int(days.index.min())
    win = np.lib.stride_tricks.sliding_window_view(y, 7)
    med = np.sort(win, axis=1)[:, 3]
    dy = d0 + np.arange(3, n - 3, dtype=np.int64)
    yc = y[3:n - 3]
    return pd.DataFrame(
        {
            "dy": dy,
            "y": yc,
            "med7": med.astype(np.int64),
            "resid": (yc - med).astype(np.int64),
        }
    ).astype({c: np.int64 for c in cols})


ORACLES302["events_rolling_median"] = f"""
WITH h AS (
  SELECT epoch_us(ts) // {_DAY_US} AS dy, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
),
g AS (SELECT min(dy) AS d0, max(dy) AS d1 FROM h),
grid AS (
  SELECT g.d0 + CAST(r.range AS BIGINT) AS dy
  FROM g CROSS JOIN range(0, 20000) r
  WHERE r.range <= g.d1 - g.d0
),
x AS (
  SELECT grid.dy, CAST(coalesce(h.cnt, 0) AS BIGINT) AS y
  FROM grid LEFT JOIN h USING (dy)
),
w AS (
  SELECT dy, y,
         CAST(quantile_disc(y, 0.5) OVER (
           ORDER BY dy ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
         ) AS BIGINT) AS med7,
         count(*) OVER (
           ORDER BY dy ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
         ) AS wn
  FROM x
)
SELECT dy, y, med7, y - med7 AS resid
FROM w WHERE wn = 7
ORDER BY dy"""


# ---------------------------------------------------------------------------
# docs_numeric_profile — numeric token census per source
# ---------------------------------------------------------------------------


def q_docs_numeric_profile(sf_dir: str):
    """Numeric density per source over the docs_vocab tokenizer:
    integer tokens (^[0-9]+$), decimal tokens (^[0-9]+\\.[0-9]+$) and
    year-like tokens (^(19|20)[0-9][0-9]$, a subset of the integers),
    with the numeric share of all tokens. Pure Arrow regex counting.
    Per source: source, n_tokens, n_integers, n_decimals, n_years,
    numeric_share_micro."""
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), r"\s+")
        n_per = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        src = np.repeat(t["source"].to_numpy(zero_copy_only=False), n_per)
        flat = toks.combine_chunks().flatten()
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        is_int = pc.match_substring_regex(
            flat, r"^[0-9]+$"
        ).to_numpy(zero_copy_only=False)
        is_dec = pc.match_substring_regex(
            flat, r"^[0-9]+\.[0-9]+$"
        ).to_numpy(zero_copy_only=False)
        is_year = pc.match_substring_regex(
            flat, r"^(19|20)[0-9][0-9]$"
        ).to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                "source": src[keep],
                "n": 1,
                "i": is_int[keep].astype(np.int64),
                "d": is_dec[keep].astype(np.int64),
                "y": is_year[keep].astype(np.int64),
            }
        )
        return df.groupby("source", as_index=False).sum().astype(
            {"n": np.int64, "i": np.int64, "d": np.int64, "y": np.int64}
        )

    m = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["source", "text"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("source")[["n", "i", "d", "y"]]
        .sum()
        .sort_index()
    )
    cols = [
        "source", "n_tokens", "n_integers", "n_decimals", "n_years",
        "numeric_share_micro",
    ]
    empty = pd.DataFrame(
        {
            "source": pd.Series([], dtype=object),
            **{c: pd.Series([], dtype=np.int64) for c in cols[1:]},
        }
    )
    if m.empty:
        return empty
    out = m.reset_index()
    share = np.floor(
        (out["i"] + out["d"]).to_numpy(np.float64)
        / out["n"].to_numpy(np.float64) * 1_000_000.0 + 0.5
    ).astype(np.int64)
    out = out.rename(
        columns={
            "n": "n_tokens", "i": "n_integers", "d": "n_decimals",
            "y": "n_years",
        }
    )
    out["numeric_share_micro"] = share
    return out.astype({c: np.int64 for c in cols[1:]})[cols]


ORACLES302["docs_numeric_profile"] = r"""
WITH tok AS (
  SELECT source,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS w
  FROM documents
),
m AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(CASE WHEN regexp_matches(w, '^[0-9]+$')
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_integers,
         CAST(sum(CASE WHEN regexp_matches(w, '^[0-9]+\.[0-9]+$')
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_decimals,
         CAST(sum(CASE WHEN regexp_matches(w, '^(19|20)[0-9][0-9]$')
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_years
  FROM tok GROUP BY 1
)
SELECT source, n_tokens, n_integers, n_decimals, n_years,
       CAST(floor(CAST(n_integers + n_decimals AS DOUBLE)
                  / CAST(n_tokens AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
         AS numeric_share_micro
FROM m
ORDER BY source"""


QUERIES302 = {
    "events_rolling_median": q_events_rolling_median,
    "docs_numeric_profile": q_docs_numeric_profile,
}
