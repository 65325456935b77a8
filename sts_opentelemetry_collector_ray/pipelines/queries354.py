"""Driver-contract queries, wave 354 — quality drift over the ingestion
order (Gopher pass rate by doc_id decile) and the gap-to-value
correlation (does a longer silence precede a bigger order?). Same
contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES354: dict[str, str] = {}

_GV_BUCKETS = 64


# ---------------------------------------------------------------------------
# docs_quality_drift — Gopher pass rate along the ingestion order
# ---------------------------------------------------------------------------


def q_docs_quality_drift(sf_dir: str):
    """Crawl drift: doc_ids deciled by EXACT order statistics
    (k = ceil(i n / 10) boundaries over the id histogram); per decile
    the Gopher keep rate (the `docs_gopher` kernel verbatim). Falling
    rates mean later ingestion pulled dirtier content. Per decile:
    id_decile, n_docs, n_pass, rate_micro."""
    import ray as _ray
    from ..stages.text_analysis import gopher_quality_batch

    ids = (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
        .to_pandas()["doc_id"]
        .to_numpy(np.int64)
    )
    cols = ["id_decile", "n_docs", "n_pass", "rate_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    n = len(ids)
    if n < 10:
        return empty
    s = np.sort(ids)
    bounds = [int(s[(i * n + 9) // 10 - 1]) for i in range(1, 10)]
    b_ref = _ray.put(bounds)

    def partial(t: pa.Table) -> pd.DataFrame:
        bds = _ray.get(b_ref)
        g = gopher_quality_batch(t)
        keep = g["keep"].to_numpy(zero_copy_only=False).astype(np.int64)
        did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        dec = np.searchsorted(np.array(bds, np.int64), did, side="left")
        df = pd.DataFrame({"d": dec.astype(np.int64), "n": 1, "p": keep})
        return df.groupby("d", as_index=False).sum().astype(np.int64)

    h = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("d")[["n", "p"]]
        .sum()
        .sort_index()
    )
    if h.empty:
        return empty
    out = h.reset_index().rename(
        columns={"d": "id_decile", "n": "n_docs", "p": "n_pass"}
    )
    out["rate_micro"] = np.floor(
        out["n_pass"].to_numpy(np.float64)
        / out["n_docs"].to_numpy(np.float64) * 1_000_000.0 + 0.5
    ).astype(np.int64)
    return out.astype({c: np.int64 for c in cols})[cols]


ORACLES354["docs_quality_drift"] = """
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
keepf AS (
  SELECT doc_id,
         CAST(((word_count >= 50 AND word_count <= 100000)
               AND (mean_len >= 3.0 AND mean_len <= 10.0)
               AND (hashes * 1.0 / greatest(word_count, 1) <= 0.1)
               AND (ellipses * 1.0 / greatest(word_count, 1) <= 0.1)
               AND (stop_hits >= 2)) AS BIGINT) AS keep
  FROM m
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM keepf),
ranked AS (
  SELECT doc_id, keep, row_number() OVER (ORDER BY doc_id) AS rk
  FROM keepf
),
dec AS (
  SELECT keep,
         least(((rk - 1) * 10) // (SELECT n FROM nn), 9) AS d0,
         rk
  FROM ranked
),
-- decile membership via the exact ceil(i n / 10) boundaries:
-- rank r belongs to decile d iff r > ceil(d n/10) and r <= ceil((d+1) n/10)
db AS (
  SELECT keep,
         (SELECT count(*) FROM (SELECT CAST(r.range AS BIGINT) + 1 AS i
                                FROM range(0, 9) r) b, nn
          WHERE dec.rk > (b.i * nn.n + 9) // 10) AS d
  FROM dec
),
agg AS (
  SELECT CAST(d AS BIGINT) AS id_decile,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(keep) AS BIGINT) AS n_pass
  FROM db GROUP BY 1
)
SELECT id_decile, n_docs, n_pass,
       CAST(floor(CAST(n_pass AS DOUBLE) / CAST(n_docs AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS rate_micro
FROM agg, nn
WHERE nn.n >= 10
ORDER BY id_decile"""


# ---------------------------------------------------------------------------
# customer_gap_value_corr — does silence precede big orders?
# ---------------------------------------------------------------------------


def q_customer_gap_value_corr(sf_dir: str):
    """Gap-to-value: per consecutive same-customer order pair (by order
    date, ties by orderkey), x = gap days (>= 0) and y = the LATER
    order's total cents; Pearson r and slope from EXACT integer
    moments. One row: n_pairs, r_micro, slope_micro (cents per day)."""

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        out = pd.DataFrame(
            {
                "k": df["o_custkey"].to_numpy(np.int64),
                "dy": df["o_orderdate"].to_numpy("datetime64[us]").astype(
                    np.int64
                ) // 86_400_000_000,
                "ok": df["o_orderkey"].to_numpy(np.int64),
                "cents": np.floor(
                    df["o_totalprice"].to_numpy(np.float64) * 100.0 + 0.5
                ).astype(np.int64),
            }
        )
        out["_b"] = (out["k"] % _GV_BUCKETS).astype(np.int64)
        return out

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        zero = pd.DataFrame(
            {c: pd.Series([], dtype=object)
             for c in ("n", "sx", "sy", "sxx", "syy", "sxy")}
        )
        if len(g) == 0:
            return zero
        g = g.sort_values(["k", "dy", "ok"], kind="stable")
        k = g["k"].to_numpy(np.int64)
        dy = g["dy"].to_numpy(np.int64)
        cents = g["cents"].to_numpy(np.int64)
        same = k[1:] == k[:-1]
        x = (dy[1:] - dy[:-1])[same].astype(object)
        y = cents[1:][same].astype(object)
        if len(x) == 0:
            return zero
        return pd.DataFrame(
            {
                "n": [len(x)], "sx": [int(x.sum())], "sy": [int(y.sum())],
                "sxx": [int((x * x).sum())], "syy": [int((y * y).sum())],
                "sxy": [int((x * y).sum())],
            }
        )

    p = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey", "o_orderdate", "o_orderkey",
                     "o_totalprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )
    cols = ["n_pairs", "r_micro", "slope_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if p.empty:
        return empty
    n = int(sum(int(v) for v in p["n"]))
    if n < 3:
        return empty
    sx = int(sum(int(v) for v in p["sx"]))
    sy = int(sum(int(v) for v in p["sy"]))
    sxx = int(sum(int(v) for v in p["sxx"]))
    syy = int(sum(int(v) for v in p["syy"]))
    sxy = int(sum(int(v) for v in p["sxy"]))
    cx = n * sxx - sx * sx
    cy = n * syy - sy * sy
    if cx <= 0 or cy <= 0:
        return empty
    r = float(n * sxy - sx * sy) / (
        float(np.sqrt(float(cx))) * float(np.sqrt(float(cy)))
    )
    slope = float(n * sxy - sx * sy) / float(cx)
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


ORACLES354["customer_gap_value_corr"] = """
WITH seq AS (
  SELECT o_custkey,
         epoch_us(o_orderdate) // 86400000000 AS dy,
         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents,
         lag(epoch_us(o_orderdate) // 86400000000) OVER w AS pdy
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
),
pairs AS (
  SELECT CAST(dy - pdy AS BIGINT) AS x, cents AS y
  FROM seq WHERE pdy IS NOT NULL
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
         CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
  FROM pairs
)
SELECT n AS n_pairs,
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


QUERIES354 = {
    "docs_quality_drift": q_docs_quality_drift,
    "customer_gap_value_corr": q_customer_gap_value_corr,
}
