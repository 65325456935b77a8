"""Driver-contract queries, wave 305 — lag-1 serial correlation of the
interarrival-gap sequence (the renewal-process independence check) and
NODF nestedness of the nation x brand export incidence matrix (the
ecological bipartite-structure classic). Same contract as queries.py:
column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES305: dict[str, str] = {}

_NB_BUCKETS = 64


# ---------------------------------------------------------------------------
# events_gap_autocorr — lag-1 correlation of consecutive gaps
# ---------------------------------------------------------------------------


def q_events_gap_autocorr(sf_dir: str):
    """Renewal check: Pearson correlation between consecutive
    interarrival gaps of the globally sorted event stream (a true
    renewal process has r1 = 0; positive r1 means bursty clustering).
    Gap moments (sum, sum^2 over both margins, cross-products) fold as
    EXACT integers per sorted block with boundary stitching; one float
    composition. One row: n_gap_pairs, r1_micro.

    Scale shape: ONE range-partitioned sort on ts; per-block gap-pair
    moment partials plus (first, last, first-gap, last-gap) boundary
    data — blocks-bounded driver stitch (the `events_greenwood`
    idiom)."""

    def block_fold(t: pa.Table) -> pd.DataFrame:
        ts = pa.compute.cast(t["ts"], pa.int64()).to_numpy()
        cols_ = ("n", "sx", "sy", "sxy", "sxx", "syy",
                 "first_ts", "last_ts", "first_gap", "last_gap")
        if len(ts) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=object)
                                 for c in cols_})
        d = np.diff(ts).astype(object)
        if len(d) >= 2:
            x, y = d[:-1], d[1:]
            row = (
                len(d) - 1, int(x.sum()), int(y.sum()),
                int((x * y).sum()), int((x * x).sum()), int((y * y).sum()),
                int(ts[0]), int(ts[-1]), int(d[0]), int(d[-1]),
            )
        elif len(d) == 1:
            row = (0, 0, 0, 0, 0, 0, int(ts[0]), int(ts[-1]),
                   int(d[0]), int(d[0]))
        else:
            row = (0, 0, 0, 0, 0, 0, int(ts[0]), int(ts[-1]), -1, -1)
        return pd.DataFrame([dict(zip(cols_, row))])

    parts = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        .sort("ts")
        .map_batches(block_fold, batch_format="pyarrow")
        .to_pandas()
        .sort_values("first_ts")
        .reset_index(drop=True)
    )
    cols = ["n_gap_pairs", "r1_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if parts.empty:
        return empty
    n = int(sum(int(v) for v in parts["n"]))
    sx = int(sum(int(v) for v in parts["sx"]))
    sy = int(sum(int(v) for v in parts["sy"]))
    sxy = int(sum(int(v) for v in parts["sxy"]))
    sxx = int(sum(int(v) for v in parts["sxx"]))
    syy = int(sum(int(v) for v in parts["syy"]))
    # boundary: the gap between consecutive blocks pairs with each
    # side's neighboring gap
    lasts = parts["last_ts"].to_numpy(object)
    firsts = parts["first_ts"].to_numpy(object)
    lgaps = parts["last_gap"].to_numpy(object)
    fgaps = parts["first_gap"].to_numpy(object)

    def add_pair(x: int, y: int) -> None:
        nonlocal n, sx, sy, sxy, sxx, syy
        n += 1
        sx += x
        sy += y
        sxy += x * y
        sxx += x * x
        syy += y * y

    # chain the trailing gap across block junctions (covers single-event
    # blocks, where two boundary gaps are consecutive)
    carry = None
    for i in range(len(parts)):
        if i > 0:
            b = int(firsts[i]) - int(lasts[i - 1])
            if carry is not None:
                add_pair(int(carry), b)
            carry = b
        if int(fgaps[i]) >= 0:
            if carry is not None:
                add_pair(int(carry), int(fgaps[i]))
            carry = int(lgaps[i])
    if n < 2:
        return empty
    den = float(np.sqrt(float(n * sxx - sx * sx))) * float(
        np.sqrt(float(n * syy - sy * sy))
    )
    if den == 0.0:
        return empty
    r = float(n * sxy - sx * sy) / den
    return pd.DataFrame(
        [(np.int64(n), np.int64(np.floor(r * 1_000_000.0 + 0.5)))],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES305["events_gap_autocorr"] = """
WITH s AS (
  SELECT epoch_us(ts) AS us, lag(epoch_us(ts)) OVER (ORDER BY ts) AS prev
  FROM events
),
gaps AS (
  SELECT CAST(us - prev AS BIGINT) AS d,
         row_number() OVER (ORDER BY us) AS rn
  FROM s WHERE prev IS NOT NULL
),
pairs AS (
  SELECT a.d AS x, b.d AS y
  FROM gaps a JOIN gaps b ON b.rn = a.rn + 1
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
         CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
  FROM pairs
)
SELECT n AS n_gap_pairs,
       CAST(floor(CAST(CAST(n AS HUGEINT) * sxy
                       - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                  / (sqrt(CAST(CAST(n AS HUGEINT) * sxx
                               - CAST(sx AS HUGEINT) * sx AS DOUBLE))
                     * sqrt(CAST(CAST(n AS HUGEINT) * syy
                                 - CAST(sy AS HUGEINT) * sy AS DOUBLE)))
                  * 1000000.0 + 0.5) AS BIGINT) AS r1_micro
FROM m
WHERE n >= 2
  AND (CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx) > 0
  AND (CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy) > 0"""


# ---------------------------------------------------------------------------
# nation_brand_nestedness — NODF of the export incidence matrix
# ---------------------------------------------------------------------------


def q_nation_brand_nestedness(sf_dir: str):
    """NODF nestedness of the nation x brand export incidence (nation
    exports brand iff some lineitem of that brand ships from one of its
    suppliers): for ordered pairs with STRICTLY larger degree,
    N_paired = 100 |A_i intersect A_j| / k_j, and NODF averages the
    paired scores over all row pairs and column pairs. Pure integer
    counting on the bounded matrix; one division per pair. One row:
    n_nations, n_brands, n_fill, nodf_micro.

    Scale shape: distinct (nation, brand) incidence rides the tagged
    partkey-side bucket exchange with broadcast supplier/part maps; the
    bounded matrix algebra runs on the driver."""
    import ray as _ray
    import pyarrow.parquet as pq_mod

    supp = pq_mod.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    part_t = pq_mod.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    )
    s2n = dict(zip(supp["s_suppkey"].to_pylist(), supp["s_nationkey"].to_pylist()))
    p2b = dict(zip(part_t["p_partkey"].to_pylist(), part_t["p_brand"].to_pylist()))
    dims_ref = _ray.put((s2n, p2b))

    def partial(t: pa.Table) -> pd.DataFrame:
        s2n_, p2b_ = _ray.get(dims_ref)
        df = pd.DataFrame(
            {
                "nk": pd.Series(
                    t["l_suppkey"].to_numpy(zero_copy_only=False)
                ).map(s2n_).to_numpy(np.int64),
                "brand": pd.Series(
                    t["l_partkey"].to_numpy(zero_copy_only=False)
                ).map(p2b_).to_numpy(object),
            }
        )
        return df.drop_duplicates()

    inc = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_suppkey", "l_partkey"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .drop_duplicates()
    )
    cols = ["n_nations", "n_brands", "n_fill", "nodf_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if inc.empty:
        return empty
    nations = sorted(inc["nk"].unique())
    brands = sorted(inc["brand"].unique())
    sets_n = {
        n: set(inc.loc[inc["nk"] == n, "brand"]) for n in nations
    }
    sets_b = {
        b: set(inc.loc[inc["brand"] == b, "nk"]) for b in brands
    }

    def nodf_part(sets: dict) -> tuple[float, int]:
        keys = sorted(sets)
        tot = 0.0
        pairs = 0
        for i, a in enumerate(keys):
            for b in keys[i + 1:]:
                ka, kb = len(sets[a]), len(sets[b])
                pairs += 1
                hi, lo = (a, b) if ka > kb else (b, a)
                khi, klo = max(ka, kb), min(ka, kb)
                if ka == kb or klo == 0:
                    continue
                ov = len(sets[hi] & sets[lo])
                tot += 100.0 * float(ov) / float(klo)
        return tot, pairs

    tr, pr = nodf_part(sets_n)
    tc, pc_ = nodf_part(sets_b)
    if pr + pc_ == 0:
        return empty
    nodf = (tr + tc) / float(pr + pc_)
    return pd.DataFrame(
        [
            (
                np.int64(len(nations)), np.int64(len(brands)),
                np.int64(len(inc)),
                np.int64(np.floor(nodf * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES305["nation_brand_nestedness"] = """
WITH inc AS (
  SELECT DISTINCT s.s_nationkey AS nk, p.p_brand AS brand
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN part p ON p.p_partkey = l.l_partkey
),
rdeg AS (SELECT nk, CAST(count(*) AS BIGINT) AS k FROM inc GROUP BY 1),
cdeg AS (SELECT brand, CAST(count(*) AS BIGINT) AS k FROM inc GROUP BY 1),
rpairs AS (
  SELECT ra.nk AS ia, rb.nk AS ib, ra.k AS ka, rb.k AS kb
  FROM rdeg ra JOIN rdeg rb ON ra.nk < rb.nk
),
rov AS (
  SELECT p.ia, p.ib, p.ka, p.kb,
         CAST(count(*) AS BIGINT) AS ov
  FROM rpairs p
  JOIN inc x ON x.nk = p.ia
  JOIN inc y ON y.nk = p.ib AND y.brand = x.brand
  GROUP BY 1, 2, 3, 4
),
rscore AS (
  SELECT p.ia, p.ib,
         CASE WHEN p.ka = p.kb THEN 0.0
              ELSE 100.0 * CAST(coalesce(rov.ov, 0) AS DOUBLE)
                   / CAST(least(p.ka, p.kb) AS DOUBLE) END AS s
  FROM rpairs p LEFT JOIN rov ON rov.ia = p.ia AND rov.ib = p.ib
),
cpairs AS (
  SELECT ca.brand AS ia, cb.brand AS ib, ca.k AS ka, cb.k AS kb
  FROM cdeg ca JOIN cdeg cb ON ca.brand < cb.brand
),
cov_ AS (
  SELECT p.ia, p.ib, p.ka, p.kb, CAST(count(*) AS BIGINT) AS ov
  FROM cpairs p
  JOIN inc x ON x.brand = p.ia
  JOIN inc y ON y.brand = p.ib AND y.nk = x.nk
  GROUP BY 1, 2, 3, 4
),
cscore AS (
  SELECT p.ia, p.ib,
         CASE WHEN p.ka = p.kb THEN 0.0
              ELSE 100.0 * CAST(coalesce(cov_.ov, 0) AS DOUBLE)
                   / CAST(least(p.ka, p.kb) AS DOUBLE) END AS s
  FROM cpairs p LEFT JOIN cov_ ON cov_.ia = p.ia AND cov_.ib = p.ib
),
tot AS (
  SELECT (SELECT sum(s) FROM rscore) AS tr,
         (SELECT count(*) FROM rscore) AS pr,
         (SELECT sum(s) FROM cscore) AS tc,
         (SELECT count(*) FROM cscore) AS pc_
)
SELECT CAST((SELECT count(*) FROM rdeg) AS BIGINT) AS n_nations,
       CAST((SELECT count(*) FROM cdeg) AS BIGINT) AS n_brands,
       CAST((SELECT count(*) FROM inc) AS BIGINT) AS n_fill,
       CAST(floor((coalesce(tot.tr, 0) + coalesce(tot.tc, 0))
                  / CAST(tot.pr + tot.pc_ AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS nodf_micro
FROM tot
WHERE tot.pr + tot.pc_ > 0"""


QUERIES305 = {
    "events_gap_autocorr": q_events_gap_autocorr,
    "nation_brand_nestedness": q_nation_brand_nestedness,
}
