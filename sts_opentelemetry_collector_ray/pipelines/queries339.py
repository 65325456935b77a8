"""Driver-contract queries, wave 339 — the type-switching rate of
per-user event sequences vs the mixing expectation (1 - sum p^2), and
the brand x type association of the part catalog (chi-square and
Cramér's V). Same contract as queries.py: column names AND dtypes match
the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES339: dict[str, str] = {}


# ---------------------------------------------------------------------------
# users_type_switching — observed vs expected alternation
# ---------------------------------------------------------------------------


def q_users_type_switching(sf_dir: str):
    """Behavioral stickiness: among consecutive same-user event pairs
    (ordered by ts, event_id), the share whose types DIFFER, vs the
    well-mixed expectation 1 - sum_k p_k^2 from the global type mix
    (exact integer collision sum). Observed below expected means users
    do runs of one activity. One row: n_trans, obs_switch_micro,
    exp_switch_micro, stickiness_micro (exp - obs).

    Scale shape: the transition-count machinery (user-bucket exchange);
    plus a |types| count fold."""

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "u": t["user_id"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
                "ts": pa.compute.cast(t["ts"], pa.int64()).to_numpy(),
                "eid": t["event_id"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
                "et": t["event_type"].to_numpy(zero_copy_only=False),
            }
        )
        df["_b"] = (df["u"] % 64).astype(np.int64)
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        zero = pd.DataFrame(
            {"n": pd.Series([], dtype=np.int64),
             "sw": pd.Series([], dtype=np.int64)}
        )
        if len(g) == 0:
            return zero
        g = g.sort_values(["u", "ts", "eid"], kind="stable")
        u = g["u"].to_numpy(np.int64)
        et = g["et"].to_numpy(object)
        same = u[1:] == u[:-1]
        sw = (et[1:] != et[:-1])[same]
        return pd.DataFrame(
            {"n": [np.int64(len(sw))], "sw": [np.int64(int(sw.sum()))]}
        )

    p = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "ts", "event_id", "event_type"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .sum()
    )
    mix = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type"])
        .map_batches(
            lambda t: pd.DataFrame(
                {
                    "et": pd.Series(
                        t["event_type"].to_numpy(zero_copy_only=False)
                    ).value_counts().index.to_numpy(object),
                    "c": pd.Series(
                        t["event_type"].to_numpy(zero_copy_only=False)
                    ).value_counts().to_numpy(np.int64),
                }
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
        .groupby("et")["c"]
        .sum()
    )
    cols = ["n_trans", "obs_switch_micro", "exp_switch_micro",
            "stickiness_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    n_tr = int(p["n"])
    if n_tr == 0 or mix.empty:
        return empty
    sw = int(p["sw"])
    c = mix.to_numpy(np.int64).astype(object)
    n = int(c.sum())
    s2 = int((c * c).sum())
    obs = float(sw) / float(n_tr)
    exp = 1.0 - float(s2) / (float(n) * float(n))
    return pd.DataFrame(
        [
            (
                np.int64(n_tr),
                np.int64(np.floor(obs * 1_000_000.0 + 0.5)),
                np.int64(np.floor(exp * 1_000_000.0 + 0.5)),
                np.int64(np.floor((exp - obs) * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c_: np.int64 for c_ in cols})


ORACLES339["users_type_switching"] = """
WITH seq AS (
  SELECT event_type AS f,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS t
  FROM events
),
tr AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN f <> t THEN 1 ELSE 0 END) AS BIGINT) AS sw
  FROM seq WHERE t IS NOT NULL
),
mix AS (
  SELECT CAST(sum(c) AS BIGINT) AS n,
         CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS s2
  FROM (SELECT count(*) AS c FROM events GROUP BY event_type)
)
SELECT tr.n AS n_trans,
       CAST(floor(CAST(tr.sw AS DOUBLE) / tr.n * 1000000.0 + 0.5)
            AS BIGINT) AS obs_switch_micro,
       CAST(floor((1.0 - CAST(mix.s2 AS DOUBLE)
                   / (CAST(mix.n AS DOUBLE) * CAST(mix.n AS DOUBLE)))
                  * 1000000.0 + 0.5) AS BIGINT) AS exp_switch_micro,
       CAST(floor(((1.0 - CAST(mix.s2 AS DOUBLE)
                    / (CAST(mix.n AS DOUBLE) * CAST(mix.n AS DOUBLE)))
                   - CAST(tr.sw AS DOUBLE) / tr.n) * 1000000.0 + 0.5)
            AS BIGINT) AS stickiness_micro
FROM tr, mix
WHERE tr.n > 0"""


# ---------------------------------------------------------------------------
# part_brand_type_association — chi-square / Cramér's V of the catalog
# ---------------------------------------------------------------------------


def q_part_brand_type_association(sf_dir: str):
    """Catalog structure: the (brand, type) contingency table of parts,
    Pearson chi-square from exact integer counts, and Cramér's V =
    sqrt(chi2 / (n min(r-1, c-1))). One row: n_parts, n_brands,
    n_types, chi2_micro, v_micro."""

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "b": t["p_brand"].to_numpy(zero_copy_only=False),
                "ty": t["p_type"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby(["b", "ty"]).size().rename("c").reset_index()
        g["c"] = g["c"].astype(np.int64)
        return g

    h = (
        ray.data.read_parquet(
            f"{sf_dir}/part.parquet", columns=["p_brand", "p_type"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["b", "ty"])["c"]
        .sum()
    )
    cols = ["n_parts", "n_brands", "n_types", "chi2_micro", "v_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if h.empty:
        return empty
    brands = sorted(set(h.index.get_level_values(0)))
    types = sorted(set(h.index.get_level_values(1)))
    n = int(h.sum())
    rb = h.groupby(level=0).sum()
    ct = h.groupby(level=1).sum()
    chi2 = 0.0
    for b in brands:
        for ty in types:
            o = float(int(h.get((b, ty), 0)))
            e = float(int(rb.loc[b])) * float(int(ct.loc[ty])) / float(n)
            if e > 0.0:
                chi2 += (o - e) * (o - e) / e
    dmin = min(len(brands) - 1, len(types) - 1)
    if dmin <= 0:
        return empty
    v = float(np.sqrt(chi2 / (float(n) * float(dmin))))
    return pd.DataFrame(
        [
            (
                np.int64(n), np.int64(len(brands)), np.int64(len(types)),
                np.int64(np.floor(chi2 * 1_000_000.0 + 0.5)),
                np.int64(np.floor(v * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES339["part_brand_type_association"] = """
WITH h AS (
  SELECT p_brand AS b, p_type AS ty, CAST(count(*) AS BIGINT) AS c
  FROM part GROUP BY 1, 2
),
nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM h),
rb AS (SELECT b, CAST(sum(c) AS BIGINT) AS r FROM h GROUP BY 1),
ct AS (SELECT ty, CAST(sum(c) AS BIGINT) AS s FROM h GROUP BY 1),
cells AS (
  SELECT rb.b, ct.ty, CAST(coalesce(h.c, 0) AS BIGINT) AS o,
         CAST(rb.r AS DOUBLE) * ct.s / nn.n AS e
  FROM rb CROSS JOIN ct
  LEFT JOIN h ON h.b = rb.b AND h.ty = ct.ty, nn
),
chi AS (
  SELECT sum(CASE WHEN e > 0 THEN (o - e) * (o - e) / e ELSE 0 END)
           AS chi2
  FROM cells
),
dims AS (
  SELECT CAST((SELECT count(*) FROM rb) AS BIGINT) AS nb,
         CAST((SELECT count(*) FROM ct) AS BIGINT) AS nt
)
SELECT nn.n AS n_parts, dims.nb AS n_brands, dims.nt AS n_types,
       CAST(floor(chi.chi2 * 1000000.0 + 0.5) AS BIGINT) AS chi2_micro,
       CAST(floor(sqrt(chi.chi2 / (CAST(nn.n AS DOUBLE)
                                   * least(dims.nb - 1, dims.nt - 1)))
                  * 1000000.0 + 0.5) AS BIGINT) AS v_micro
FROM nn, chi, dims
WHERE least(dims.nb - 1, dims.nt - 1) > 0"""


QUERIES339 = {
    "users_type_switching": q_users_type_switching,
    "part_brand_type_association": q_part_brand_type_association,
}
