"""Driver-contract queries, wave 121 — Theil between-group inequality
(revenue concentration across customer nations with the DECOMPOSABLE
inequality index Gini lacks: the market-concentration readout that sums
across levels) and conversation opening roles (which role speaks first per
conversation — the protocol-conformance census for agent logs). Same
contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES121: dict[str, str] = {}

_TH_BUCKETS = 64
_CO_BUCKETS = 32


# ---------------------------------------------------------------------------
# orders_theil_inequality — between-nation Theil index of order revenue
# ---------------------------------------------------------------------------


def q_orders_theil_inequality(sf_dir: str):
    """Between-group Theil: T = Σ_g s_g · ln(s_g / p_g) with s_g = nation
    revenue share and p_g = nation customer-population share — zero when
    revenue tracks population, growing as it concentrates. Cents and counts
    reduce exactly; the ln terms accumulate in FIXED nation-name order (the
    users_entropy technique); released floor-half-up at 1e-6 along with the
    per-nation shares in bp.

    Scale shape: orders resolve custkey→nation through the broadcast
    customer/nation dimensions (`ray.put`, searchsorted); per-batch
    (nation, n, Σcents) partials — |nations| rows per block — fold on the
    driver; population shares come from the dimension itself."""
    import ray
    import pyarrow.parquet as pq_mod

    cust = pq_mod.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    nat = pq_mod.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    ck = cust["c_custkey"].to_numpy().astype(np.int64)
    cn = cust["c_nationkey"].to_numpy().astype(np.int64)
    order = np.argsort(ck, kind="mergesort")
    ck, cn = ck[order], cn[order]
    nk = nat["n_nationkey"].to_numpy().astype(np.int64)
    nname = np.asarray(nat["n_name"].to_numpy(zero_copy_only=False))
    norder = np.argsort(nk, kind="mergesort")
    nk, nname = nk[norder], nname[norder]
    pop = pd.Series(cn).value_counts()  # customers per nationkey
    dims_ref = ray.put((ck, cn))

    def partial(t: pa.Table) -> pd.DataFrame:
        ck_, cn_ = ray.get(dims_ref)
        c = t["o_custkey"].to_numpy().astype(np.int64)
        cents = np.floor(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        idx = np.minimum(np.searchsorted(ck_, c), len(ck_) - 1)
        nkey = cn_[idx]
        g = (
            pd.DataFrame({"nk": nkey, "s": cents})
            .groupby("nk", sort=False)["s"]
            .agg(["size", "sum"])
            .reset_index()
        )
        g.columns = ["nk", "n", "s"]
        return g.astype(np.int64)

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("nk")[["n", "s"]]
        .sum()
    )
    name_of = dict(zip(nk.tolist(), nname.tolist()))
    rev_total = int(part["s"].sum())
    pop_total = int(pop.sum())
    rows = []
    theil = 0.0
    for nkey in sorted(part.index, key=lambda x: name_of[int(x)]):
        s = int(part.loc[nkey, "s"])
        pg = int(pop.get(int(nkey), 0))
        sg = s / rev_total
        pshare = pg / pop_total
        if s > 0 and pg > 0:
            theil = theil + sg * np.log(sg / pshare)
        rows.append(
            {
                "nation": name_of[int(nkey)],
                "rev_share_bp": s * 10_000 // rev_total,
                "pop_share_bp": pg * 10_000 // pop_total,
            }
        )
    out = pd.DataFrame(rows, columns=["nation", "rev_share_bp", "pop_share_bp"])
    out["rev_share_bp"] = out["rev_share_bp"].astype(np.int64)
    out["pop_share_bp"] = out["pop_share_bp"].astype(np.int64)
    out["theil_micro"] = np.int64(int(np.floor(theil * 1_000_000.0 + 0.5)))
    return out


ORACLES121["orders_theil_inequality"] = """
WITH rev AS (
  SELECT n.n_name AS nation,
         CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS HUGEINT))
              AS HUGEINT) AS s,
         CAST(count(*) AS HUGEINT) AS n
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1
),
pop AS (
  SELECT n.n_name AS nation, CAST(count(*) AS HUGEINT) AS pg
  FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1
),
tot AS (SELECT CAST(sum(s) AS HUGEINT) AS rt FROM rev),
ptot AS (SELECT CAST(sum(pg) AS HUGEINT) AS pt FROM pop),
j AS (
  SELECT rev.nation, rev.s, pop.pg, tot.rt, ptot.pt
  FROM rev JOIN pop USING (nation), tot, ptot
),
t AS (
  SELECT floor(coalesce(list_sum(list(
           (CAST(s AS DOUBLE) / CAST(rt AS DOUBLE))
             * ln((CAST(s AS DOUBLE) / CAST(rt AS DOUBLE))
                  / (CAST(pg AS DOUBLE) / CAST(pt AS DOUBLE)))
           ORDER BY nation)), 0.0) * 1000000.0 + 0.5) AS theil
  FROM j WHERE s > 0 AND pg > 0
)
SELECT j.nation,
       CAST(j.s * 10000 // j.rt AS BIGINT) AS rev_share_bp,
       CAST(j.pg * 10000 // j.pt AS BIGINT) AS pop_share_bp,
       CAST(t.theil AS BIGINT) AS theil_micro
FROM j, t"""


# ---------------------------------------------------------------------------
# conv_opening_roles — which role opens each conversation
# ---------------------------------------------------------------------------


def q_conv_opening_roles(sf_dir: str):
    """Protocol census: per role, how many conversations OPEN with it
    (turn_idx = 0 of the derived transcripts) and the share in exact basis
    points — a conversation opening with a tool turn is a protocol smell.

    Scale shape: the transcript derivation already computes turn_idx with
    its bounded conv-bucket exchange; the census is then a per-batch
    filter + (role, n) combiner fold — no extra shuffle."""
    from ..sources.transcripts import derive_transcripts_from_events

    def partial(t: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        m = pc.equal(t["turn_idx"], 0)
        role = np.asarray(t.filter(m)["role"].to_numpy(zero_copy_only=False))
        if len(role) == 0:
            return pd.DataFrame(
                {"role": pd.Series([], dtype=object),
                 "n": pd.Series([], dtype=np.int64)}
            )
        uu, cc = np.unique(role, return_counts=True)
        return pd.DataFrame({"role": uu.astype(object), "n": cc.astype(np.int64)})

    part = (
        derive_transcripts_from_events(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("role")["n"]
        .sum()
        .sort_index()
    )
    total = int(part.sum())
    return pd.DataFrame(
        {
            "role": part.index.to_numpy(object),
            "n_convs": part.to_numpy(np.int64),
            "share_bp": part.to_numpy(np.int64) * 10_000 // max(total, 1),
        }
    )


def _opening_oracle() -> str:
    from ..sources.transcripts import TRANSCRIPTS_FROM_EVENTS_SQL

    return (
        TRANSCRIPTS_FROM_EVENTS_SQL
        + """
, f AS (SELECT role FROM transcripts WHERE turn_idx = 0),
t AS (SELECT count(*) AS n FROM f)
SELECT role, CAST(count(*) AS BIGINT) AS n_convs,
       CAST(count(*) * 10000 // greatest((SELECT n FROM t), 1) AS BIGINT)
         AS share_bp
FROM f GROUP BY role"""
    )


ORACLES121["conv_opening_roles"] = _opening_oracle()


QUERIES121 = {
    "orders_theil_inequality": q_orders_theil_inequality,
    "conv_opening_roles": q_conv_opening_roles,
}
