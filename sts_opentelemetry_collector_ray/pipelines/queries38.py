"""Driver-contract queries, wave 38 — interval-union coverage per user (the
span-merge/uptime operator: total covered time of overlapping intervals) and
association-rule lift over market-basket pairs (the recommender co-occurrence
significance metric). Same contract as queries.py: column names AND dtypes
match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES38: dict[str, str] = {}

_IC_USER_BUCKETS = 32
_LIFT_ORDER_BUCKETS = 64
_LIFT_PAIR_BUCKETS = 64
_LIFT_MIN_COUNT = 2


# ---------------------------------------------------------------------------
# events_interval_coverage — union length of per-user time intervals
# ---------------------------------------------------------------------------


def q_events_interval_coverage(sf_dir: str):
    """Interval-union coverage (the span-merge operator behind uptime
    accounting and trace-span dedup): each event opens an interval
    [ts, ts + cents·10ms], and per user the total COVERED time — overlaps
    merged — is the sum over the (start, end, id)-ordered sweep of
    max(0, end − max(start, running-max-of-previous-ends)). All integer
    microseconds, exact.

    ONE bounded user-bucket exchange; per bucket one lexsort + a shifted
    np.maximum.accumulate — the rolling_sum/interarrival idiom with a
    running-max sweep instead of a lag."""

    def prep(t: pa.Table) -> pa.Table:
        tu = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": pa.array(uid),
                "event_id": t["event_id"],
                "s": pa.array(tu),
                "e": pa.array(tu + cents * 10000),  # one cent = 10 ms
                "_b": pa.array((uid % _IC_USER_BUCKETS).astype(np.int32)),
            }
        )

    def coverage(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["user_id", "s", "e", "event_id"], kind="mergesort")
        uid = d["user_id"].to_numpy()
        s = d["s"].to_numpy()
        e = d["e"].to_numpy()
        starts = np.flatnonzero(np.concatenate([[True], uid[1:] != uid[:-1]]))
        # running max of e over preceding rows WITHIN the user (exclusive) —
        # a plain np.maximum.accumulate would leak the previous user's ends
        cummax = d.groupby("user_id", sort=False)["e"].cummax().to_numpy()
        prev = np.empty_like(cummax)
        prev[1:] = cummax[:-1]
        prev[starts] = s[starts]  # first row per user: contribution = e - s
        contrib = np.maximum(e - np.maximum(s, prev), 0)
        sums = np.add.reduceat(contrib, starts)
        counts = np.diff(np.concatenate([starts, [len(d)]]))
        return pd.DataFrame(
            {
                "user_id": uid[starts],
                "covered_us": sums.astype(np.int64),
                "n_events": counts.astype(np.int64),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
        )
        .map_batches(prep, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(
            lambda g: coverage(g.drop(columns=["_b"])), batch_format="pandas"
        )
    )


ORACLES38["events_interval_coverage"] = """
WITH iv AS (
  SELECT user_id, event_id, epoch_us(ts) AS s,
         epoch_us(ts) + CAST(floor(value * 100 + 0.5) AS BIGINT) * 10000 AS e
  FROM events
),
sweep AS (
  SELECT user_id, s, e,
         MAX(e) OVER (PARTITION BY user_id ORDER BY s, e, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
  FROM iv
)
SELECT user_id,
       CAST(SUM(GREATEST(e - GREATEST(s, coalesce(pm, s)), 0)) AS BIGINT)
         AS covered_us,
       count(*) AS n_events
FROM sweep GROUP BY user_id"""


# ---------------------------------------------------------------------------
# basket_pair_lift — association-rule lift for co-occurring part pairs
# ---------------------------------------------------------------------------


def q_basket_pair_lift(sf_dir: str):
    """Association-rule lift (the recommender significance metric):
    lift(a,b) = P(ab)/(P(a)·P(b)) = n_ab·N / (n_a·n_b) over order baskets,
    reported for every pair with n_ab ≥ 2. EXACT integer everywhere — the
    micro-rounded lift uses (2·10⁶·n_ab·N + n_a·n_b) // (2·n_a·n_b), the pure
    integer form of floor(x + 0.5), so no float ever enters the gate.

    Shape: the basket_pairs two-exchange idiom (order-bucket lag-loop pair
    enumeration → pair-hash bucket exact sums); part supports n_a are a
    dimension-sized (part, count) fold broadcast as sorted arrays; the basket
    count N folds from per-bucket distinct-order scalars."""
    import pyarrow.compute as pc

    path = f"{sf_dir}/lineitem.parquet"

    def items_partial(t: pa.Table) -> pa.Table:
        df = t.select(["l_orderkey", "l_partkey"]).to_pandas().drop_duplicates()
        df["_b"] = (df["l_orderkey"].to_numpy() % _LIFT_ORDER_BUCKETS).astype(
            np.int32
        )
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(
            None
        )

    items = (
        ray.data.read_parquet(path, columns=["l_orderkey", "l_partkey"])
        .map_batches(items_partial, batch_format="pyarrow")
        .materialize()  # consumed twice: supports+basket count, pairs
    )

    # supports n_a plus per-bucket distinct-order scalars (sentinel part=-1);
    # orders co-locate per bucket so the order counts sum exactly
    def support_partial(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["l_orderkey", "l_partkey"])
        parts, cnt = np.unique(d["l_partkey"].to_numpy(), return_counts=True)
        return pd.DataFrame(
            {
                "part": np.concatenate([parts, [-1]]).astype(np.int64),
                "cnt": np.concatenate(
                    [cnt, [d["l_orderkey"].nunique()]]
                ).astype(np.int64),
            }
        )

    sup = (
        items.groupby("_b")
        .map_groups(support_partial, batch_format="pandas")
        .to_pandas()  # bounded: ≤ parts + buckets rows
        .groupby("part")["cnt"]
        .sum()
    )
    n_orders = int(sup.loc[-1])
    sup = sup.drop(index=-1)
    sup_keys = sup.index.to_numpy()  # sorted part ids
    sup_cnt = sup.to_numpy().astype(np.int64)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["l_orderkey", "l_partkey"]).sort_values(
            ["l_orderkey", "l_partkey"], kind="mergesort"
        )
        ok = d["l_orderkey"].to_numpy()
        pk = d["l_partkey"].to_numpy()
        n = len(d)
        outs_a, outs_b = [], []
        j = 1
        while j < n:
            same = ok[: n - j] == ok[j:]
            if not same.any():
                break
            outs_a.append(pk[: n - j][same])
            outs_b.append(pk[j:][same])
            j += 1
        if not outs_a:
            return pd.DataFrame(
                {
                    "part_a": np.array([], np.int64),
                    "part_b": np.array([], np.int64),
                    "cnt": np.array([], np.int64),
                    "_pb": np.array([], np.int32),
                }
            )
        df = pd.DataFrame(
            {"part_a": np.concatenate(outs_a), "part_b": np.concatenate(outs_b)}
        )
        out = (
            df.groupby(["part_a", "part_b"], sort=False)
            .size()
            .rename("cnt")
            .reset_index()
        )
        out["cnt"] = out["cnt"].astype(np.int64)
        h = (
            out["part_a"].to_numpy().astype(np.uint64)
            * np.uint64(0x9E3779B97F4A7C15)
        ) ^ out["part_b"].to_numpy().astype(np.uint64)
        out["_pb"] = (h % _LIFT_PAIR_BUCKETS).astype(np.int32)
        return out

    def lift_bucket(g: pd.DataFrame) -> pd.DataFrame:
        agg = (
            g.groupby(["part_a", "part_b"], sort=False)["cnt"].sum().reset_index()
        )
        agg = agg[agg["cnt"] >= _LIFT_MIN_COUNT]
        if not len(agg):
            return pd.DataFrame(
                {
                    "part_a": np.array([], np.int64),
                    "part_b": np.array([], np.int64),
                    "n_ab": np.array([], np.int64),
                    "n_a": np.array([], np.int64),
                    "n_b": np.array([], np.int64),
                    "lift_micro": np.array([], np.int64),
                }
            )
        na = sup_cnt[np.searchsorted(sup_keys, agg["part_a"].to_numpy())]
        nb = sup_cnt[np.searchsorted(sup_keys, agg["part_b"].to_numpy())]
        nab = agg["cnt"].to_numpy().astype(np.int64)
        num = 2 * 1000000 * nab * np.int64(n_orders) + na * nb
        lift_micro = num // (2 * na * nb)  # exact integer floor(x + 0.5)
        return pd.DataFrame(
            {
                "part_a": agg["part_a"].to_numpy().astype(np.int64),
                "part_b": agg["part_b"].to_numpy().astype(np.int64),
                "n_ab": nab,
                "n_a": na.astype(np.int64),
                "n_b": nb.astype(np.int64),
                "lift_micro": lift_micro.astype(np.int64),
            }
        )

    return (
        items.groupby("_b")
        .map_groups(lambda g: pairs(g.drop(columns=["_b"])), batch_format="pandas")
        .groupby("_pb")
        .map_groups(
            lambda g: lift_bucket(g.drop(columns=["_pb"])), batch_format="pandas"
        )
    )


ORACLES38["basket_pair_lift"] = f"""
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM items),
sup AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS cnt FROM items GROUP BY 1),
p AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         CAST(count(*) AS BIGINT) AS n_ab
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= {_LIFT_MIN_COUNT}
)
SELECT p.part_a, p.part_b, p.n_ab, sa.cnt AS n_a, sb.cnt AS n_b,
       (2 * 1000000 * p.n_ab * n.n_orders + sa.cnt * sb.cnt)
         // (2 * sa.cnt * sb.cnt) AS lift_micro
FROM p JOIN sup sa ON sa.l_partkey = p.part_a
       JOIN sup sb ON sb.l_partkey = p.part_b
       CROSS JOIN n"""


QUERIES38 = {
    "events_interval_coverage": q_events_interval_coverage,
    "basket_pair_lift": q_basket_pair_lift,
}
