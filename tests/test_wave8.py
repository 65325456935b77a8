"""Wave-8 invariants: TTL re-emit dedup, integer PageRank, exact grouped
quantiles."""

import numpy as np
import pandas as pd
import ray.data


class TestTtlDedup:
    def _run(self, df: pd.DataFrame, ttl_us: int, buckets: int = 4) -> pd.DataFrame:
        from sts_opentelemetry_collector_ray.stages.ttl import ttl_dedup

        out = ttl_dedup(
            ray.data.from_pandas(df), key_cols=["k"], ts_col="ts",
            id_col="event_id", ttl_us=ttl_us, num_buckets=buckets,
        ).to_pandas()
        return out.sort_values(["k", "ts"]).reset_index(drop=True)

    def test_greedy_chain_and_ties(self):
        # ttl=10: key a emits ts0(id1), ts10 (tie -> min id 3), ts25(id5); b both
        df = pd.DataFrame(
            {
                "event_id": np.array([1, 2, 3, 4, 5, 6, 7], dtype=np.int64),
                "k": ["a"] * 5 + ["b"] * 2,
                "ts": np.array([0, 5, 10, 10, 25, 3, 30], dtype=np.int64),
            }
        )
        out = self._run(df, ttl_us=10)
        assert out.event_id.tolist() == [1, 3, 5, 6, 7]

    def _naive(self, df: pd.DataFrame, ttl: int) -> list[int]:
        kept = []
        for _, g in df.sort_values(["k", "ts", "event_id"]).groupby("k"):
            last = None
            for _, r in g.iterrows():
                if last is None or r.ts >= last + ttl:
                    kept.append(int(r.event_id))
                    last = r.ts
        return sorted(kept)

    def test_random_vs_naive_and_bucket_independence(self):
        rng = np.random.default_rng(11)
        df = pd.DataFrame(
            {
                "event_id": np.arange(600, dtype=np.int64),
                "k": rng.integers(0, 25, 600).astype(str),
                "ts": rng.integers(0, 1000, 600).astype(np.int64),
            }
        )
        expect = self._naive(df, 50)
        for b in (1, 8):
            out = self._run(df, ttl_us=50, buckets=b)
            assert sorted(out.event_id.tolist()) == expect

    def test_timestamp_dtype(self):
        df = pd.DataFrame(
            {
                "event_id": np.array([1, 2], dtype=np.int64),
                "k": ["x", "x"],
                "ts": [pd.Timestamp("2024-01-01"),
                       pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=1)],
            }
        )
        out = self._run(df, ttl_us=2_000_000)  # 2s ttl suppresses the second
        assert out.event_id.tolist() == [1]


class TestPagerankInteger:
    def _naive(self, edges: list[tuple[int, int]], iters: int = 10) -> dict[int, int]:
        from sts_opentelemetry_collector_ray.stages.graph import TOTAL

        nodes = sorted({x for e in edges for x in e})
        n = len(nodes)
        deg: dict[int, int] = {}
        for s, _ in edges:
            deg[s] = deg.get(s, 0) + 1
        r = {v: TOTAL // n for v in nodes}
        base = (15 * TOTAL) // (100 * n)
        for _ in range(iters):
            inc = {v: 0 for v in nodes}
            for s, d in edges:
                inc[d] += r[s] // deg[s]
            r = {v: base + (85 * inc[v]) // 100 for v in nodes}
        return r

    def test_matches_naive(self):
        from sts_opentelemetry_collector_ray.stages.graph import pagerank_integer

        rng = np.random.default_rng(5)
        pairs = sorted({(int(a), int(b)) for a, b in
                        zip(rng.integers(0, 30, 200), rng.integers(0, 30, 200))
                        if a != b})
        df = pd.DataFrame(pairs, columns=["src", "dst"]).astype(np.int64)
        out = (
            pagerank_integer(ray.data.from_pandas(df), num_buckets=4)
            .to_pandas()
            .set_index("node")["rank_int"]
            .to_dict()
        )
        assert out == self._naive(pairs)

    def test_sink_accumulates(self):
        """star graph a,b,c → z: z outranks the sources."""
        from sts_opentelemetry_collector_ray.stages.graph import pagerank_integer

        df = pd.DataFrame({"src": [1, 2, 3], "dst": [9, 9, 9]}).astype(np.int64)
        out = (
            pagerank_integer(ray.data.from_pandas(df), num_buckets=2)
            .to_pandas().set_index("node")["rank_int"]
        )
        assert out[9] > out[1] == out[2] == out[3]


class TestGroupedQuantilesExact:
    def test_matches_numpy_disc(self):
        from sts_opentelemetry_collector_ray.stages.quantiles import (
            grouped_quantiles_exact,
        )

        rng = np.random.default_rng(3)
        df = pd.DataFrame(
            {
                "event_type": rng.choice(["x", "y"], 500),
                "value": np.round(rng.uniform(0, 50, 500), 2),
            }
        )
        out = (
            grouped_quantiles_exact(ray.data.from_pandas(df), "value", "event_type")
            .to_pandas()
            .set_index(["event_type", "q_label"])
        )
        for et, g in df.groupby("event_type"):
            cents = np.sort(np.floor(g.value.to_numpy() * 100 + 0.5).astype(np.int64))
            n = len(cents)
            for num, den, label in [(1, 2, "p50"), (9, 10, "p90")]:
                rank = (n * num + den - 1) // den
                assert out.loc[(et, label), "value"] == cents[rank - 1] / 100.0
                assert out.loc[(et, label), "n"] == n
