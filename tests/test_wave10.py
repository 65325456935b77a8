"""Wave-10 invariants: skew-aware join, day-of-week pivot, negative sampling."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


class TestSkewJoin:
    def _run(self, probe: pd.DataFrame, build: pd.DataFrame, hot_k: int):
        from sts_opentelemetry_collector_ray.stages.asof import skew_join

        out = skew_join(
            ray.data.from_pandas(probe), ray.data.from_pandas(build),
            probe_key="k", build_key="bk", build_cols=["name"], hot_k=hot_k,
        ).to_pandas()
        if out.empty:  # all-rows-dropped datasets lose their schema in Ray
            return out
        return out.sort_values(["id"]).reset_index(drop=True)

    def test_equals_plain_join_under_skew(self):
        rng = np.random.default_rng(13)
        # one key (7) owns 60% of the probe; key 99 has NO build row
        keys = np.where(rng.random(500) < 0.6, 7, rng.integers(0, 40, 500))
        keys[:5] = 99
        probe = pd.DataFrame(
            {"id": np.arange(500, dtype=np.int64), "k": keys.astype(np.int64)}
        )
        build = pd.DataFrame(
            {"bk": np.arange(41, dtype=np.int64),
             "name": [f"n{i}" for i in range(41)]}
        )
        expect = (
            probe.merge(build, left_on="k", right_on="bk")[["id", "k", "name"]]
            .sort_values("id")
            .reset_index(drop=True)
        )
        for hk in (1, 4):
            out = self._run(probe, build, hot_k=hk)[["id", "k", "name"]]
            pd.testing.assert_frame_equal(out, expect)

    def test_hot_key_without_build_row_drops(self):
        probe = pd.DataFrame(
            {"id": np.arange(20, dtype=np.int64),
             "k": np.full(20, 5, dtype=np.int64)}
        )
        build = pd.DataFrame({"bk": np.array([1], dtype=np.int64), "name": ["x"]})
        out = self._run(probe, build, hot_k=2)
        assert len(out) == 0


class TestPivotDow:
    def test_matches_pandas(self):
        from sts_opentelemetry_collector_ray.stages.analytics import pivot_dow_counts

        rng = np.random.default_rng(2)
        ts = pd.Timestamp("2024-03-01") + pd.to_timedelta(
            rng.integers(0, 28 * 24, 800), unit="h"
        )
        df = pd.DataFrame({"event_type": rng.choice(["a", "b", "c"], 800), "ts": ts})
        out = (
            pivot_dow_counts(ray.data.from_pandas(df))
            .to_pandas()
            .set_index("event_type")
            .sort_index()
        )
        # pandas dayofweek: Monday=0; ours (DuckDB): Sunday=0 → shift
        dow = (df.ts.dt.dayofweek.to_numpy() + 1) % 7
        for et in ("a", "b", "c"):
            m = (df.event_type == et).to_numpy()
            for d in range(7):
                assert out.loc[et, f"dow_{d}"] == int(((dow == d) & m).sum())


class TestNegativeSamples:
    def test_deterministic_no_self_in_range(self):
        from sts_opentelemetry_collector_ray.stages.resample import negative_samples

        df = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64)})
        a = negative_samples(ray.data.from_pandas(df), n_docs=200, k=3).to_pandas()
        b = negative_samples(
            ray.data.from_pandas(df).repartition(7), n_docs=200, k=3
        ).to_pandas()
        a = a.sort_values(["doc_id", "neg_idx"]).reset_index(drop=True)
        b = b.sort_values(["doc_id", "neg_idx"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
        assert len(a) == 600
        assert (a.neg_id != a.doc_id).all()
        assert a.neg_id.between(0, 199).all()
