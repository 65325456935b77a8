"""Wave-6 invariants: deterministic uniform sampling, cohort retention,
z-score flags, text normalization."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


class TestUniformSample:
    def _sample(self, df: pd.DataFrame, k: int, blocks: int) -> pd.DataFrame:
        from sts_opentelemetry_collector_ray.stages.analytics import uniform_sample_k

        ds = ray.data.from_pandas(df).repartition(blocks)
        out = uniform_sample_k(ds, "event_id", k, keep_cols=["event_id"]).to_pandas()
        return out.sort_values("event_id").reset_index(drop=True)

    def test_block_layout_independent(self):
        df = pd.DataFrame({"event_id": np.arange(500, dtype=np.int64)})
        a = self._sample(df, 50, 1)
        b = self._sample(df, 50, 7)
        assert len(a) == 50
        pd.testing.assert_frame_equal(a, b)

    def test_k_larger_than_input_returns_all(self):
        df = pd.DataFrame({"event_id": np.arange(10, dtype=np.int64)})
        out = self._sample(df, 50, 2)
        assert sorted(out.event_id) == list(range(10))

    def test_is_prefix_of_larger_k(self):
        # hash-rank sampling nests: the k=20 sample ⊂ the k=60 sample
        df = pd.DataFrame({"event_id": np.arange(300, dtype=np.int64)})
        small = set(self._sample(df, 20, 3).event_id)
        big = set(self._sample(df, 60, 3).event_id)
        assert small <= big


class TestCohortRetention:
    def test_hand_case(self):
        from sts_opentelemetry_collector_ray.stages.analytics import cohort_retention

        day = 86_400_000_000
        base = pd.Timestamp("2024-01-01")
        rows = [  # u1 first day0, back day2; u2 first day0 only; u3 first day2
            (1, base), (1, base + pd.Timedelta(hours=3)),
            (1, base + pd.Timedelta(days=2)),
            (2, base + pd.Timedelta(hours=1)),
            (3, base + pd.Timedelta(days=2)),
        ]
        df = pd.DataFrame(rows, columns=["user_id", "ts"])
        out = (
            cohort_retention(ray.data.from_pandas(df), num_buckets=4)
            .to_pandas()
            .sort_values(["cohort_day_us", "offset_days"])
            .reset_index(drop=True)
        )
        d0 = int(base.value // 1000)
        expect = pd.DataFrame(
            {
                "cohort_day_us": [d0, d0, d0 + 2 * day],
                "offset_days": [0, 2, 0],
                "n_users": [2, 1, 1],
            }
        )
        pd.testing.assert_frame_equal(
            out.astype({"n_users": "int64"}), expect.astype({"n_users": "int64"})
        )

    def test_bucket_count_independent(self):
        from sts_opentelemetry_collector_ray.stages.analytics import cohort_retention

        rng = np.random.default_rng(7)
        df = pd.DataFrame(
            {
                "user_id": rng.integers(0, 40, 400),
                "ts": pd.Timestamp("2024-01-01")
                + pd.to_timedelta(rng.integers(0, 20 * 24, 400), unit="h"),
            }
        )
        outs = [
            cohort_retention(ray.data.from_pandas(df), num_buckets=b)
            .to_pandas()
            .sort_values(["cohort_day_us", "offset_days"])
            .reset_index(drop=True)
            for b in (4, 64)
        ]
        pd.testing.assert_frame_equal(outs[0], outs[1])


class TestZscore:
    def test_hand_case_and_zero_variance(self):
        from sts_opentelemetry_collector_ray.stages.analytics import zscore_flags

        # type a: values 0,10 ×5 each → μ=500c, σ=500c → z=±1, no anomaly;
        # one value 50 → z=(5000-..)/..; type b: constant → σ=0 → NULL z
        vals_a = [0.0] * 5 + [10.0] * 5 + [50.0]
        df = pd.DataFrame(
            {
                "event_id": np.arange(14, dtype=np.int64),
                "event_type": ["a"] * 11 + ["b"] * 3,
                "value": vals_a + [7.0, 7.0, 7.0],
            }
        )
        out = zscore_flags(ray.data.from_pandas(df), "event_type").to_pandas()
        b_rows = out[out.event_type == "b"]
        assert b_rows.zscore.isna().all()
        assert (~b_rows.is_anomaly).all()
        a_rows = out[out.event_type == "a"].set_index("event_id")
        # exact moments: n=11, s=10000c, q=5·1000²+5000²=3.0e7 c²
        s, q, n = 10000.0, 3.0e7, 11
        mu = s / n
        sd = np.sqrt((q - s * s / n) / n)
        z50 = np.floor((5000.0 - mu) / sd * 1e6 + 0.5) / 1e6
        assert a_rows.loc[10, "zscore"] == z50
        assert bool(a_rows.loc[10, "is_anomaly"]) == (abs(z50) > 2.0)
        assert not a_rows.loc[0, "is_anomaly"]


class TestNormalize:
    def test_kernel(self):
        from sts_opentelemetry_collector_ray.stages.text_analysis import (
            normalize_text_batch,
        )

        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": ["  Hello, World!!  ", None, "a--b__c  9"],
            }
        )
        out = normalize_text_batch(t).to_pandas()
        assert out.norm_text.tolist() == ["hello world", "", "a b c 9"]
        assert out.n_chars.tolist() == [11, 0, 7]
