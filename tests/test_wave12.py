"""Wave-12 invariants: bloom semi-join, exact distinct, changelog apply,
JSON extraction."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


class TestBloomSemijoin:
    def test_equals_exact_semijoin(self):
        from sts_opentelemetry_collector_ray.stages.asof import bloom_semijoin

        rng = np.random.default_rng(21)
        probe = pd.DataFrame(
            {
                "pk": np.arange(400, dtype=np.int64),
                "payload": rng.integers(0, 100, 400).astype(np.int64),
            }
        )
        right = pd.DataFrame(
            {"rk": np.repeat(rng.choice(400, 60, replace=False), 3).astype(np.int64)}
        )
        out = (
            bloom_semijoin(
                ray.data.from_pandas(probe), ray.data.from_pandas(right),
                probe_key="pk", right_key="rk",
            )
            .to_pandas()
            .sort_values("pk")
            .reset_index(drop=True)
        )
        expect = (
            probe[probe.pk.isin(set(right.rk))]
            .sort_values("pk")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out, expect)

    def test_tiny_filter_false_positives_still_exact(self):
        """n_bits=64 forces bloom false positives; the verify join must kill
        every one of them."""
        from sts_opentelemetry_collector_ray.stages.asof import bloom_semijoin

        probe = pd.DataFrame({"pk": np.arange(300, dtype=np.int64)})
        right = pd.DataFrame({"rk": np.array([5, 6], dtype=np.int64)})
        out = (
            bloom_semijoin(
                ray.data.from_pandas(probe), ray.data.from_pandas(right),
                probe_key="pk", right_key="rk", n_bits=64, k=2,
            )
            .to_pandas()
            .sort_values("pk")
            .reset_index(drop=True)
        )
        assert out.pk.tolist() == [5, 6]


class TestJsonExtract:
    def test_kernel_null_on_miss(self):
        m = pc.extract_regex(
            pa.array(['{"k": 42}', "{}", None]).cast(pa.string()),
            r'"k": (?P<v>[0-9]+)',
        )
        v = pc.cast(pc.struct_field(m, "v"), pa.int64())
        assert v.to_pylist() == [42, None, None]


class TestChangelogApply:
    def test_tombstone_deletes_key(self):
        from sts_opentelemetry_collector_ray.pipelines.queries12 import (
            q_events_changelog_apply,  # noqa: F401 — exercised via oracle sweep
        )
        from sts_opentelemetry_collector_ray.stages.compact import upsert_latest

        df = pd.DataFrame(
            {
                "event_id": np.arange(6, dtype=np.int64),
                "user_id": np.array([1, 1, 2, 2, 3, 3], dtype=np.int64),
                "event_type": ["click", "error", "error", "click", "click", "click"],
                "ts": np.array([10, 20, 10, 20, 10, 20], dtype=np.int64),
                "value": np.arange(6, dtype=np.float64),
            }
        )
        latest = upsert_latest(ray.data.from_pandas(df), key_cols=("user_id",),
                               num_buckets=4).to_pandas()
        alive = latest[latest.event_type != "error"].sort_values("user_id")
        # user 1's latest is a tombstone -> gone; users 2 and 3 survive
        assert alive.user_id.tolist() == [2, 3]
        assert alive.event_id.tolist() == [3, 5]
