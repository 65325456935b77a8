"""Wave-9 invariants: snapshot diff, global row numbering, percentile rank."""

import numpy as np
import pandas as pd
import ray.data


class TestSnapshotDiff:
    def _run(self, old: pd.DataFrame, new: pd.DataFrame, buckets: int = 4):
        from sts_opentelemetry_collector_ray.stages.compact import snapshot_diff

        out = snapshot_diff(
            ray.data.from_pandas(old), ray.data.from_pandas(new),
            num_buckets=buckets,
        ).to_pandas()
        if out.empty:  # all-buckets-empty datasets lose their schema in Ray
            return out
        return out.sort_values("doc_id").reset_index(drop=True)

    def test_hand_case(self):
        old = pd.DataFrame(
            {"doc_id": np.array([1, 2, 3, 4], dtype=np.int64),
             "content_h": np.array([10, 20, 30, 40], dtype=np.int64)}
        )
        new = pd.DataFrame(
            {"doc_id": np.array([2, 3, 4, 5], dtype=np.int64),
             "content_h": np.array([20, 31, 40, 50], dtype=np.int64)}
        )
        out = self._run(old, new)
        assert out.doc_id.tolist() == [1, 3, 5]
        assert out.change.tolist() == ["removed", "changed", "added"]

    def test_bucket_independence_and_identical(self):
        df = pd.DataFrame(
            {"doc_id": np.arange(100, dtype=np.int64),
             "content_h": np.arange(100, dtype=np.int64) * 7}
        )
        for b in (1, 16):
            out = self._run(df, df.copy(), buckets=b)
            assert len(out) == 0


class TestGlobalRowNumber:
    def test_dense_and_ordered(self):
        from sts_opentelemetry_collector_ray.stages.analytics import global_row_number

        rng = np.random.default_rng(9)
        ids = rng.permutation(300).astype(np.int64)
        df = pd.DataFrame(
            {"doc_id": ids, "lang": np.where(ids % 3 == 0, "de", "en")}
        )
        for w in (16, 4096):
            out = (
                global_row_number(
                    ray.data.from_pandas(df), group_col="lang",
                    id_col="doc_id", range_width=w,
                )
                .to_pandas()
                .sort_values(["lang", "doc_id"])
                .reset_index(drop=True)
            )
            # row_num is exactly the (lang, doc_id) sort position, dense 0..N-1
            assert out.row_num.tolist() == list(range(len(df)))


class TestPercentileRank:
    def test_matches_naive(self):
        from sts_opentelemetry_collector_ray.stages.analytics import percentile_rank

        rng = np.random.default_rng(4)
        df = pd.DataFrame(
            {
                "event_id": np.arange(400, dtype=np.int64),
                "event_type": rng.choice(["a", "b"], 400),
                "value": np.round(rng.uniform(0, 20, 400), 2),
            }
        )
        out = (
            percentile_rank(ray.data.from_pandas(df))
            .to_pandas()
            .set_index("event_id")
        )
        cents = np.floor(df.value.to_numpy() * 100 + 0.5).astype(np.int64)
        for et in ("a", "b"):
            m = (df.event_type == et).to_numpy()
            kc = cents[m]
            n = int(m.sum())
            for eid, c in zip(df.event_id.to_numpy()[m], kc):
                expect = (1_000_000 * int((kc < c).sum())) // n
                assert out.loc[eid, "pr_micro"] == expect
        # min of each key is 0; max is < 1e6
        assert out.pr_micro.min() == 0 and out.pr_micro.max() < 1_000_000
