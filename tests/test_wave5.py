"""Wave-5 operator invariants: sketches (HLL / Count-Min), upsert compaction,
rollup, overlap chunking, reassembly, repeat collapse, weighted sampling,
postings. Value-exactness vs DuckDB is covered by test_queries_vs_oracle; these
pin the semantic contracts and edge cases."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


class TestUpsertLatest:
    def _run(self, rows, **kw):
        from sts_opentelemetry_collector_ray.stages.compact import upsert_latest

        df = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
        )
        df["ts"] = pd.to_datetime(df["ts"], unit="us")
        ds = ray.data.from_pandas(df)
        return (
            upsert_latest(ds, ("user_id", "event_type"), "ts", "event_id", **kw)
            .to_pandas()
            .sort_values(["user_id", "event_type"])
            .reset_index(drop=True)
        )

    def test_latest_wins_and_tie_breaks_on_id(self):
        out = self._run(
            [
                (1, 100, 7, "click", 1.0),
                (2, 200, 7, "click", 2.0),  # newer ts wins
                (9, 300, 8, "view", 3.0),
                (5, 300, 8, "view", 4.0),  # equal ts: higher event_id wins
            ]
        )
        assert out["event_id"].tolist() == [2, 9]
        assert out["value"].tolist() == [2.0, 3.0]

    def test_bucket_count_invariance(self):
        rows = [
            (i, (i * 37) % 500, i % 13, "t%d" % (i % 3), float(i)) for i in range(200)
        ]
        a = self._run(rows, num_buckets=2)
        b = self._run(rows, num_buckets=64)
        pd.testing.assert_frame_equal(a, b)


class TestRollup:
    def test_levels_are_consistent(self):
        from sts_opentelemetry_collector_ray.stages.aggregate import (
            ROLLUP_ALL,
            ROLLUP_ALL_HOUR,
            rollup_hourly,
        )

        df = pd.DataFrame(
            {
                "ts": pd.to_datetime(
                    np.arange(100) * 180_000_000, unit="us"
                ),  # 3-min spacing → 6 hours
                "event_type": ["a", "b"] * 50,
                "value": np.linspace(0.005, 1.0, 100),
            }
        )
        out = rollup_hourly(ray.data.from_pandas(df)).to_pandas()
        finest = out[(out.event_type != ROLLUP_ALL) & (out.hour_us != ROLLUP_ALL_HOUR)]
        lvl1 = out[(out.event_type != ROLLUP_ALL) & (out.hour_us == ROLLUP_ALL_HOUR)]
        lvl0 = out[out.event_type == ROLLUP_ALL]
        assert len(lvl0) == 1
        assert lvl0["n"].iloc[0] == finest["n"].sum() == 100
        assert lvl0["value_cents"].iloc[0] == finest["value_cents"].sum()
        assert set(lvl1.event_type) == {"a", "b"}
        for t in ("a", "b"):
            assert (
                lvl1[lvl1.event_type == t]["n"].iloc[0]
                == finest[finest.event_type == t]["n"].sum()
            )


class TestChunkOverlap:
    def _chunks(self, texts, window=4, stride=3):
        from sts_opentelemetry_collector_ray.stages.pack import chunk_overlap

        ds = ray.data.from_pandas(
            pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        )
        return chunk_overlap(ds, window=window, stride=stride).to_pandas()

    def test_short_doc_is_one_chunk(self):
        out = self._chunks(["a b"], window=4, stride=3)
        assert len(out) == 1
        assert out.chunk_text.iloc[0] == "a b"
        assert out.n_words.iloc[0] == 2

    def test_overlap_content(self):
        out = self._chunks(["w0 w1 w2 w3 w4 w5 w6"], window=4, stride=3)
        assert out.chunk_text.tolist() == ["w0 w1 w2 w3", "w3 w4 w5 w6"]
        assert out.chunk_idx.tolist() == [0, 1]

    def test_tail_chunk_may_be_short(self):
        out = self._chunks(["w0 w1 w2 w3 w4"], window=4, stride=3)
        assert out.chunk_text.tolist() == ["w0 w1 w2 w3", "w3 w4"]
        assert out.n_words.tolist() == [4, 2]


class TestSketches:
    def test_hll_close_to_exact(self):
        from sts_opentelemetry_collector_ray.stages.sketches import hll_distinct

        df = pd.DataFrame(
            {"g": ["x"] * 3000, "k": (np.arange(3000) % 1000).astype(np.int64)}
        )
        out = hll_distinct(ray.data.from_pandas(df), "g", "k").to_pandas()
        est = out.est_distinct.iloc[0]
        assert abs(est - 1000) / 1000 < 0.35  # m=64 → ~13% std error

    def test_hll_small_range_linear_counting(self):
        from sts_opentelemetry_collector_ray.stages.sketches import hll_distinct

        df = pd.DataFrame(
            {"g": ["x"] * 40, "k": (np.arange(40) % 5).astype(np.int64)}
        )
        out = hll_distinct(ray.data.from_pandas(df), "g", "k").to_pandas()
        assert out.n_empty.iloc[0] >= 59
        assert abs(out.est_distinct.iloc[0] - 5) < 2.5

    def test_cms_never_underestimates(self):
        from sts_opentelemetry_collector_ray.stages.sketches import (
            cms_point_estimates,
        )

        counts = np.repeat(np.arange(50, dtype=np.int64), np.arange(50) + 1)
        df = pd.DataFrame({"k": counts})
        out = cms_point_estimates(ray.data.from_pandas(df), "k").to_pandas()
        assert (out.n_est >= out.n_exact).all()
        # d=4 × w=512 on 50 keys: collisions should be rare → mostly exact
        assert (out.n_est == out.n_exact).mean() > 0.9


class TestReassemble:
    def test_restores_turn_order_from_shuffled_input(self):
        from sts_opentelemetry_collector_ray.stages.clusters import (
            reassemble_conversations,
        )

        rows = []
        for conv in ("c1", "c2"):
            for i in range(5):
                rows.append((conv, i, f"{conv}t{i}"))
        df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text"])
        df = df.sample(frac=1.0, random_state=7).reset_index(drop=True)
        out = (
            reassemble_conversations(ray.data.from_pandas(df))
            .to_pandas()
            .sort_values("conv_id")
        )
        assert out.full_text.tolist() == [
            "c1t0 c1t1 c1t2 c1t3 c1t4",
            "c2t0 c2t1 c2t2 c2t3 c2t4",
        ]
        assert out.n_turns.tolist() == [5, 5]


class TestCollapseRepeats:
    def test_runs_collapse(self):
        from sts_opentelemetry_collector_ray.stages.text_analysis import (
            collapse_repeats_batch,
        )

        t = pa.table({"doc_id": [1, 2, 3], "text": ["a a a b a", "x", ""]})
        out = collapse_repeats_batch(t).to_pandas()
        assert out.clean_text.tolist() == ["a b a", "x", ""]
        assert out.n_removed.tolist() == [2, 0, 0]
        assert out.n_words.tolist() == [3, 1, 1]  # '' splits to one empty token

    def test_no_cross_document_collapse(self):
        from sts_opentelemetry_collector_ray.stages.text_analysis import (
            collapse_repeats_batch,
        )

        t = pa.table({"doc_id": [1, 2], "text": ["a b", "b c"]})
        out = collapse_repeats_batch(t).to_pandas()
        assert out.clean_text.tolist() == ["a b", "b c"]


class TestPostingsAndSample:
    def test_postings_only_top_terms(self):
        from sts_opentelemetry_collector_ray.stages.text_analysis import postings_topdf

        texts = ["hot common", "hot rare1", "hot common rare2", "common"]
        ds = ray.data.from_pandas(
            pd.DataFrame({"doc_id": range(4), "text": texts})
        )
        out = postings_topdf(ds, k=2).to_pandas()
        assert set(out.term) == {"hot", "common"}
        assert len(out) == 6  # hot in 3 docs + common in 3 docs
        assert not out.duplicated(["term", "doc_id"]).any()

    def test_weighted_sample_rate_tracks_weight(self):
        from sts_opentelemetry_collector_ray.pipelines.queries5 import (
            q_orders_weighted_sample,
        )

        out = q_orders_weighted_sample("/root/testdata/sf0.001").to_pandas()
        # every kept row records its (integer) threshold, which bounds the
        # keep probability — and high-priced orders dominate the sample
        assert (out.w_threshold >= 1).all()
        assert out.o_totalprice.mean() > 150000
