"""Unit tests for the wave-4 operators: concat-and-chunk sequence packing,
temperature resampling, funnel analysis, and cardinality capping. The
end-to-end oracle equality for each is covered by test_queries_vs_oracle's
parametrization; these pin the semantic contracts on handcrafted inputs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def _docs(texts):
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    )


class TestChunkTokenStream:
    def test_crosses_doc_boundaries(self):
        from sts_opentelemetry_collector_ray.stages.pack import chunk_token_stream

        # 3 docs of 3 tokens with seq_len=4: stream positions 0-2, 3-5, 6-8
        df = (
            chunk_token_stream(_docs(["a b c", "d e f", "g h i"]), seq_len=4)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert df["tok_start"].tolist() == [0, 3, 6]
        # doc 1 spans positions 3-5 → sequences 0 and 1 (crosses the boundary)
        assert df.loc[1, "seq_start"] == 0 and df.loc[1, "seq_end"] == 1
        # doc 2 (positions 6-8) spans sequences 1 and 2
        assert df["n_seqs"].tolist() == [1, 2, 2]

    def test_bucket_count_invariance(self):
        from sts_opentelemetry_collector_ray.stages.pack import chunk_token_stream

        texts = [f"tok {'x ' * (i % 7)}end" for i in range(40)]
        a = (
            chunk_token_stream(_docs(texts), seq_len=8, docs_per_bucket=4)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        b = (
            chunk_token_stream(_docs(texts), seq_len=8, docs_per_bucket=1024)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)

    def test_offsets_are_exclusive_prefix_sums(self):
        from sts_opentelemetry_collector_ray.stages.pack import chunk_token_stream

        texts = ["a", "b b", "c c c"]
        df = (
            chunk_token_stream(_docs(texts), seq_len=2)
            .to_pandas().sort_values("doc_id")
        )
        n = df["n_tokens"].to_numpy()
        assert (df["tok_start"].to_numpy() == np.cumsum(n) - n).all()


class TestTemperatureResample:
    def test_policy_flattens_distribution(self):
        from sts_opentelemetry_collector_ray.stages.resample import (
            temperature_repeats,
        )

        reps = temperature_repeats({"en": 900, "de": 100}, alpha=0.5)
        r_en = reps["en"][0] + reps["en"][1] / 1e6
        r_de = reps["de"][0] + reps["de"][1] / 1e6
        # dominant language drawn down, tail language upweighted
        assert r_en < 1.0 < r_de
        # corpus size approximately preserved
        assert abs(900 * r_en + 100 * r_de - 1000) < 1.0

    def test_alpha_one_is_identity(self):
        from sts_opentelemetry_collector_ray.stages.resample import (
            temperature_repeats,
        )

        reps = temperature_repeats({"en": 700, "de": 300}, alpha=1.0)
        assert reps == {"en": (1, 0), "de": (1, 0)}

    def test_repeat_indices_dense(self):
        from sts_opentelemetry_collector_ray.stages.resample import (
            temperature_resample,
        )

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(50), pa.int64()),
                    "lang": pa.array(["en"] * 40 + ["de"] * 10),
                }
            )
        )
        df = temperature_resample(ds, alpha=0.5).to_pandas()
        for _, g in df.groupby("doc_id"):
            assert sorted(g["repeat_idx"]) == list(range(len(g)))


class TestFunnel:
    def _run(self, rows):
        from sts_opentelemetry_collector_ray.stages.clusters import funnel

        df = pd.DataFrame(rows, columns=["user_id", "event_type", "ts"])
        df["ts"] = pd.to_datetime(df["ts"])
        return (
            funnel(ray.data.from_pandas(df), num_buckets=4)
            .to_pandas()
            .set_index("user_id")
        )

    def test_strict_ordering_and_depth(self):
        t = "2026-01-01T00:00:0"
        out = self._run(
            [
                (1, "view", t + "1"), (1, "click", t + "2"), (1, "purchase", t + "3"),
                (2, "view", t + "2"), (2, "click", t + "1"),  # click BEFORE view
                (3, "click", t + "1"),  # never entered the funnel
            ]
        )
        assert out.loc[1, "steps_completed"] == 3
        assert out.loc[2, "steps_completed"] == 1
        assert 3 not in out.index

    def test_equal_timestamps_do_not_chain(self):
        t = "2026-01-01T00:00:01"
        out = self._run([(1, "view", t), (1, "click", t)])
        assert out.loc[1, "steps_completed"] == 1

    def test_earliest_chain_wins(self):
        t = "2026-01-01T00:00:0"
        # click at t2 chains from the t1 view even though a later view exists
        out = self._run(
            [(1, "view", t + "5"), (1, "view", t + "1"), (1, "click", t + "2")]
        )
        assert out.loc[1, "steps_completed"] == 2
        assert out.loc[1, "ts_last_us"] == pd.Timestamp(t + "2").value // 1000


class TestCardinalityCap:
    def test_cap_and_overflow_fold(self):
        from sts_opentelemetry_collector_ray.stages.aggregate import (
            OVERFLOW_ATTR,
            cardinality_cap,
        )

        rows = []
        for i in range(10):
            rows += [("m", f"attr{i:02d}")] * (10 - i)  # attr00 most frequent
        ds = ray.data.from_pandas(
            pd.DataFrame(rows, columns=["role", "conv_id"])
        )
        df = cardinality_cap(ds, "role", "conv_id", k=3).to_pandas()
        assert len(df) == 4  # 3 kept + overflow
        kept = set(df[df["conv_id"] != OVERFLOW_ATTR]["conv_id"])
        assert kept == {"attr00", "attr01", "attr02"}
        # overflow holds the exact sum of the folded tail: 7+6+...+1
        assert int(df[df["conv_id"] == OVERFLOW_ATTR]["n"].iloc[0]) == sum(
            range(1, 8)
        )
        assert int(df["n"].sum()) == len(rows)

    def test_tie_break_is_attr_ascending(self):
        from sts_opentelemetry_collector_ray.stages.aggregate import (
            OVERFLOW_ATTR,
            cardinality_cap,
        )

        rows = [("m", a) for a in ["b", "a", "c", "d"]]  # all counts equal
        ds = ray.data.from_pandas(
            pd.DataFrame(rows, columns=["role", "conv_id"])
        )
        df = cardinality_cap(ds, "role", "conv_id", k=2).to_pandas()
        kept = set(df[df["conv_id"] != OVERFLOW_ATTR]["conv_id"])
        assert kept == {"a", "b"}
