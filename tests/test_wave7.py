"""Wave-7 invariants: hashed n-gram classifier, DSIR importance weights,
byte entropy, HTML strip, keep-best near-dup dedup."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from sts_opentelemetry_collector_ray.functions.hashing import fnv1a32


class TestHashClassifier:
    def _naive(self, text: str) -> tuple[int, int]:
        """Row-at-a-time reference scorer (what the kernel must equal)."""
        from sts_opentelemetry_collector_ray.stages.classify import (
            CLASSIFIER_BUCKETS,
            classifier_weights,
        )

        w = classifier_weights()
        toks = (text or "").split(" ")
        feats = [f"u:{t}" for t in toks] + [
            f"b:{a} {b}" for a, b in zip(toks, toks[1:])
        ]
        score = sum(int(w[fnv1a32(f) % CLASSIFIER_BUCKETS]) for f in feats)
        return len(feats), score

    def test_matches_naive(self):
        from sts_opentelemetry_collector_ray.stages.classify import (
            hash_classifier_batch,
        )

        texts = ["the quick brown fox", "", "one", "a a a a", None, "x y x y x"]
        t = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        out = hash_classifier_batch(t).to_pandas().set_index("doc_id")
        for i, txt in enumerate(texts):
            n_feat, score = self._naive(txt or "")
            assert out.loc[i, "n_feat"] == n_feat, (i, txt)
            assert out.loc[i, "score_int"] == score, (i, txt)
            assert bool(out.loc[i, "quality_pass"]) == (score > 0)


class TestDsir:
    def test_hand_case(self):
        """Target-only tokens must get positive lambda mass relative to
        raw-only tokens; scores replayed against a naive fit."""
        from sts_opentelemetry_collector_ray.stages.classify import (
            DSIR_BUCKETS,
            _dsir_lambdas,
            dsir_pipeline,
        )

        df = pd.DataFrame(
            {
                "doc_id": np.arange(4, dtype=np.int64),
                "text": ["alpha alpha beta", "alpha beta", "zeta zeta", "zeta"],
                "lang": ["en", "en", "de", "de"],
            }
        )
        out = (
            dsir_pipeline(ray.data.from_pandas(df), target_lang="en")
            .to_pandas()
            .set_index("doc_id")
        )
        # naive fit
        cnt_raw = np.zeros(DSIR_BUCKETS)
        cnt_tgt = np.zeros(DSIR_BUCKETS)
        for _, row in df.iterrows():
            for w in row.text.split(" "):
                b = fnv1a32(w) % DSIR_BUCKETS
                cnt_raw[b] += 1
                if row.lang == "en":
                    cnt_tgt[b] += 1
        lam = _dsir_lambdas(cnt_raw, cnt_tgt)
        for _, row in df.iterrows():
            exp = sum(int(lam[fnv1a32(w) % DSIR_BUCKETS]) for w in row.text.split(" "))
            assert out.loc[row.doc_id, "dsir_micro"] == exp
            assert out.loc[row.doc_id, "n_tok"] == len(row.text.split(" "))
        # en docs (alpha/beta-heavy) must outscore de docs per token
        assert (
            out.loc[0, "dsir_micro"] / out.loc[0, "n_tok"]
            > out.loc[2, "dsir_micro"] / out.loc[2, "n_tok"]
        )


class TestEntropy:
    def test_known_values(self):
        from sts_opentelemetry_collector_ray.stages.text_analysis import entropy_batch

        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": ["aaaa", "ab", "", None],
            }
        )
        out = entropy_batch(t).to_pandas().set_index("doc_id")
        assert out.loc[1, "entropy_micro"] == 0
        # two chars, p=0.5 each: term = floor(0.5*ln2*1e6 + .5) twice
        term = math.floor(0.5 * math.log(2.0) * 1e6 + 0.5)
        assert out.loc[2, "entropy_micro"] == 2 * term
        assert pd.isna(out.loc[3, "entropy_micro"])
        assert pd.isna(out.loc[4, "entropy_micro"])
        assert out.n_bytes.tolist() == [4, 2, 0, 0]

    def test_sliced_batch_offsets(self):
        """The zero-copy byte view must honor a non-zero buffer offset."""
        from sts_opentelemetry_collector_ray.stages.text_analysis import entropy_batch

        full = pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": ["zzzz", "aaaa", "ab"],
            }
        )
        sliced = full.slice(1)
        out = entropy_batch(sliced).to_pandas()
        assert out.entropy_micro.tolist()[0] == 0
        term = math.floor(0.5 * math.log(2.0) * 1e6 + 0.5)
        assert out.entropy_micro.tolist()[1] == 2 * term


class TestHtmlStrip:
    def test_kernel(self):
        from sts_opentelemetry_collector_ray.stages.text_analysis import (
            html_strip_batch,
        )

        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": [
                    "<p>Hello <b>world</b>!</p>&nbsp;&#39;s end",
                    "no markup here",
                    None,
                ],
            }
        )
        out = html_strip_batch(t).to_pandas()
        assert out.clean_text.tolist() == ["Hello world ! s end", "no markup here", ""]
        assert out.n_chars.tolist() == [19, 14, 0]


class TestNeardupBest:
    def test_elects_best_member(self):
        """Known near-dup corpus: per cluster the longest doc (tie → min id)
        survives; singletons survive unchanged. Verified against a naive
        union-find + election over the SAME pair list."""
        from sts_opentelemetry_collector_ray.stages.dedup_docs import (
            minhash_lsh_pairs,
            neardup_best_docs,
        )

        base = "the quick brown fox jumps over the lazy dog and runs far away " * 4
        texts = [
            base,
            base + "extra tail words here",  # near-dup of 0, longer → wins
            base + "extra tail words here",  # identical to 1, higher id loses tie
            "completely different content about databases and query engines " * 4,
            "another unrelated document concerning maritime navigation charts " * 4,
        ]
        df = pd.DataFrame(
            {
                "doc_id": np.arange(5, dtype=np.int64),
                "text": texts,
                "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
            }
        )
        ds = ray.data.from_pandas(df)
        kept = sorted(
            neardup_best_docs(ds, jaccard_threshold=0.5)
            .to_pandas()["doc_id"]
            .tolist()
        )
        # naive: union-find over the pipeline's own pair list, elect max-len/min-id
        pairs = minhash_lsh_pairs(ds, jaccard_threshold=0.5).to_pandas()
        parent = {int(i): int(i) for i in df.doc_id}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for _, r in pairs.iterrows():
            parent[find(int(r.a))] = find(int(r.b))
        clusters: dict[int, list[int]] = {}
        for i in df.doc_id:
            clusters.setdefault(find(int(i)), []).append(int(i))
        expect = sorted(
            min(members, key=lambda i: (-len(texts[i]), i))
            for members in clusters.values()
        )
        assert kept == expect
        assert 1 in kept and 2 not in kept  # tie broken toward the lower id
