"""Text analysis operators for large-scale training-data pipelines.

Beyond the reference's own operator set (SURVEY.md §2), these are the text-side
components a 100 TB corpus pipeline needs: language ID, quality scoring, token
counting, and document fingerprinting — each a vectorized `map_batches` stage over
the `documents` table (or any string column).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import ray.data

STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been it this that for on with as".split()
)

_WS = re.compile(r"\s+")


def token_count_batch(t: pa.Table, col: str = "text") -> pa.Table:
    """Whitespace token count (vectorized via Arrow split + list_value_length)."""
    import pyarrow.compute as pc

    toks = pc.split_pattern_regex(t[col], r"\s+")
    # splitting " a" yields a leading empty string — count non-empty elements to
    # match the SQL oracle's list_filter(x -> x <> ''). Per-list empty counts via
    # one np.add.reduceat over the flattened values — no per-row loop.
    counts = (
        pc.fill_null(pc.list_value_length(toks), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    flat = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    empty = pc.equal(flat.flatten(), "").to_numpy(zero_copy_only=False).astype(np.int64)
    nonempty = counts.copy()
    nz = counts > 0
    if nz.any() and len(empty):
        starts = np.concatenate([[0], np.cumsum(counts[nz])[:-1]]).astype(np.int64)
        nonempty[nz] = counts[nz] - np.add.reduceat(empty, starts)
    return t.append_column("n_tokens", pa.array(nonempty, pa.int64()))


# Gopher-style document quality rules (published heuristics from Rae et al. 2021,
# "Scaling Language Models: ... Gopher", appendix A1.1 — word-count bounds, mean
# word length bounds, symbol-to-word ratios, and stop-word evidence). Thresholds
# below follow the paper; the operator emits the per-rule flags AND the combined
# keep decision so downstream filtering stays explainable.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_HASH_RATIO = 0.1  # '#' symbols per word
GOPHER_MAX_ELLIPSIS_RATIO = 0.1  # '...' per word
GOPHER_MIN_STOPWORDS = 2  # distinct required stop words present
GOPHER_STOP_EVIDENCE = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_batch(t: pa.Table, col: str = "text") -> pa.Table:
    """Vectorized Gopher quality rules: per-rule boolean flags + combined keep."""
    import pyarrow.compute as pc

    text = t[col]
    toks = pc.split_pattern_regex(text, r"\s+")
    flat = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    values = flat.flatten()
    lens = pc.binary_length(values).to_numpy(zero_copy_only=False).astype(np.int64)
    counts = (
        pc.fill_null(pc.list_value_length(toks), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    nonempty = pc.not_equal(values, "").to_numpy(zero_copy_only=False)
    n = len(t)
    word_count = np.zeros(n, dtype=np.int64)
    len_sum = np.zeros(n, dtype=np.int64)
    nz = counts > 0
    if nz.any() and len(lens):
        starts = np.concatenate([[0], np.cumsum(counts[nz])[:-1]]).astype(np.int64)
        word_count[nz] = np.add.reduceat(nonempty.astype(np.int64), starts)
        len_sum[nz] = np.add.reduceat(lens * nonempty, starts)
    mean_len = len_sum / np.maximum(word_count, 1)

    def _count(pattern: str) -> np.ndarray:
        return (
            pc.count_substring(text, pattern)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )

    hashes = _count("#")
    ellipses = _count("...")
    wc_safe = np.maximum(word_count, 1)
    lower = pc.utf8_lower(text)
    stop_hits = np.zeros(n, dtype=np.int64)
    for w in GOPHER_STOP_EVIDENCE:
        stop_hits += (
            pc.match_substring_regex(lower, rf"\b{w}\b")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )

    ok_words = (word_count >= GOPHER_MIN_WORDS) & (word_count <= GOPHER_MAX_WORDS)
    ok_mean = (mean_len >= GOPHER_MIN_MEAN_WORD_LEN) & (mean_len <= GOPHER_MAX_MEAN_WORD_LEN)
    ok_hash = hashes / wc_safe <= GOPHER_MAX_HASH_RATIO
    ok_ellipsis = ellipses / wc_safe <= GOPHER_MAX_ELLIPSIS_RATIO
    ok_stop = stop_hits >= GOPHER_MIN_STOPWORDS
    keep = ok_words & ok_mean & ok_hash & ok_ellipsis & ok_stop
    out = t.append_column("word_count", pa.array(word_count, pa.int64()))
    out = out.append_column("ok_word_count", pa.array(ok_words))
    out = out.append_column("ok_mean_word_len", pa.array(ok_mean))
    out = out.append_column("ok_symbol_ratio", pa.array(ok_hash & ok_ellipsis))
    out = out.append_column("ok_stopwords", pa.array(ok_stop))
    out = out.append_column("keep", pa.array(keep))
    return out


_STOPWORD_VALUE_SET = pa.array(sorted(STOPWORDS), pa.string())


def quality_score_batch(t: pa.Table, col: str = "text") -> pa.Table:
    """Length / punctuation / stopword heuristics (round-6 ratios for the oracle).

    Fully vectorized: Arrow split + `is_in` membership off the flattened token
    values, per-row sums via one `np.add.reduceat` — the same kernel shape as
    `gopher_quality_batch`; no per-row Python on the path."""
    import pyarrow.compute as pc

    text = t[col]
    n_chars = pc.utf8_length(text)
    n_punct = pc.list_value_length(pc.split_pattern_regex(text, r"[.!?,;:]"))
    # number of punctuation chars = split parts - 1
    punct = pc.subtract(n_punct, 1)
    toks = pc.split_pattern_regex(pc.utf8_lower(text), r"\s+")
    flat = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    values = flat.flatten()
    counts = (
        pc.fill_null(pc.list_value_length(toks), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    # regex split keeps boundary empty strings; pandas .str.split() dropped
    # them, so tokens = non-empty elements (matches the SQL list_filter oracle)
    nonempty = pc.not_equal(values, "").to_numpy(zero_copy_only=False)
    is_stop = pc.is_in(values, value_set=_STOPWORD_VALUE_SET).to_numpy(
        zero_copy_only=False
    )
    n = len(t)
    n_tok = np.zeros(n, dtype=np.int64)
    n_stop = np.zeros(n, dtype=np.int64)
    nz = counts > 0
    if nz.any() and len(values):
        starts = np.concatenate([[0], np.cumsum(counts[nz])[:-1]]).astype(np.int64)
        n_tok[nz] = np.add.reduceat(nonempty.astype(np.int64), starts)
        n_stop[nz] = np.add.reduceat((is_stop & nonempty).astype(np.int64), starts)
    punct_ratio = np.round(
        punct.to_numpy(zero_copy_only=False)
        / np.maximum(1, n_chars.to_numpy(zero_copy_only=False)),
        6,
    )
    stop_ratio = np.round(n_stop / np.maximum(1, n_tok), 6)
    out = t.append_column("n_chars_actual", pc.cast(n_chars, pa.int64()))
    out = out.append_column("punct_ratio", pa.array(punct_ratio, pa.float64()))
    out = out.append_column("stopword_ratio", pa.array(stop_ratio, pa.float64()))
    return out


def fingerprint_batch(t: pa.Table, col: str = "text") -> pa.Table:
    """Polynomial rolling hash of the UTF-8 bytes, base 131 mod 2^31-1 — a
    deterministic document fingerprint reproducible in SQL (list_reduce)."""
    from ..functions.hashing import _arrow_string_bytes

    arr = t[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    data, starts, lens = _arrow_string_bytes(arr)
    n = len(starts)
    acc = np.zeros(n, dtype=np.int64)
    width = int(lens.max()) if n else 0
    guard = max(len(data) - 1, 0)
    for pos in range(width):
        live = pos < lens
        idx = np.minimum(starts + pos, guard)
        b = data[idx].astype(np.int64) if len(data) else np.zeros(n, np.int64)
        acc = np.where(live, (acc * 131 + b) % 2147483647, acc)
    return t.append_column("fingerprint", pa.array(acc, pa.int64()))


# n-gram language ID: cosine-free heuristic — score = fraction of a document's
# character trigrams present in each language profile; deterministic profiles
# derived from stopword seeds so no external model is needed.
_LANG_SEEDS = {
    "en": "the and of to in is that it was for on are with as his they at be this",
    "es": "el la de que y en los se del las por un con una su para es al lo como",
    "de": "der die und in den von zu das mit sich des auf ist im dem nicht ein",
    "fr": "le de la et les des en un du une que est pour qui dans par sur au plus",
    "zh": "de le shi zai he you wo ta men zhe ge shang xia bu liao dou hui dui neng",
}


def _profiles() -> dict[str, frozenset]:
    out = {}
    for lang, seed in _LANG_SEEDS.items():
        grams = set()
        s = f" {seed} "
        for i in range(len(s) - 2):
            grams.add(s[i : i + 3])
        out[lang] = frozenset(grams)
    return out


class LangIdActor:
    """Actor-pool language ID: profiles built once per actor (the model-load
    pattern — ST1/ST2 analogue for an actual model)."""

    def __init__(self):
        self.profiles = _profiles()

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t["text"].to_numpy(zero_copy_only=False)
        langs = np.empty(len(texts), dtype=object)
        scores = np.zeros(len(texts), dtype=np.float64)
        for i, txt in enumerate(texts):
            s = f" {str(txt).lower()} "
            grams = {s[j : j + 3] for j in range(len(s) - 2)}
            best_lang, best = "und", 0.0
            for lang, prof in self.profiles.items():
                if not grams:
                    continue
                score = len(grams & prof) / len(grams)
                if score > best:
                    best_lang, best = lang, score
            langs[i] = best_lang
            # half-AWAY-from-zero at 6 decimals (DuckDB ROUND semantics; Python
            # round() is half-even and flips exact ties like 9/128 = 0.0703125)
            scores[i] = np.floor(best * 1e6 + 0.5) / 1e6
        out = t.append_column("lang_pred", pa.array(langs, pa.string()))
        return out.append_column("lang_score", pa.array(scores, pa.float64()))


def lang_id_stage(ds: "ray.data.Dataset", concurrency: int = 4) -> "ray.data.Dataset":
    return ds.map_batches(
        LangIdActor, batch_format="pyarrow", concurrency=(1, concurrency), num_cpus=0.5
    )


def repetition_batch(t: pa.Table, col: str = "text") -> pa.Table:
    """Gopher-style repetition signals (Rae et al. 2021, appendix A1.1's
    "repetition" family re-expressed over word n-grams): per document,

    - ``dup_word_frac``     — 1 − distinct/total words (repeated-token mass)
    - ``top_2gram_count``   — occurrences of the most frequent word bigram
    - ``top_2gram_frac``    — 2 · top_2gram_count / n_tokens (word coverage of
      the dominant bigram; the count-based analogue of the paper's
      top-2-gram character fraction)

    Whole-batch kernels: one split, flat (row, token) / (row, bigram) Arrow
    ``group_by`` counts, per-row maxima — no per-document Python. Scores use
    the repo's half-away-from-zero 6-decimal rule so DuckDB ROUND replays
    them exactly.
    """
    import pyarrow.compute as pc

    toks = pc.split_pattern(pc.fill_null(t[col], ""), " ")
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = toks.flatten()
    n = len(counts)
    row_idx = np.repeat(np.arange(n, dtype=np.int64), counts)

    # distinct words per row: group_by (row, token) → group_by row
    pairs = pa.table({"r": pa.array(row_idx), "w": flat})
    d = pairs.group_by(["r", "w"]).aggregate([]).group_by(["r"]).aggregate([("w", "count")])
    n_distinct = np.zeros(n, dtype=np.int64)
    n_distinct[d["r"].to_numpy()] = d["w_count"].to_numpy()
    with np.errstate(divide="ignore", invalid="ignore"):
        dup_frac = np.where(counts > 0, 1.0 - n_distinct / np.maximum(counts, 1), 0.0)

    # bigrams: adjacent flat tokens within the same row
    ok = row_idx[:-1] == row_idx[1:] if len(row_idx) > 1 else np.zeros(0, dtype=bool)
    top_cnt = np.zeros(n, dtype=np.int64)
    if ok.any():
        sel = pa.array(ok)
        left = flat.slice(0, len(flat) - 1).filter(sel)
        right = flat.slice(1).filter(sel)
        bg = pc.binary_join_element_wise(left, right, " ")
        br = pa.array(row_idx[:-1][ok])
        bp = pa.table({"r": br, "g": bg})
        cnt = bp.group_by(["r", "g"]).aggregate([("g", "count")])
        mx = cnt.group_by(["r"]).aggregate([("g_count", "max")])
        top_cnt[mx["r"].to_numpy()] = mx["g_count_max"].to_numpy()
    with np.errstate(divide="ignore", invalid="ignore"):
        top_frac = np.where(counts > 0, 2.0 * top_cnt / np.maximum(counts, 1), 0.0)

    out = t.append_column("n_tokens", pa.array(counts, pa.int64()))
    out = out.append_column(
        "dup_word_frac", pa.array(np.floor(dup_frac * 1e6 + 0.5) / 1e6, pa.float64())
    )
    out = out.append_column("top_2gram_count", pa.array(top_cnt, pa.int64()))
    return out.append_column(
        "top_2gram_frac", pa.array(np.floor(top_frac * 1e6 + 0.5) / 1e6, pa.float64())
    )


def lm_score_pipeline(ds: "ray.data.Dataset", col: str = "text") -> "ray.data.Dataset":
    """CCNet-style LM quality score without an external model: a bigram LM with
    add-one smoothing is FIT ON THE CORPUS ITSELF (two passes, the perplexity-
    filter recipe of Wenzek et al. 2020 re-expressed self-contained):

    pass 1 — bigram + unigram counts: per-batch Arrow group_by combiners →
    one bounded hash aggregate (|vocab| and |vocab|² ceilings, tiny vs corpus)
    → broadcast via ray.put;
    pass 2 — per doc, mean ln P(wᵢ | wᵢ₋₁) over its transitions with
    P = (c(w₁w₂)+1) / (c(w₁)+V) — vectorized: one index_in per batch against
    the broadcast tables, np.add.reduceat per-doc sums.

    Output: (doc_id…, n_trans, lm_score) — lm_score null when a doc has no
    transition (<2 tokens); higher (closer to 0) = more in-distribution.
    """
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    def _tok(t: pa.Table):
        toks = pc.split_pattern(pc.fill_null(t[col], ""), " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        return toks.flatten(), counts

    def _bigrams(flat, counts):
        row_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        ok = row_idx[:-1] == row_idx[1:] if len(row_idx) > 1 else np.zeros(0, dtype=bool)
        sel = pa.array(ok)
        left = flat.slice(0, max(len(flat) - 1, 0)).filter(sel)
        right = flat.slice(1).filter(sel)
        return left, right, ok, row_idx

    def uni_counts(t: pa.Table) -> pa.Table:
        flat, _ = _tok(t)
        g = pa.table({"w": flat}).group_by(["w"]).aggregate([([], "count_all")])
        return g.rename_columns(["w", "pn"])

    def bi_counts(t: pa.Table) -> pa.Table:
        flat, counts = _tok(t)
        left, right, _, _ = _bigrams(flat, counts)
        bg = pc.binary_join_element_wise(left, right, " ")
        g = pa.table({"b": bg}).group_by(["b"]).aggregate([([], "count_all")])
        return g.rename_columns(["b", "pn"])

    uni = (
        ds.map_batches(uni_counts, batch_format="pyarrow")
        .groupby("w").aggregate(Sum("pn", alias_name="n")).to_pandas()
    )
    bi = (
        ds.map_batches(bi_counts, batch_format="pyarrow")
        .groupby("b").aggregate(Sum("pn", alias_name="n")).to_pandas()
    )
    V = len(uni)
    model = ray.put(
        (
            pa.array(uni["w"], pa.string()),
            uni["n"].to_numpy(dtype=np.float64),
            pa.array(bi["b"], pa.string()),
            bi["n"].to_numpy(dtype=np.float64),
            float(V),
        )
    )

    def score(t: pa.Table) -> pa.Table:
        uw, un, bw, bn, v = ray.get(model)
        flat, counts = _tok(t)
        left, right, ok, row_idx = _bigrams(flat, counts)
        bg = pc.binary_join_element_wise(left, right, " ")
        bi_idx = pc.index_in(bg, value_set=bw).to_numpy(zero_copy_only=False)
        c_bi = np.where(np.isnan(bi_idx.astype(float)), 0.0, bn[np.nan_to_num(bi_idx).astype(np.int64)])
        u_idx = pc.index_in(left, value_set=uw).to_numpy(zero_copy_only=False)
        c_u = np.where(np.isnan(u_idx.astype(float)), 0.0, un[np.nan_to_num(u_idx).astype(np.int64)])
        logp = np.log((c_bi + 1.0) / (c_u + v))
        n_trans = np.maximum(counts - 1, 0)
        sums = np.zeros(len(counts), dtype=np.float64)
        nz = n_trans > 0
        if nz.any() and len(logp):
            starts = np.concatenate([[0], np.cumsum(n_trans[nz])[:-1]]).astype(np.int64)
            sums[nz] = np.add.reduceat(logp, starts)
        mean = np.where(nz, sums / np.maximum(n_trans, 1), np.nan)
        mean = np.floor(mean * 1e6 + 0.5) / 1e6
        out = t.append_column("n_trans", pa.array(n_trans, pa.int64()))
        return out.append_column(
            "lm_score", pa.array(np.where(nz, mean, np.nan), pa.float64(), from_pandas=True)
        )

    return ds.map_batches(score, batch_format="pyarrow")


def collapse_repeats_batch(t: pa.Table, col: str = "text") -> pa.Table:
    """Consecutive-duplicate-token collapse — the "thanks thanks thanks" web-text
    normalization (a C4-family cleanup that RE2 cannot express because it needs a
    backreference; done here as a flat word-stream mask instead). Keeps the first
    of every run of identical adjacent words; output (doc_id, clean_text, n_words,
    n_removed). Pure map_batches kernel: one split, one boundary mask over the
    flattened stream, one binary_join — no per-row Python."""
    import pyarrow.compute as pc

    text = t[col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    words = pc.split_pattern(pc.fill_null(text, ""), " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    counts = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(words)
    n_rows = len(text)
    m = len(flat)
    row_id = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
    keep = np.ones(m, dtype=bool)
    if m > 1:
        same_row = row_id[1:] == row_id[:-1]
        same_word = pc.equal(flat.slice(1), flat.slice(0, m - 1)).to_numpy(
            zero_copy_only=False
        )
        keep[1:] = ~(same_row & same_word)
    kept_counts = np.bincount(row_id[keep], minlength=n_rows).astype(np.int64)
    # rows with empty text keep their single '' token, so kept_counts >= 1
    offs = np.concatenate(([0], np.cumsum(kept_counts))).astype(np.int32)
    clean = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(offs, pa.int32()), flat.filter(pa.array(keep))),
        " ",
    )
    return pa.table(
        {
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "clean_text": clean,
            "n_words": pa.array(kept_counts),
            "n_removed": pa.array(counts - kept_counts),
        }
    )


def postings_topdf(
    ds: "ray.data.Dataset", k: int = 50
) -> "ray.data.Dataset":
    """Inverted-index build, bounded to the k highest-document-frequency terms:
    (term, doc_id) posting pairs for every term in the top-k by (df desc, term
    asc). Two streaming passes: (1) document frequency via the per-batch
    DISTINCT (doc, term) combiner → hash aggregate over the bounded vocabulary
    → tiny sort+limit, broadcast as a set; (2) re-tokenize and emit only pairs
    whose term is in the keep set. Postings stream straight to the sink — the
    index build never materializes."""
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    def distinct_pairs(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(pc.fill_null(t["text"], ""), " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        counts = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(words)
        did = pc.cast(t["doc_id"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        pairs = (
            pa.table({"doc_id": pa.array(np.repeat(did, counts)), "term": flat})
            .filter(pc.not_equal(pc.field("term"), ""))
            .group_by(["doc_id", "term"])
            .aggregate([])
        )
        return pairs

    def df_partial(t: pa.Table) -> pa.Table:
        g = distinct_pairs(t).group_by(["term"]).aggregate([([], "count_all")])
        return g.rename_columns(["term", "pn"])

    top = (
        ds.map_batches(df_partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("pn", alias_name="n"))
        .sort(["n", "term"], descending=[True, False])
        .limit(k)
        .to_pandas()  # bounded: k rows
    )
    keep_ref = ray.put(set(top["term"]))

    def emit(t: pa.Table) -> pa.Table:
        keep = ray.get(keep_ref)
        pairs = distinct_pairs(t)
        mask = pc.is_in(pairs["term"], value_set=pa.array(sorted(keep), pa.string()))
        out = pairs.filter(mask)
        return out.select(["term", "doc_id"])

    return ds.map_batches(emit, batch_format="pyarrow")


def normalize_text_batch(t: pa.Table, col: str = "text") -> pa.Table:
    """Canonical text form for dedup keys (every dedup pipeline normalizes
    before hashing — cf. Lee et al. 2021 §3): lowercase, non-alphanumerics →
    space, runs of spaces collapsed, ends trimmed. All Arrow RE2 kernels, zero
    shuffles; DuckDB replays with lower + regexp_replace(..., 'g') on the same
    RE2 engine, so the bytes match exactly."""
    import pyarrow.compute as pc

    txt = pc.fill_null(t[col], "")
    low = pc.utf8_lower(txt)
    alnum = pc.replace_substring_regex(low, r"[^a-z0-9 ]+", " ")
    one = pc.replace_substring_regex(alnum, r" +", " ")
    norm = pc.utf8_trim(one, " ")
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "norm_text": norm,
            "n_chars": pc.cast(pc.utf8_length(norm), pa.int64()),
        }
    )


def entropy_batch(t: pa.Table, col: str = "text") -> pa.Table:
    """Byte-level Shannon entropy per document — the classic gibberish /
    compressibility quality signal (low entropy = repeated filler, high =
    random noise; cf. the entropy filters in CCNet-family cleanups).

    Whole-batch kernel: the UTF-8 bytes are read ZERO-COPY off the Arrow
    buffers (functions/hashing.py::_arrow_string_bytes), one np.bincount over
    (doc_idx * 256 + byte) builds every per-doc histogram at once, and the
    -p·ln p terms are summed as integer MICRO-NATS (floor(x*1e6 + .5) per
    (doc, byte) term) so the result is order-independent and exactly
    SQL-replayable. Empty/null docs get a NULL entropy. For the ASCII corpora
    this engine tests on, byte-level == character-level, which is what the
    DuckDB oracle computes."""
    import pyarrow.compute as pc

    from ..functions.hashing import _arrow_string_bytes

    txt = pc.fill_null(t[col], "")
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    data, starts, lens = _arrow_string_bytes(txt)
    n = len(lens)
    h_micro = np.zeros(n, dtype=np.int64)
    if n and lens.sum():
        doc_of_byte = np.repeat(np.arange(n, dtype=np.int64), lens)
        # string offsets are contiguous by construction: the batch's bytes are
        # one dense region starting at starts[0]
        used = data[starts[0] : starts[0] + int(lens.sum())].astype(np.int64)
        key = doc_of_byte * 256 + used
        counts = np.bincount(key, minlength=n * 256).reshape(n, 256)
        ln = np.maximum(lens, 1).astype(np.float64)[:, None]
        with np.errstate(divide="ignore", invalid="ignore"):
            term = np.where(counts > 0, (counts / ln) * np.log(ln / counts), 0.0)
        h_micro = np.floor(term * 1e6 + 0.5).astype(np.int64).sum(axis=1)
    nz = lens > 0
    ent = pa.array(h_micro, pa.int64())
    if not nz.all():
        ent = pa.Array.from_pandas(
            np.where(nz, h_micro.astype(float), np.nan), type=pa.int64()
        )
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "n_bytes": pa.array(lens, pa.int64()),
            "entropy_micro": ent,
        }
    )


def html_strip_batch(t: pa.Table, col: str = "text") -> pa.Table:
    """Boilerplate strip for web-crawl text: drop <...> tags, decode-or-drop
    HTML entities (&amp; &#39; ...), collapse whitespace runs, trim. All Arrow
    RE2 kernels (replace_substring_regex), zero shuffles — the first stage of
    every web-scale text pipeline (C4/CCNet run exactly this shape before any
    quality pass). DuckDB replays the same patterns with regexp_replace 'g'."""
    import pyarrow.compute as pc

    txt = pc.fill_null(t[col], "")
    no_tag = pc.replace_substring_regex(txt, r"<[^>]*>", " ")
    no_ent = pc.replace_substring_regex(no_tag, r"&[a-zA-Z]+;|&#[0-9]+;", " ")
    one = pc.replace_substring_regex(no_ent, r"[ \t\r\n]+", " ")
    clean = pc.utf8_trim(one, " ")
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "clean_text": clean,
            "n_chars": pc.cast(pc.utf8_length(clean), pa.int64()),
        }
    )
