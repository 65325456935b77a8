"""Edge-case tests for wave-124 operators: ESS bounds (1 ≤ ESS ≤ n_sources,
exactly n_sources at T=1 for a uniform mixture) and latency percentile rank
semantics (ceil(q·n)-th smallest; max ≥ p90 ≥ p50). The value contract itself
is enforced by the parametrized oracle gate (test_queries_vs_oracle)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as entrymod


def test_temperature_ess_uniform_mixture(tmp_path):
    import os

    os.makedirs(tmp_path, exist_ok=True)
    # 3 sources, 4 docs each — perfectly uniform: ESS must equal n_sources at
    # EVERY temperature (power of equal shares stays equal).
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(12, dtype=np.int64),
            "text": ["x"] * 12,
            "lang": ["en"] * 12,
            "source": [f"s{i % 3}" for i in range(12)],
            "n_chars": np.full(12, 1, np.int64),
        }
    )
    t = pa.Table.from_pandas(docs, preserve_index=False).replace_schema_metadata(None)
    pq.write_table(t, f"{tmp_path}/documents.parquet")
    got = entrymod.queries()["docs_temperature_ess"](str(tmp_path))
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    assert (got["n_sources"] == 3).all()
    assert (got["ess_micro"] == 3_000_000).all()


def test_response_latency_rank_order():
    got = entrymod.queries()["tools_response_latency"]("/root/testdata/sf0.001")
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    assert len(got) >= 1
    assert (got["p50_sec"] <= got["p90_sec"]).all()
    assert (got["p90_sec"] <= got["max_sec"]).all()
    assert (got["n_calls"] > 0).all()
