"""Bucket-count independence for the wave 13-28 operators: the hash-bucket
fan-out is an execution detail, so results must be IDENTICAL under a
different bucket count (catches any operator that accidentally computes
within-bucket-only answers), plus a hot-key skew probe for the basket pair
enumerator's bounded lag loop."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import sts_opentelemetry_collector_ray.pipelines.queries13 as q13
import sts_opentelemetry_collector_ray.pipelines.queries14 as q14
import sts_opentelemetry_collector_ray.pipelines.queries22 as q22
from tests.test_wave_edge_cases import _LINEITEM_SCHEMA, _write

SF = "/root/testdata/sf0.001"


def _run_sorted(fn, sf=SF):
    out = fn(sf)
    import ray.data

    if isinstance(out, ray.data.Dataset):
        out = out.to_pandas()
    cols = sorted(out.columns)
    return out.reindex(cols, axis=1).sort_values(cols).reset_index(drop=True)


@pytest.mark.parametrize(
    "mod,attr,fn_name",
    [
        (q13, "_NUM_BUCKETS", "q_events_rate_cap"),
        (q13, "_NUM_BUCKETS", "q_events_running_total"),
        (q14, "_SPAN_BUCKETS", "q_docs_dup_spans"),
        (q14, "_BASKET_BUCKETS", "q_basket_pairs"),
        (q22, "_MODE_BUCKETS", "q_users_modal_type"),
        (q22, "_WZ_BUCKETS", "q_events_winsorize"),
    ],
)
def test_bucket_count_independence(mod, attr, fn_name, monkeypatch):
    fn = getattr(mod, fn_name)
    base = _run_sorted(fn)
    monkeypatch.setattr(mod, attr, 3)
    alt = _run_sorted(fn)
    assert base.equals(alt), f"{fn_name}: result depends on {attr}"


def test_basket_pairs_hot_order(tmp_path_factory):
    # one 40-item order (lag loop runs 39 bounded vectorized passes) among
    # normal orders — counts must match the exact combinatorial expectation
    d = str(tmp_path_factory.mktemp("hot_lineitem"))
    hot_parts = np.arange(40, dtype=np.int64)
    df = pd.DataFrame(
        {
            "l_orderkey": np.concatenate(
                [np.full(40, 1, dtype=np.int64), [2, 2, 3]]
            ),
            "l_partkey": np.concatenate([hot_parts, [100, 101, 100]]),
        }
    )
    _write(d, "lineitem", df, _LINEITEM_SCHEMA)
    g = _run_sorted(q14.q_basket_pairs, d)
    # top-20 of 40·39/2 = 780 hot pairs (every n == 1 except none): ties break
    # by (part_a, part_b) so the head is (0,1).. deterministic; (100,101) from
    # order 2 also has n == 1 but sorts after the low part ids
    assert len(g) == 20
    assert (g["n"] == 1).all()
    expected_head = [(0, i) for i in range(1, 21)]
    got = sorted(zip(g["part_a"], g["part_b"]))
    assert got == expected_head
