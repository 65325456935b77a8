"""Large-ruleset path (ST1/ST2 at scale): 100 programmatically-generated rules
through the router in one pass, validated against a pandas oracle computed from
the same predicates. The reference's settings snapshots carry hundreds of
mappings (expression.go cache sizing); the router's rule loop must stay
per-RULE-vectorized — wall time should grow ~linearly in rules, not rows×rules
Python calls."""

import numpy as np
import pandas as pd
import pyarrow as pa

from sts_opentelemetry_collector_ray.rules.model import ComponentRule, RelationRule
from sts_opentelemetry_collector_ray.stages.enrich import EnrichActor
from sts_opentelemetry_collector_ray.stages.parse import parse_batch
from sts_opentelemetry_collector_ray.stages.route import Router
from tests.test_stages import turns_table


def _mk_rules(n: int):
    sevs = ["INFO", "WARN", "ERROR", "DEBUG"]
    rules = []
    for i in range(n):
        sev = sevs[i % 4]
        if i % 10 == 9:
            rules.append(
                RelationRule(
                    identifier=f"rel-{i}",
                    sink=f"sink-{i % 7}",
                    condition=f"severity == '{sev}' and tool != ''",
                    source_id_expr="'urn:conv/' + conv_id",
                    target_id_expr="'urn:tool/' + tool",
                    type_name_expr="'uses'",
                    dependency_type_expr="'connection'",
                ).compile()
            )
        else:
            rules.append(
                ComponentRule(
                    identifier=f"comp-{i}",
                    sink=f"sink-{i % 7}",
                    condition=f"severity == '{sev}'" if i % 3 else None,
                    identifier_expr=f"'urn:r{i}/' + conv_id + '/' + string(turn_idx)",
                    type_name_expr=f"'t{i}'",
                ).compile()
            )
    return rules


def test_hundred_rules_route_and_match_oracle():
    rng = np.random.default_rng(7)
    n = 4000
    sevs = np.array(["INFO", "WARN", "ERROR", "DEBUG"])[rng.integers(0, 4, n)]
    tools = np.array(["", "bash", "search"])[rng.integers(0, 3, n)]
    rows = [
        {
            "conv_id": f"c{i % 37}",
            "turn_idx": i,
            "text": f"[{sevs[i]}] x" + (f" call:{tools[i]}(q1)" if tools[i] else ""),
            "tool": tools[i],
            "role": "user",
        }
        for i in range(n)
    ]
    batch = EnrichActor()(parse_batch(turns_table(rows)))
    rules = _mk_rules(100)
    out = Router(rules=rules)(batch)

    df = pd.DataFrame({"severity": sevs, "tool": tools})
    expected = 0
    for i in range(100):
        sev = ["INFO", "WARN", "ERROR", "DEBUG"][i % 4]
        if i % 10 == 9:
            expected += int(((df.severity == sev) & (df.tool != "")).sum())
        elif i % 3:
            expected += int((df.severity == sev).sum())
        else:
            expected += n
    assert out.num_rows == expected
    assert out.column("error").null_count == out.num_rows  # no error rows
    # every rule produced a distinct data_source
    assert len(set(out["data_source"].to_pylist())) == 100
