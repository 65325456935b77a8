"""Driver-contract query implementations + matching DuckDB oracle SQL.

Each public function here backs one ``__ray_entry__.queries()`` entry and has a
matching ANSI-SQL oracle in ``ORACLES`` (DuckDB over the driver's pre-registered
views). Column names and types match between the Ray pipeline and the SQL exactly —
the driver sorts columns by name and value-hashes.

The transcript family runs over the deterministic events→transcripts derivation
(sources/transcripts.py) so the reference semantics — regex parse, rule fan-out with
FNV-1a32 sharding, projection dedup, per-sink aggregate counts — all get value-level
oracles. FNV-1a32 is re-expressed in SQL via ``list_reduce`` over code points
(external ids are ASCII) and matches the engine's vectorized kernel bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..sources.transcripts import (
    TRANSCRIPTS_FROM_EVENTS_SQL,
    derive_transcripts_from_events,
)
from ..stages.aggregate import sink_counts
from ..stages.enrich import ROLE_CLASS, TOOL_INFO, enrich_stage
from ..stages.parse import parse_stage
from ..stages.route import route_stage
from ..pipelines.flagship import routed_dataset

# --------------------------------------------------------------------------
# SQL building blocks
# --------------------------------------------------------------------------

# fnv1a32(s) % 4 as VARCHAR — byte-exact vs functions/hashing.py for ASCII input.
_FNV_SHARD = (
    "CAST(list_reduce(list_prepend(2166136261::BIGINT, "
    "list_transform(string_split({col}, ''), c -> unicode(c)::BIGINT)), "
    "(acc, x) -> (xor(acc, x) * 16777619) % 4294967296) % 4 AS VARCHAR)"
)

_PARSED_SQL = (
    TRANSCRIPTS_FROM_EVENTS_SQL
    + """,
parsed AS (
  SELECT conv_id, turn_idx, role, text, tool, ts,
         coalesce(nullif(regexp_extract(text, '^\\[([A-Z]+)\\]', 1), ''), 'UNKNOWN') AS severity,
         nullif(regexp_extract(text, 'call:([a-z]+)\\(([^)]*)\\)', 0), '') AS tool_sig,
         nullif(regexp_extract(text, 'call:([a-z]+)\\(([^)]*)\\)', 1), '') AS tool_name,
         nullif(regexp_extract(text, 'call:([a-z]+)\\(([^)]*)\\)', 2), '') AS call_arg
  FROM transcripts
)
"""
)

_ROUTES_SQL = (
    _PARSED_SQL
    + """,
routes AS (
  SELECT 'logs_all' AS sink, 'urn:mapping:all-turns' AS data_source, 'CREATE' AS action,
         'urn:turn/' || conv_id || '/' || CAST(turn_idx AS VARCHAR) AS external_id,
         conv_id, turn_idx, role, tool, severity, text
  FROM parsed
  UNION ALL
  SELECT 'logs_errors', 'urn:mapping:error-turns', 'CREATE',
         'urn:conv/' || conv_id || ':turn/' || CAST(turn_idx AS VARCHAR),
         conv_id, turn_idx, role, tool, severity, text
  FROM parsed WHERE severity = 'ERROR'
  UNION ALL
  SELECT 'metrics_tools', 'urn:mapping:tool-calls', 'CREATE',
         'urn:tool/' || tool || '/call/' || conv_id || '/' || CAST(turn_idx AS VARCHAR),
         conv_id, turn_idx, role, tool, severity, CAST(NULL AS VARCHAR)
  FROM parsed WHERE tool <> '' AND role = 'tool'
  UNION ALL
  SELECT 'logs_diag', 'urn:mapping:diag-turns', 'CREATE',
         'urn:diag/' || conv_id || '/' || CAST(turn_idx AS VARCHAR),
         conv_id, turn_idx, role, tool, severity, text
  FROM parsed WHERE severity IN ('WARN', 'DEBUG')
  UNION ALL
  SELECT 'topology_relations', 'urn:mapping:conv-uses-tool', 'CREATE',
         'urn:conv/' || conv_id || '-urn:tool/' || tool,
         conv_id, turn_idx, role, tool, severity, CAST(NULL AS VARCHAR)
  FROM parsed WHERE tool <> ''
  UNION ALL
  SELECT 'logs_all', 'urn:mapping:session-delete', 'DELETE',
         'urn:turn/' || conv_id || '/' || CAST(turn_idx AS VARCHAR),
         conv_id, turn_idx, role, tool, severity, text
  FROM parsed WHERE severity = 'UNKNOWN'
  UNION ALL
  SELECT 'logs_errors', 'urn:mapping:bad-required', 'CREATE',
         NULL, conv_id, turn_idx, role, tool, severity, text
  FROM parsed WHERE severity = 'ERROR'
)
"""
)

_ROUTED_COLS = [
    "sink", "data_source", "action", "external_id", "shard_id",
    "conv_id", "turn_idx", "role", "tool", "severity", "text",
]


# Stopword list as a SQL list literal (shared with stages/text_analysis.py).
from ..stages.text_analysis import STOPWORDS  # noqa: E402

STOP_SQL_LIST = "[" + ", ".join(f"'{w}'" for w in sorted(STOPWORDS)) + "]"


def _sql_case(col: str, mapping: dict[str, str], default: str) -> str:
    arms = " ".join(f"WHEN '{k}' THEN '{v}'" for k, v in mapping.items())
    return f"CASE {col} {arms} ELSE '{default}' END"


# --------------------------------------------------------------------------
# Ray-side queries
# --------------------------------------------------------------------------

def q_transcripts_derive(sf_dir: str):
    """events → transcript table (windowed row_number per conversation)."""
    return derive_transcripts_from_events(sf_dir)


def q_parse_extract(sf_dir: str):
    ds = parse_stage(derive_transcripts_from_events(sf_dir))
    return ds.select_columns(
        ["conv_id", "turn_idx", "severity", "tool_sig", "tool_name", "call_arg"]
    )


def q_enrich_lookup(sf_dir: str):
    ds = enrich_stage(
        parse_stage(derive_transcripts_from_events(sf_dir)), concurrency=2
    )
    return ds.select_columns(
        ["conv_id", "turn_idx", "tool_category", "owner_team", "role_class"]
    )


def q_route_fanout(sf_dir: str):
    ds = routed_dataset(
        derive_transcripts_from_events(sf_dir),
        dedup=False,
        enrich_concurrency=2,
        route_concurrency=None,
    )
    return ds.select_columns(_ROUTED_COLS)


def q_agg_counts(sf_dir: str):
    ds = routed_dataset(
        derive_transcripts_from_events(sf_dir),
        dedup=False,
        enrich_concurrency=2,
        route_concurrency=None,
    )
    return sink_counts(ds)


def q_dedup_relations(sf_dir: str):
    """Projection dedup: relation rows collapse to first turn per (conv, tool)."""
    ds = routed_dataset(
        derive_transcripts_from_events(sf_dir),
        dedup=True,
        enrich_concurrency=2,
        route_concurrency=None,
    )

    def pick(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.equal(t["data_source"], "urn:mapping:conv-uses-tool")
        return t.filter(m).select(["conv_id", "turn_idx", "tool", "external_id"])

    return ds.map_batches(pick, batch_format="pyarrow")


def q_route_computed_action(sf_dir: str):
    """Computed action expressions (M3 full parity): ``action`` is a CEL-lite
    *string expression* evaluated per element. Eval error or a value outside
    {CREATE, DELETE, CONTINUE} ⇒ the element is silently skipped; DELETE is
    terminal-valid only for the LOGS signal (mapping_handler.go:72-121 — the k8s
    watch-event pattern of test/e2e/logtopology_test.go:414-552)."""
    from ..rules.model import ComponentRule

    rules = [
        # LOGS: UNKNOWN severity ⇒ DELETE (tombstone), DEBUG ⇒ unknown action value
        # 'IGNORE' ⇒ silent skip, everything else ⇒ CREATE.
        ComponentRule(
            identifier="urn:mapping:watch-events",
            sink="logs_all",
            action="'DELETE' if severity == 'UNKNOWN' else "
            "('IGNORE' if severity == 'DEBUG' else 'CREATE')",
            identifier_expr="'urn:turn/' + conv_id + '/' + string(turn_idx)",
            type_name_expr="'turn'",
        ).compile(),
        # METRICS: computed DELETE is silently ignored (non-LOGS signal).
        ComponentRule(
            identifier="urn:mapping:metrics-watch",
            signal="METRICS",
            sink="metrics_tools",
            condition="tool != ''",
            action="'DELETE' if severity == 'ERROR' else 'CREATE'",
            identifier_expr="'urn:tool/' + tool",
            type_name_expr="'tool'",
            carry_text=False,
        ).compile(),
    ]
    ds = routed_dataset(
        derive_transcripts_from_events(sf_dir),
        rules=rules,
        dedup=False,
        enrich_concurrency=2,
        route_concurrency=None,
    )
    return ds.select_columns(
        ["sink", "data_source", "action", "external_id", "conv_id", "turn_idx", "severity"]
    )


def q_route_component_outputs(sf_dir: str):
    """Component field-mapping outputs (M7 full parity, mapping.go:65-150):
    additionalIdentifiers (required strict / optional lenient), configuration and
    status Structs as canonical JSON (required wins over optional; non-map ⇒ null
    like toStructValue), version, plus the payload envelope fields expireAfterMs
    and rank.specificity (topo_stream.pb.go:501-714)."""
    import pyarrow.compute as pc

    from ..rules.model import ComponentRule

    rules = [
        ComponentRule(
            identifier="urn:mapping:view-components",
            sink="logs_all",
            condition="severity == 'WARN'",
            expire_after_ms=123_000,
            specificity=250,
            identifier_expr="'urn:view/' + conv_id + '/' + string(turn_idx)",
            type_name_expr="'view'",
            additional_identifiers=["'urn:alt/' + conv_id"],
            optional_additional_identifiers=[
                "'urn:opt/' + tool",
                "'x' + missing_col",  # lenient: omitted, no error row
            ],
            required_configuration="pick(attrs, ['attr.et'])",
            optional_configuration="attrs",  # never reached: required wins
            optional_status="omit(attrs, ['attr.et'])",
            optional_version="'v1.' + tool",
        ).compile(),
    ]
    ds = routed_dataset(
        derive_transcripts_from_events(sf_dir),
        rules=rules,
        dedup=False,
        enrich_concurrency=2,
        route_concurrency=None,
    )

    def ok_rows(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_null(t["error"])).select(
            [
                "external_id", "identifiers", "configuration", "status", "version",
                "expire_after_ms", "specificity", "conv_id", "turn_idx",
            ]
        )

    return ds.map_batches(ok_rows, batch_format="pyarrow")


def q_topology_components(sf_dir: str):
    """K6 URN component hierarchy (topology.go:29-200): namespace / service /
    service-instance / host components with layers and canonical-JSON tags, plus
    provided-by / executes relations, built from resource attribute columns.
    Resource mapping over driver testdata: service.name ← tool, service.namespace
    ← role, service.instance.id & host.id ← the attr.zone token of view rows."""
    import pyarrow.compute as pc

    from ..stages.topology import topology_stage

    ds = parse_stage(derive_transcripts_from_events(sf_dir))

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["tool"], ""))
        zone = pc.struct_field(
            pc.extract_regex(t["text"], r"attr\.zone=(?P<z>\S+)"), "z"
        )
        return pa.table({"svc": t["tool"], "ns": t["role"], "zone": zone})

    src = ds.map_batches(prep, batch_format="pyarrow")
    return topology_stage(
        src,
        {
            "service.name": "svc",
            "service.namespace": "ns",
            "service.instance.id": "zone",
            "host.id": "zone",
        },
    )


def q_urn_expand(sf_dir: str):
    """M18 URN templating through the driver gate: compile once, expand
    vectorized over aligned columns; a missing/empty variable skips the whole
    template (identifier.go:60-77)."""
    from ..functions.urn import UrnTemplate

    tpl = UrnTemplate("urn:conv/${conv_id}:tool/${tool}:k/${call_arg}")
    ds = parse_stage(derive_transcripts_from_events(sf_dir))

    def expand(t: pa.Table) -> pa.Table:
        urn = tpl.expand_columns(
            {
                "conv_id": t["conv_id"].to_numpy(zero_copy_only=False),
                "tool": t["tool"].to_numpy(zero_copy_only=False),
                "call_arg": t["call_arg"].to_numpy(zero_copy_only=False),
            }
        )
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "turn_idx": t["turn_idx"],
                "urn": pa.array(urn, pa.string()),
            }
        )

    return ds.map_batches(expand, batch_format="pyarrow")


def q_topology_connections(sf_dir: str):
    """K6 AddConnection parity (topology.go:203-319): database / asynchronous /
    synchronous connection handling — database components for peer-less DB
    connections, consumer URNs for messaging, instance URNs for sync calls.
    Connection mapping over driver testdata: client ← role, namespaces ←
    'ns-'+name, server ← tool, connection_type by tool (bash → database,
    search → messaging_system, browser → '' = synchronous)."""
    import pyarrow.compute as pc

    from ..stages.topology import connection_topology_stage

    ds = parse_stage(derive_transcripts_from_events(sf_dir))

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["tool"], ""))
        ns_client = pc.binary_join_element_wise("ns-", t["role"], "")
        ns_server = pc.binary_join_element_wise("ns-", t["tool"], "")
        ct = np.select(
            [
                pc.equal(t["tool"], "bash").to_numpy(zero_copy_only=False),
                pc.equal(t["tool"], "search").to_numpy(zero_copy_only=False),
            ],
            ["database", "messaging_system"],
            default="",
        )
        return pa.table(
            {
                "client": t["role"],
                "ns_client": ns_client,
                "server": t["tool"],
                "ns_server": ns_server,
                "ct": pa.array(ct.astype(object), pa.string()),
            }
        )

    src = ds.map_batches(prep, batch_format="pyarrow")
    return connection_topology_stage(
        src,
        {
            "client": "client",
            "client_service.namespace": "ns_client",
            "server": "server",
            "server_service.namespace": "ns_server",
            "connection_type": "ct",
        },
    )


# -- TPC-H-ish operator demos ----------------------------------------------

def q_q1_pricing(sf_dir: str):
    """Grouped aggregation with combiner (A1/A2 analogue) over lineitem."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(t: pa.Table) -> pa.Table:
        disc_price = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        t2 = pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty": t["l_quantity"],
                "base": t["l_extendedprice"],
                "disc_price": disc_price,
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )
        g = t2.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("base", "sum"), ("disc_price", "sum"), ("one", "sum")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "p_qty", "p_base", "p_disc", "p_n"]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("p_qty", alias_name="s_qty"),
        Sum("p_base", alias_name="s_base"),
        Sum("p_disc", alias_name="s_disc"),
        Sum("p_n", alias_name="n"),
    )

    def finalize(t: pa.Table) -> pa.Table:
        # np.round divides by 10^d (exact decimal repr like DuckDB ROUND);
        # pc.round multiplies by 10^-d and lands 1 ulp off (199.42000000000002)
        def r2(col):
            return pa.array(np.round(col.to_numpy(zero_copy_only=False), 2))

        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "sum_qty": r2(t["s_qty"]),
                "sum_base_price": r2(t["s_base"]),
                "sum_disc_price": r2(t["s_disc"]),
                "n": t["n"],
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def q_orders_topk(sf_dir: str):
    """sort + limit + broadcast join (customer is the small side)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )
    top = ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)
    import pyarrow.parquet as pq

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    ).to_pandas()
    lookup = dict(zip(cust["c_custkey"], cust["c_name"]))

    def join(df: pd.DataFrame) -> pd.DataFrame:
        df["c_name"] = df["o_custkey"].map(lookup)
        return df[["o_orderkey", "o_totalprice", "c_name"]]

    return top.map_batches(join, batch_format="pandas")


def q_events_hourly(sf_dir: str):
    """Tumbling-window aggregate: events per (event_type, hour bucket)."""
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        hour = (
            t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False) // 3_600_000_000
        )
        t2 = pa.table(
            {
                "event_type": t["event_type"],
                "hour": pa.array(hour, pa.int64()),
                "value": t["value"],
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )
        g = t2.group_by(["event_type", "hour"]).aggregate([("value", "sum"), ("one", "sum")])
        return g.rename_columns(["event_type", "hour", "p_val", "p_n"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby(["event_type", "hour"]).aggregate(
        Sum("p_val", alias_name="s_val"), Sum("p_n", alias_name="n")
    )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "hour": t["hour"],
                # np.round == DuckDB ROUND bit-for-bit (see q1_pricing finalize)
                "sum_value": pa.array(
                    np.round(t["s_val"].to_numpy(zero_copy_only=False), 2)
                ),
                "n": t["n"],
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Oracle SQL
# --------------------------------------------------------------------------

ORACLES: dict[str, str] = {
    "transcripts_derive": _PARSED_SQL
    + "SELECT conv_id, turn_idx, role, text, tool, ts FROM transcripts",
    "parse_extract": _PARSED_SQL
    + "SELECT conv_id, turn_idx, severity, tool_sig, tool_name, call_arg FROM parsed",
    "enrich_lookup": _PARSED_SQL
    + f"""SELECT conv_id, turn_idx,
       {_sql_case('tool', {k: v[0] for k, v in TOOL_INFO.items()}, 'none')} AS tool_category,
       {_sql_case('tool', {k: v[1] for k, v in TOOL_INFO.items()}, 'none')} AS owner_team,
       {_sql_case('role', ROLE_CLASS, 'unknown')} AS role_class
FROM parsed""",
    "route_fanout": _ROUTES_SQL
    + f"""SELECT sink, data_source, action, external_id,
       CASE WHEN external_id IS NULL THEN 'unknown'
            ELSE {_FNV_SHARD.format(col='external_id')} END AS shard_id,
       conv_id, turn_idx, role, tool, severity, text
FROM routes""",
    "agg_counts": _ROUTES_SQL
    + "SELECT sink, role, tool, count(*) AS n FROM routes GROUP BY sink, role, tool",
    "route_computed_action": _PARSED_SQL
    + """SELECT 'logs_all' AS sink, 'urn:mapping:watch-events' AS data_source,
       CASE WHEN severity = 'UNKNOWN' THEN 'DELETE' ELSE 'CREATE' END AS action,
       'urn:turn/' || conv_id || '/' || CAST(turn_idx AS VARCHAR) AS external_id,
       conv_id, turn_idx, severity
FROM parsed WHERE severity <> 'DEBUG'
UNION ALL
SELECT 'metrics_tools', 'urn:mapping:metrics-watch', 'CREATE',
       'urn:tool/' || tool, conv_id, turn_idx, severity
FROM parsed WHERE tool <> '' AND severity <> 'ERROR'""",
    "route_component_outputs": _PARSED_SQL
    + """SELECT 'urn:view/' || conv_id || '/' || CAST(turn_idx AS VARCHAR) AS external_id,
       '["urn:view/' || conv_id || '/' || CAST(turn_idx AS VARCHAR)
           || '","urn:opt/' || tool || '","urn:alt/' || conv_id || '"]' AS identifiers,
       '{"attr.et":"view"}' AS configuration,
       '{"attr.zone":"' || regexp_extract(text, 'attr\\.zone=(\\S+)', 1) || '"}' AS status,
       'v1.' || tool AS version,
       CAST(123000 AS BIGINT) AS expire_after_ms,
       CAST(250 AS DOUBLE) AS specificity,
       conv_id, turn_idx
FROM parsed WHERE severity = 'WARN' AND contains(text, 'attr.')""",
    "topology_components": _PARSED_SQL
    + """, res AS (
  SELECT DISTINCT tool AS svc, role AS ns,
         nullif(regexp_extract(text, 'attr\\.zone=(\\S+)', 1), '') AS zone
  FROM parsed WHERE tool <> ''
),
comp AS (
  SELECT DISTINCT 'component' AS kind,
         'urn:opentelemetry:namespace/' || ns AS external_id,
         'namespace' AS type_name, ns AS name,
         'urn:stackpack:common:layer:applications' AS layer,
         '' AS domain, '' AS environment, '' AS version,
         '[]' AS identifiers, '{}' AS tags,
         CAST(NULL AS VARCHAR) AS source_id, CAST(NULL AS VARCHAR) AS target_id
  FROM res
  UNION
  SELECT DISTINCT 'component',
         'urn:opentelemetry:namespace/' || ns || ':service/' || svc,
         'service', svc, 'urn:stackpack:common:layer:services',
         '', '', '', '[]',
         '{"service.name":"' || svc || '","service.namespace":"' || ns || '"}',
         NULL, NULL
  FROM res
  UNION
  SELECT DISTINCT 'component',
         'urn:opentelemetry:namespace/' || ns || ':service/' || svc
             || ':serviceInstance/' || coalesce(zone, svc),
         'service-instance', svc || ' - ' || coalesce(zone, 'instance'),
         'urn:stackpack:common:layer:containers', '', '', '', '[]',
         CASE WHEN zone IS NULL
              THEN '{"service.name":"' || svc || '","service.namespace":"' || ns || '"}'
              ELSE '{"host.id":"' || zone || '","service.instance.id":"' || zone
                   || '","service.name":"' || svc || '","service.namespace":"' || ns || '"}'
         END,
         NULL, NULL
  FROM res
  UNION
  SELECT DISTINCT 'component', 'urn:opentelemetry:host/' || zone, 'host', zone,
         'urn:stackpack:common:layer:machines', '', '', '', '[]',
         '{"host.id":"' || zone || '"}', NULL, NULL
  FROM res WHERE zone IS NOT NULL
),
rel AS (
  SELECT DISTINCT 'relation' AS kind, s || '-' || t AS external_id,
         ty AS type_name,
         CAST(NULL AS VARCHAR) AS name, CAST(NULL AS VARCHAR) AS layer,
         CAST(NULL AS VARCHAR) AS domain, CAST(NULL AS VARCHAR) AS environment,
         CAST(NULL AS VARCHAR) AS version, CAST(NULL AS VARCHAR) AS identifiers,
         '{}' AS tags, s AS source_id, t AS target_id
  FROM (
    SELECT 'urn:opentelemetry:namespace/' || ns || ':service/' || svc AS s,
           'urn:opentelemetry:namespace/' || ns || ':service/' || svc
               || ':serviceInstance/' || coalesce(zone, svc) AS t,
           'provided-by' AS ty
    FROM res
    UNION ALL
    SELECT 'urn:opentelemetry:host/' || zone,
           'urn:opentelemetry:namespace/' || ns || ':service/' || svc
               || ':serviceInstance/' || coalesce(zone, svc),
           'executes'
    FROM res WHERE zone IS NOT NULL
  )
)
SELECT * FROM comp UNION ALL SELECT * FROM rel""",
    "topology_connections": _PARSED_SQL
    + """, res AS (SELECT DISTINCT role, tool FROM parsed WHERE tool <> '')
SELECT 'component' AS kind,
       'urn:opentelemetry:namespace/ns-' || role || ':service/' || role
           || ':database/' || tool AS external_id,
       'database' AS type_name, tool AS name,
       'urn:stackpack:common:layer:databases' AS layer,
       '' AS domain, '' AS environment, '' AS version, '[]' AS identifiers,
       '{"service.name":"' || role || '","service.namespace":"ns-' || role || '"}' AS tags,
       CAST(NULL AS VARCHAR) AS source_id, CAST(NULL AS VARCHAR) AS target_id
FROM res WHERE tool = 'bash'
UNION ALL
SELECT 'relation', s || '-' || t, 'database',
       NULL, NULL, NULL, NULL, NULL, NULL, '{}', s, t
FROM (SELECT 'urn:opentelemetry:namespace/ns-' || role || ':service/' || role
                 || ':serviceInstance/' || role AS s,
             'urn:opentelemetry:namespace/ns-' || role || ':service/' || role
                 || ':database/' || tool AS t
      FROM res WHERE tool = 'bash')
UNION ALL
SELECT 'relation', s || '-' || t, 'asynchronous',
       NULL, NULL, NULL, NULL, NULL, NULL, '{}', s, t
FROM (SELECT 'urn:opentelemetry:namespace/ns-' || role || ':service/' || role
                 || ':serviceInstance/' || role AS s,
             'urn:opentelemetry:namespace/ns-' || tool || ':service/' || tool
                 || ':serviceInstance/' || tool AS t
      FROM res WHERE tool = 'search')
UNION ALL
SELECT 'relation', s || '-' || t, 'synchronous',
       NULL, NULL, NULL, NULL, NULL, NULL, '{}', s, t
FROM (SELECT 'urn:opentelemetry:namespace/ns-' || role || ':service/' || role
                 || ':serviceInstance/' || role AS s,
             'urn:opentelemetry:namespace/ns-' || tool || ':service/' || tool
                 || ':serviceInstance/' || tool AS t
      FROM res WHERE tool NOT IN ('bash', 'search'))""",
    "urn_expand": _PARSED_SQL
    + """SELECT conv_id, turn_idx,
       CASE WHEN tool <> '' AND coalesce(call_arg, '') <> ''
            THEN 'urn:conv/' || conv_id || ':tool/' || tool || ':k/' || call_arg
            ELSE NULL END AS urn
FROM parsed""",
    "dedup_relations": _PARSED_SQL
    + """SELECT conv_id, min(turn_idx) AS turn_idx, tool,
       'urn:conv/' || conv_id || '-urn:tool/' || tool AS external_id
FROM parsed WHERE tool <> '' GROUP BY conv_id, tool""",
    "q1_pricing": """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       COUNT(*) AS n
FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "orders_topk": """
SELECT o_orderkey, o_totalprice, c_name
FROM orders JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "events_hourly": """
SELECT event_type,
       CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour,
       ROUND(SUM(value), 2) AS sum_value,
       COUNT(*) AS n
FROM events GROUP BY 1, 2""",
}

QUERIES = {
    "transcripts_derive": q_transcripts_derive,
    "parse_extract": q_parse_extract,
    "enrich_lookup": q_enrich_lookup,
    "route_fanout": q_route_fanout,
    "route_computed_action": q_route_computed_action,
    "route_component_outputs": q_route_component_outputs,
    "topology_components": q_topology_components,
    "topology_connections": q_topology_connections,
    "urn_expand": q_urn_expand,
    "agg_counts": q_agg_counts,
    "dedup_relations": q_dedup_relations,
    "q1_pricing": q_q1_pricing,
    "orders_topk": q_orders_topk,
    "events_hourly": q_events_hourly,
}
