"""Topology exporter component building (K6) — URN component hierarchy from
resource attributes.

Re-expresses the reference's ComponentsCollection (reference:
exporter/ststopologyexporter/internal/topology.go:29-209): each resource with a
``service.name`` yields a namespace / service / service-instance component chain
(layers applications/services/containers), an optional host | function | task
component (host.id | faas.id | aws.ecs.task.id, first match wins —
topology.go:110-166), an optional k8s pod component with a secondary
``urn:kubernetes:...`` identifier (topology.go:168-200), and the relations
service→instance ``provided-by``, host→instance ``executes``, pod→instance
``kubernetes-to-otel`` (topology.go:322-334). Output is sorted by external id
(GetComponents/GetRelations, topology.go:335-355).

Scale design — three stages, no high-cardinality groups:

1. **Distinct-resources combiner** (per batch, Arrow ``group_by``): resource attr
   combos repeat massively (every turn of a service re-emits the same resource),
   so each batch first collapses to its distinct attr tuples. Only distinct
   combos cross the wire.
2. **Per-distinct build** (Python over the few distinct combos — the same
   per-resource loop the reference runs, but per *distinct* resource).
3. **Bounded bucket dedup**: hash(external_id) % B exchange, then one vectorized
   sort + first-wins per bucket. Conflicting payloads for the same external id
   resolve to the lexicographic minimum of the serialized row — deterministic
   and order-free, where the reference's in-memory map is arrival-order
   last-wins (arrival order is meaningless in a distributed batch run).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..rules.expr import canonical_json

TOPOLOGY_SCHEMA = pa.schema(
    [
        ("kind", pa.string()),  # 'component' | 'relation'
        ("external_id", pa.string()),
        ("type_name", pa.string()),
        ("name", pa.string()),
        ("layer", pa.string()),
        ("domain", pa.string()),
        ("environment", pa.string()),
        ("version", pa.string()),
        ("identifiers", pa.string()),  # canonical JSON list (pod secondary URN)
        ("tags", pa.string()),  # canonical JSON map
        ("source_id", pa.string()),
        ("target_id", pa.string()),
    ]
)

_LAYER_APPLICATIONS = "urn:stackpack:common:layer:applications"
_LAYER_SERVICES = "urn:stackpack:common:layer:services"
_LAYER_CONTAINERS = "urn:stackpack:common:layer:containers"
_LAYER_MACHINES = "urn:stackpack:common:layer:machines"
_LAYER_SERVERLESS = "urn:stackpack:common:layer:serverless"
_LAYER_DATABASES = "urn:stackpack:common:layer:databases"


def _component(external_id, type_name, name, layer, tags, version="", environment="", identifiers=()):
    return {
        "kind": "component",
        "external_id": external_id,
        "type_name": type_name,
        "name": name,
        "layer": layer,
        "domain": "",
        "environment": environment,
        "version": version,
        "identifiers": canonical_json(list(identifiers)),
        "tags": canonical_json(tags),
        "source_id": None,
        "target_id": None,
    }


def _relation(source_id, target_id, type_name):
    # relation external id = "<src>-<tgt>" (topology.go:322-334)
    return {
        "kind": "relation",
        "external_id": f"{source_id}-{target_id}",
        "type_name": type_name,
        "name": None,
        "layer": None,
        "domain": None,
        "environment": None,
        "version": None,
        "identifiers": None,
        "tags": canonical_json({}),
        "source_id": source_id,
        "target_id": target_id,
    }


def _scope_env_tags(attrs: dict) -> tuple[dict, str]:
    """withScope + withEnvironment (topology.go:410-440): k8s cluster/namespace
    scope tags and the deployment.environment tag; returns (tags, environment)."""
    tags: dict = {}
    cluster = attrs.get("k8s.cluster.name")
    if cluster:
        tags["cluster-name"] = cluster
        ns = attrs.get("k8s.namespace.name")
        if ns:
            tags["namespace"] = ns
            tags["k8s-scope"] = f"{cluster}/{ns}"
    env = attrs.get("deployment.environment", "")
    if env:
        tags["deployment.environment"] = env
    return tags, env


def _prefix_tags(attrs: dict, *prefixes: str) -> dict:
    return {k: v for k, v in attrs.items() if any(k.startswith(p) for p in prefixes)}


def add_resource(attrs: dict) -> list[dict]:
    """One resource attr map → component/relation rows (topology.go:29-200).
    Returns [] when ``service.name`` is absent (AddResource's false path)."""
    service = attrs.get("service.name")
    if not service:
        return []
    namespace = attrs.get("service.namespace") or "default"
    instance_id = attrs.get("service.instance.id")
    if instance_id:
        instance_name = f"{service} - {instance_id}"
    else:
        instance_id = service
        instance_name = f"{service} - instance"

    rows: list[dict] = []
    scope_tags, env = _scope_env_tags(attrs)

    ns_urn = f"urn:opentelemetry:namespace/{namespace}"
    rows.append(
        _component(ns_urn, "namespace", namespace, _LAYER_APPLICATIONS,
                   dict(scope_tags), environment=env)
    )

    svc_urn = f"{ns_urn}:service/{service}"
    svc_tags = dict(scope_tags)
    svc_tags["service.name"] = service
    svc_tags["service.namespace"] = namespace
    if attrs.get("service.version"):
        svc_tags["service.version"] = attrs["service.version"]
    svc_tags.update(_prefix_tags(attrs, "telemetry.sdk"))
    rows.append(
        _component(svc_urn, "service", service, _LAYER_SERVICES, svc_tags,
                   version=attrs.get("service.version", ""), environment=env)
    )

    inst_urn = f"{svc_urn}:serviceInstance/{instance_id}"
    inst_tags = dict(scope_tags)
    inst_tags["service.namespace"] = namespace
    for k, v in attrs.items():  # withTags: every attr not already present
        inst_tags.setdefault(k, v)
    rows.append(
        _component(inst_urn, "service-instance", instance_name, _LAYER_CONTAINERS,
                   inst_tags, version=attrs.get("service.version", ""), environment=env)
    )
    rows.append(_relation(svc_urn, inst_urn, "provided-by"))

    # host | function | task — first match wins (topology.go:110-166)
    env_tag = {"deployment.environment": env} if env else {}
    if attrs.get("host.id"):
        host = attrs["host.id"]
        urn = f"urn:opentelemetry:host/{host}"
        tags = {**env_tag, **_prefix_tags(attrs, "os", "host", "cloud", "azure", "gcp")}
        rows.append(_component(urn, "host", host, _LAYER_MACHINES, tags, environment=env))
        rows.append(_relation(urn, inst_urn, "executes"))
    elif attrs.get("faas.id"):
        faas = attrs["faas.id"]
        urn = f"urn:opentelemetry:function/{faas}"
        tags = {**env_tag, **_prefix_tags(attrs, "faas", "cloud")}
        rows.append(
            _component(urn, "function", faas, _LAYER_SERVERLESS, tags,
                       version=attrs.get("faas.version", ""), environment=env)
        )
        rows.append(_relation(urn, inst_urn, "executes"))
    elif attrs.get("aws.ecs.task.id"):
        task = attrs["aws.ecs.task.id"]
        urn = f"urn:opentelemetry:task/{task}"
        tags = {**env_tag, **_prefix_tags(attrs, "aws.ecs", "cloud")}
        rows.append(_component(urn, "task", task, _LAYER_SERVERLESS, tags, environment=env))
        rows.append(_relation(urn, inst_urn, "executes"))

    # k8s pod with secondary urn:kubernetes identifier (topology.go:168-200)
    k8s = [attrs.get(k) for k in ("k8s.cluster.name", "k8s.namespace.name", "k8s.pod.name")]
    if all(k8s):
        cluster, k8s_ns, pod = k8s
        pod_urn = f"urn:opentelemetry:kubernetes:/{cluster}:{k8s_ns}:pod/{pod}"
        alt = f"urn:kubernetes:/{cluster}:{k8s_ns}:pod/{pod}"
        rows.append(
            _component(pod_urn, "pod", pod, "", dict(scope_tags), identifiers=[alt])
        )
        rows.append(_relation(pod_urn, inst_urn, "kubernetes-to-otel"))
    return rows


def add_connection(attrs: dict) -> list[dict]:
    """One connection attr map → relation (+ database component) rows
    (topology.go:203-319 AddConnection). Required: client,
    client_service.namespace, server, connection_type ('' → synchronous,
    'messaging_system' → asynchronous, 'database' → database, anything else →
    skip). Database connections without a peer service create the
    per-client database component; async consumers require
    server_service.namespace; a peer service redirects the target to the
    peer's service URN (and, for async, adds consumer→peer)."""
    req = {}
    for key in ("client", "client_service.namespace", "server", "connection_type"):
        if key not in attrs:  # all four must be PRESENT ('' is a present value)
            return []
        req[key] = attrs[key]
    ct_raw = req["connection_type"]
    if ct_raw == "":
        conn_type = "synchronous"
    elif ct_raw == "messaging_system":
        conn_type = "asynchronous"
    elif ct_raw == "database":
        conn_type = "database"
    else:
        return []

    ns = req["client_service.namespace"]
    client_instance = attrs.get("client_service.instance.id") or req["client"]
    source_id = (
        f"urn:opentelemetry:namespace/{ns}:service/{req['client']}"
        f":serviceInstance/{client_instance}"
    )
    peer = attrs.get("client_peer.service")
    rows: list[dict] = []

    if conn_type == "database":
        if peer:
            target_id = f"urn:opentelemetry:namespace/{ns}:service/{peer}"
        else:
            target_id = (
                f"urn:opentelemetry:namespace/{ns}:service/{req['client']}"
                f":database/{req['server']}"
            )
            rows.append(
                _component(
                    target_id, "database", req["server"], _LAYER_DATABASES,
                    {"service.namespace": ns, "service.name": req["client"]},
                )
            )
    elif conn_type == "asynchronous":
        consumer_ns = attrs.get("server_service.namespace")
        if consumer_ns is None:
            return []
        consumer_instance = attrs.get("server_service.instance.id") or req["server"]
        consumer_id = (
            f"urn:opentelemetry:namespace/{consumer_ns}:service/{req['server']}"
            f":serviceInstance/{consumer_instance}"
        )
        if peer:
            target_id = f"urn:opentelemetry:namespace/{ns}:service/{peer}"
            rows.append(_relation(consumer_id, target_id, conn_type))
        else:
            target_id = consumer_id
    else:  # synchronous
        server_ns = attrs.get("server_service.namespace")
        if server_ns is None:
            return []
        server_instance = attrs.get("server_service.instance.id") or req["server"]
        target_id = (
            f"urn:opentelemetry:namespace/{server_ns}:service/{req['server']}"
            f":serviceInstance/{server_instance}"
        )

    rows.append(_relation(source_id, target_id, conn_type))
    return rows


def connection_topology_stage(
    ds: "ray.data.Dataset",
    attr_cols: dict[str, str],
    num_buckets: int = 16,
) -> "ray.data.Dataset":
    """AddConnection over attribute COLUMNS — same three-stage shape as
    `topology_stage` (distinct-combiner → per-distinct build → bucket dedup)."""
    keys = list(attr_cols)
    cols = [attr_cols[k] for k in keys]

    def distinct_conns(t: pa.Table) -> pa.Table:
        sub = t.select(cols).rename_columns(keys)
        return sub.group_by(keys).aggregate([])

    def build(t: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for rec in t.to_pylist():
            attrs = {k: v for k, v in rec.items() if v is not None}
            # connection_type may legitimately be '' (synchronous)
            rows.extend(add_connection(attrs))
        if not rows:
            return TOPOLOGY_SCHEMA.empty_table()
        return _first_per_id(pa.Table.from_pylist(rows, schema=TOPOLOGY_SCHEMA))

    def bucketize(t: pa.Table) -> pa.Table:
        from ..functions.hashing import fnv1a32_arrow

        b = (
            fnv1a32_arrow(t["external_id"].combine_chunks()) % np.uint64(num_buckets)
        ).astype(np.int32)
        return t.append_column("_bucket", pa.array(b, pa.int32()))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_bucket"])
        df = df.sort_values(list(df.columns), kind="mergesort")
        return df.drop_duplicates(["kind", "external_id"], keep="first")

    d = ds.map_batches(distinct_conns, batch_format="pyarrow")
    built = d.map_batches(build, batch_format="pyarrow").map_batches(
        bucketize, batch_format="pyarrow"
    )
    return built.groupby("_bucket").map_groups(per_bucket, batch_format="pandas")


def topology_stage(
    ds: "ray.data.Dataset",
    attr_cols: dict[str, str],
    num_buckets: int = 16,
) -> "ray.data.Dataset":
    """Build the URN component/relation collection from attribute COLUMNS.

    ``attr_cols`` maps resource attribute keys → input column names (the flat
    analogue of the pcommon.Map; null/'' cells mean "attribute absent").
    """
    keys = list(attr_cols)
    cols = [attr_cols[k] for k in keys]

    def distinct_resources(t: pa.Table) -> pa.Table:
        sub = t.select(cols).rename_columns(keys)
        return sub.group_by(keys).aggregate([])  # per-batch distinct combiner

    def build(t: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for rec in t.to_pylist():
            attrs = {k: v for k, v in rec.items() if v not in (None, "")}
            rows.extend(add_resource(attrs))
        if not rows:
            return TOPOLOGY_SCHEMA.empty_table()
        out = pa.Table.from_pylist(rows, schema=TOPOLOGY_SCHEMA)
        # local first-wins combiner before the exchange
        return _first_per_id(out)

    def bucketize(t: pa.Table) -> pa.Table:
        from ..functions.hashing import fnv1a32_arrow

        b = (fnv1a32_arrow(t["external_id"].combine_chunks()) % np.uint64(num_buckets)).astype(np.int32)
        return t.append_column("_bucket", pa.array(b, pa.int32()))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_bucket"])
        df = df.sort_values(list(df.columns), kind="mergesort")
        return df.drop_duplicates(["kind", "external_id"], keep="first")

    d = ds.map_batches(distinct_resources, batch_format="pyarrow")
    built = d.map_batches(build, batch_format="pyarrow").map_batches(
        bucketize, batch_format="pyarrow"
    )
    return built.groupby("_bucket").map_groups(per_bucket, batch_format="pandas")


def _first_per_id(t: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    order = pc.sort_indices(
        t, sort_keys=[(c, "ascending") for c in t.column_names]
    )
    t = t.take(order)
    df_key = pd.DataFrame(
        {"k": t["kind"].to_numpy(zero_copy_only=False),
         "e": t["external_id"].to_numpy(zero_copy_only=False)}
    )
    keep = ~df_key.duplicated(["k", "e"], keep="first").to_numpy()
    return t.filter(pa.array(keep))
