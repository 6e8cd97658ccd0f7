"""Optional real-client adapters: the builder boundaries bound to live
client libraries when they are installed.

Every connector in this repo exercises the reference's *contract*
(builder lambdas, offsets, QoS, retry) against a pluggable boundary —
``connection_fn`` on :class:`~.sources.builder.BatchSourceBuilder`,
``publish_fn`` on :func:`~.sinks.connectors.mqtt_sink`, ``create_fn``
on :class:`~.sinks.builder.SinkBuilder`. The reference instead binds
those lambdas to real clients (async lettuce channels,
RedisSources.java:397-460; Paho MqttClient, MqttSourceBuilder.java;
mongo-driver) and proves them with Testcontainers. This module closes
that gap from our side: it INSTANTIATES the same builders against
real client libraries — redis-py and paho-mqtt — behind import-time
gates, so

- with the library absent (this CI container), importing this module
  still works, every adapter raises a single clear ``ImportError``
  naming the pip package, and the glue logic (partition slicing,
  pushdown forwarding, pipeline batching, QoS routing, TLS config) is
  proven every suite run by injected-stub tests
  (tests/test_real_clients.py);
- with the library installed and a server reachable, the skip-marked
  live tests run the identical code path end-to-end (the reference's
  quarantined-live-test discipline, TwitterSourceTest.java:49
  ``@Category(NightlyTest)``). README has the recipes.

Secured MQTT (SecuredMqttSourceTest.java / SecuredMosquittoContainer
parity): :class:`MqttTls` carries the broker-auth TLS surface —
CA-verified server auth, optional mutual auth (client cert + key),
and an opt-out hostname check — and applies it to a Paho client; the
in-process message-log broker has no network socket, so TLS lives on
this real-client boundary by design.

All lambdas built here are cloudpickle-serialized into Spark tasks;
client objects are created INSIDE the task (never on the driver) and
imports happen inside the lambdas so the driver can plan without the
library installed on it.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from hazelcast_jet_contrib_spark.sinks.builder import RetryStrategy, SinkBuilder
from hazelcast_jet_contrib_spark.sources.builder import BatchSourceBuilder


def _require(module: str, pip_name: str):
    """Import-or-explain: adapters depend on optional client libraries
    that are deliberately NOT hard dependencies of the engine."""
    import importlib

    try:
        return importlib.import_module(module)
    except ImportError as ex:  # pragma: no cover - env without the lib
        raise ImportError(
            f"the {module!r} client library is required for this adapter "
            f"but is not installed; `pip install {pip_name}`. The engine "
            f"itself does not depend on it — only this real-client "
            f"binding does."
        ) from ex


# ---------------------------------------------------------------------------
# Redis (redis-py): batch hash snapshot source, zset range source with
# server-side pushdown, bulk hash sink
# ---------------------------------------------------------------------------


def redis_hash_slices(hash_keys: list[str], slices: int) -> list[list[str]]:
    """Partition descriptors for a hash snapshot read: round-robin
    slices of the key list, one Spark task per slice (the analog of the
    reference's per-processor assignment, RedisSources.java:693-756).
    Pure function so the stub tests can pin the slicing contract."""
    keys = list(hash_keys)
    n = max(1, min(int(slices), len(keys) or 1))
    return [keys[i::n] for i in range(n)]


def redis_hash_source(
    spark: SparkSession,
    url: str,
    hash_keys: list[str],
    slices: int = 8,
    socket_timeout: float = 5.0,
) -> DataFrame:
    """HGETALL snapshot of the given hash keys through redis-py
    (RedisSources.java:100-183 live binding): one task per key slice,
    each opens its own client, reads only its slice, emits
    (key, field, value) rows as Arrow batches. Explicit schema so
    Catalyst can prune above the source."""

    def conn():
        redis = _require("redis", "redis")
        return redis.Redis.from_url(
            url, socket_timeout=socket_timeout, decode_responses=True
        )

    return (
        BatchSourceBuilder("redis-hash")
        .connection_fn(conn)
        .search_fn(hash_search_fn)
        .destroy_fn(lambda client: client.close())
        .schema("key string, field string, value string")
        .partitions(redis_hash_slices(hash_keys, slices))
        .build(spark)
    )


def hash_search_fn(client: Any, part: list[str], flt: Any, proj: Any):
    """The hash read itself, factored out so stub tests drive it with a
    fake client: HGETALL per key in this task's slice."""
    for k in part:
        for f, v in client.hgetall(k).items():
            yield {"key": k, "field": f, "value": v}


def redis_zset_source(
    spark: SparkSession,
    url: str,
    zset_key: str,
    score_ranges: list[tuple[float | None, float | None]],
    socket_timeout: float = 5.0,
) -> DataFrame:
    """Sorted-set range read with SERVER-SIDE pushdown through redis-py
    (RedisSources.java:200-256,479 live binding): each partition
    descriptor is a (min, max] score range executed as ZRANGEBYSCORE on
    the server — the reference's manual-pushdown contract, the range
    never ships rows it excludes. Ranges are half-open (min exclusive
    via the '(' prefix, max inclusive) so adjacent partitions never
    double-read a boundary score; use ``float("-inf")`` (or ``None``)
    as the FIRST range's min to include members sitting exactly on the
    global lower bound — a finite first min excludes its own boundary
    by the half-open contract — and ``None``/``float("inf")`` as the
    LAST range's max for an open upper end (max is inclusive, so
    ``+inf`` is safe on that side)."""

    def conn():
        redis = _require("redis", "redis")
        return redis.Redis.from_url(
            url, socket_timeout=socket_timeout, decode_responses=True
        )

    return (
        BatchSourceBuilder("redis-zset")
        .connection_fn(conn)
        .search_fn(zset_search_fn)
        .destroy_fn(lambda client: client.close())
        .schema("member string, score double")
        .partitions(
            [
                (
                    zset_key,
                    float("-inf") if lo is None else float(lo),
                    float("inf") if hi is None else float(hi),
                )
                for lo, hi in score_ranges
            ]
        )
        .build(spark)
    )


def zset_search_fn(client: Any, part: tuple[str, float, float], flt: Any, proj: Any):
    """ZRANGEBYSCORE with the exclusive-min syntax — the pushdown runs
    on the server, factored out for stub tests. A -inf min is sent as
    the inclusive ``-inf`` token (nothing exists below it to exclude),
    so the first range of a full-space partitioning keeps members
    sitting exactly on the global lower bound. Bounds arrive as strings
    when the descriptor rode the builder's array<string> partition
    frame — normalize before comparing."""
    key, lo, hi = part
    lo_f, hi_f = float(lo), float(hi)
    min_arg = "-inf" if lo_f == float("-inf") else f"({lo_f}"
    max_arg = "+inf" if hi_f == float("inf") else hi_f
    for member, score in client.zrangebyscore(key, min_arg, max_arg, withscores=True):
        yield {"member": member, "score": float(score)}


def redis_hash_sink(
    df: DataFrame,
    url: str,
    hash_key: str,
    field_fn: Callable[[Any], str],
    value_fn: Callable[[Any], str],
    batch_size: int = 512,
    retry: RetryStrategy | None = None,
    socket_timeout: float = 5.0,
) -> None:
    """Bulk hash sink through redis-py (RedisSinks.java:64-151 live
    binding): rows buffer per partition and flush as ONE pipelined
    HSET mapping per batch — bulk last-write-wins, exactly the
    reference's accumulate-then-HMSET shape. Flushes run under the
    retry strategy; HSET is idempotent per (key, field), so replays
    are safe (the XA-free exactly-once discipline, SURVEY.md §2.7)."""

    def create(writer_id: str) -> dict:
        redis = _require("redis", "redis")
        client = redis.Redis.from_url(url, socket_timeout=socket_timeout)
        return {"client": client, "buf": {}}

    def receive(ctx: dict, row) -> None:
        ctx["buf"][field_fn(row)] = value_fn(row)

    def flush(ctx: dict) -> None:
        if not ctx["buf"]:
            return
        # the buffer is cleared only AFTER execute() succeeds: a
        # transient failure leaves it intact so the retry strategy's
        # re-invocation re-sends the same mapping (HSET is idempotent
        # per (key, field), so a retry after partial success is safe —
        # clearing first would make the retried flush a silent no-op
        # and LOSE the batch)
        pipe = ctx["client"].pipeline(transaction=False)
        pipe.hset(hash_key, mapping=dict(ctx["buf"]))
        pipe.execute()
        ctx["buf"] = {}

    def destroy(ctx: dict) -> None:
        ctx["client"].close()

    (
        SinkBuilder("redis-hash-sink")
        .create_fn(create)
        .receive_fn(receive)
        .flush_fn(flush)
        .destroy_fn(destroy)
        .batch_size(batch_size)
        .retry(retry if retry is not None else RetryStrategy.constant(3, 0.05))
        .write(df)
    )


# ---------------------------------------------------------------------------
# MongoDB (pymongo): partitioned find() source with pushdown, insertMany sink
# ---------------------------------------------------------------------------


def mongo_source(
    spark: SparkSession,
    uri: str,
    database: str,
    collection: str,
    schema: str,
    partition_filters: list[dict],
    find_filter: dict | None = None,
    projection: dict | None = None,
) -> DataFrame:
    """Partitioned ``find()`` read through pymongo
    (MongoDBSourceBuilder.java:84-126 connection→search→map→destroy
    live binding): each partition descriptor is a filter document (id
    ranges, shard keys) ANDed with the base ``find_filter``, and both
    filter and projection execute SERVER-SIDE — the reference's manual
    pushdown (MongoDBSources.java:85-93). One task per partition
    filter; each opens its own MongoClient. The explicit ``schema``
    keeps Catalyst able to prune above the source."""

    def conn():
        pymongo = _require("pymongo", "pymongo")
        return pymongo.MongoClient(uri)

    base = dict(find_filter or {})
    proj = dict(projection) if projection is not None else None

    def search(client, part, flt, prj):
        import json

        return mongo_search_fn(
            client, database, collection, base, json.loads(part), proj
        )

    import json

    # descriptors ride the partition frame as JSON strings: filter
    # documents nest ({"_id": {"$gte": ...}}), and the builder's
    # map<string,string> descriptor coercion would stringify the inner
    # dicts into unusable reprs
    return (
        BatchSourceBuilder("mongo-find")
        .connection_fn(conn)
        .search_fn(search)
        .destroy_fn(lambda client: client.close())
        .schema(schema)
        .partitions([json.dumps(p or {}) for p in (partition_filters or [{}])])
        .build(spark)
    )


def mongo_search_fn(
    client: Any,
    database: str,
    collection: str,
    base_filter: dict,
    part_filter: dict,
    projection: dict | None,
):
    """The find() itself, factored out for stub tests: base and
    partition filters compose with $and (never clobbering a shared
    key), projection passes through verbatim — both run on the
    server."""
    if base_filter and part_filter:
        query: dict = {"$and": [base_filter, part_filter]}
    else:
        query = base_filter or part_filter or {}
    yield from client[database][collection].find(query, projection)


def mongo_sink(
    df: DataFrame,
    uri: str,
    database: str,
    collection: str,
    doc_fn: Callable[[Any], dict],
    ordered: bool = False,
    bypass_validation: bool = False,
    batch_size: int = 512,
    retry: RetryStrategy | None = None,
) -> None:
    """Buffered ``insertMany`` sink through pymongo
    (MongoDBSinkBuilder.java:169-183 live binding): rows buffer per
    partition and flush as one insert_many(ordered=..., bypass
    validation=...) call under the retry strategy. Delivery is
    AT-LEAST-ONCE exactly like the reference's: insertMany is not
    idempotent, so a retry after a partially applied batch can
    duplicate — give documents deterministic ``_id``s in ``doc_fn`` so
    replays collide (duplicate-key errors on an unordered insert leave
    the already-present documents in place) or dedupe downstream, the
    same discipline the message-log sink documents. The buffer clears
    only after a successful flush."""

    def create(writer_id: str) -> dict:
        pymongo = _require("pymongo", "pymongo")
        client = pymongo.MongoClient(uri)
        return {"client": client, "buf": []}

    def receive(ctx: dict, row) -> None:
        ctx["buf"].append(doc_fn(row))

    def flush(ctx: dict) -> None:
        if not ctx["buf"]:
            return
        try:
            ctx["client"][database][collection].insert_many(
                list(ctx["buf"]),
                ordered=ordered,
                bypass_document_validation=bypass_validation,
            )
        except Exception as ex:
            # A retry after a PARTIALLY applied batch collides with the
            # already-inserted documents. With deterministic _ids (the
            # documented replay discipline) that surfaces as a
            # BulkWriteError whose every writeError is duplicate-key
            # (code 11000) — which means every document is present, so
            # the flush SUCCEEDED from the at-least-once contract's
            # point of view. Any other error (or any non-duplicate
            # writeError mixed in) re-raises into the retry strategy.
            # Shape-checked via ex.details so no pymongo import is
            # needed on this path.
            details = getattr(ex, "details", None)
            werrs = (details or {}).get("writeErrors") if isinstance(details, dict) else None
            if not werrs or any(e.get("code") != 11000 for e in werrs):
                raise
        ctx["buf"] = []

    def destroy(ctx: dict) -> None:
        ctx["client"].close()

    (
        SinkBuilder("mongo-sink")
        .create_fn(create)
        .receive_fn(receive)
        .flush_fn(flush)
        .destroy_fn(destroy)
        .batch_size(batch_size)
        .retry(retry if retry is not None else RetryStrategy.constant(3, 0.05))
        .write(df)
    )


# ---------------------------------------------------------------------------
# MQTT (paho-mqtt): TLS config + live publish_fn for mqtt_sink
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class MqttTls:
    """Broker TLS configuration (SecuredMqttSourceTest.java /
    SecuredMosquittoContainer.java parity):

    - ``ca_certs``: PEM bundle the broker's server cert must chain to
      (server auth — the secured-Mosquitto ``cafile`` side).
    - ``certfile``/``keyfile``: client cert + key for MUTUAL auth
      (``require_certificate true`` on the broker). Both or neither.
    - ``check_hostname``: disable only for IP-addressed test brokers;
      verification of the chain itself is never disabled here — an
      adapter that silently skipped verification would be a downgrade
      the reference's secured tests exist to prevent.
    """

    ca_certs: str | None = None
    certfile: str | None = None
    keyfile: str | None = None
    check_hostname: bool = True

    def __post_init__(self) -> None:
        if (self.certfile is None) != (self.keyfile is None):
            raise ValueError(
                "mutual-auth TLS needs BOTH certfile and keyfile (or neither)"
            )

    def to_ssl_context(self):
        """The actual ``ssl.SSLContext``: built here (not inside paho)
        so the config is provable without a broker — tests load real
        openssl-generated certs through this and assert server-auth vs
        mutual-auth behavior."""
        import ssl

        ctx = ssl.create_default_context(
            purpose=ssl.Purpose.SERVER_AUTH, cafile=self.ca_certs
        )
        ctx.check_hostname = self.check_hostname
        ctx.verify_mode = ssl.CERT_REQUIRED
        if self.certfile is not None:
            ctx.load_cert_chain(self.certfile, self.keyfile)
        return ctx

    def apply(self, client: Any) -> None:
        """Arm a Paho client with this context (tls_set_context is the
        documented paho surface for a pre-built SSLContext)."""
        client.tls_set_context(self.to_ssl_context())


def paho_publish_fn(
    host: str,
    port: int = 1883,
    client_id_prefix: str = "sg-sink",
    username: str | None = None,
    password: str | None = None,
    tls: MqttTls | None = None,
    keepalive: int = 60,
    publish_timeout: float = 10.0,
    mqtt_module: Any | None = None,
) -> Callable[[str, str, list[dict]], None]:
    """A ``publish_fn(root, topic, records)`` for
    :func:`~.sinks.connectors.mqtt_sink` that publishes through a real
    Paho client (MqttSinkBuilder.java:66-91 live binding) instead of
    the in-process message log. The ``root`` argument (the message-log
    directory in the default boundary) is ignored — a live broker has
    no filesystem root.

    One client per partition writer, created lazily INSIDE the task on
    first flush and reused across flushes (paho's network loop runs on
    its background thread). Per-record QoS comes from the record's
    ``properties`` — exactly what mqtt_sink's receive path puts there —
    and QoS>=1 publishes block on broker acknowledgment
    (``wait_for_publish``) so the sink's retry strategy sees real
    failures instead of enqueue-and-hope. ``tls`` arms the secured
    variant (:class:`MqttTls`).

    ``mqtt_module`` overrides the ``paho.mqtt.client`` import for the
    injected-stub tests; leave None for the real library.
    """
    state: dict[str, Any] = {}

    def _client():
        if "c" in state:
            return state["c"]
        mqtt = (
            mqtt_module
            if mqtt_module is not None
            else _require("paho.mqtt.client", "paho-mqtt")
        )
        import os

        cid = f"{client_id_prefix}-{os.getpid()}"
        # paho-mqtt >= 2.0 requires the callback API version as the
        # first positional argument (Client(client_id=...) raises
        # ValueError there); 1.x has no CallbackAPIVersion attribute.
        # We register no callbacks, so VERSION2 is a pure formality.
        api_version = getattr(mqtt, "CallbackAPIVersion", None)
        if api_version is not None:
            c = mqtt.Client(api_version.VERSION2, client_id=cid)
        else:
            c = mqtt.Client(client_id=cid)
        if username is not None:
            c.username_pw_set(username, password)
        if tls is not None:
            tls.apply(c)
        c.connect(host, port, keepalive)
        c.loop_start()
        state["c"] = c
        return c

    def publish(root: str, topic: str, records: list[dict]) -> None:
        c = _client()
        for rec in records:
            qos = int((rec.get("properties") or {}).get("qos", 1))
            info = c.publish(topic, rec["value"], qos=qos)
            if qos >= 1:
                info.wait_for_publish(timeout=publish_timeout)
                if info.rc != 0:
                    raise ConnectionError(
                        f"MQTT publish to {topic!r} failed rc={info.rc}"
                    )

    def close() -> None:
        c = state.pop("c", None)
        if c is not None:
            c.loop_stop()
            c.disconnect()

    publish.close = close  # type: ignore[attr-defined]
    return publish


__all__ = [
    "MqttTls",
    "hash_search_fn",
    "mongo_search_fn",
    "mongo_sink",
    "mongo_source",
    "paho_publish_fn",
    "redis_hash_sink",
    "redis_hash_slices",
    "redis_hash_source",
    "redis_zset_source",
    "zset_search_fn",
]
