# r18 phase profile of http_listener_spool_roundtrip: collect/POST/h2/
# stop/readback/agg walls + append_segment time and segment count —
# the evidence behind OPTIMIZATION_r18.md §2.
"""Phase-profile http_listener_spool_roundtrip at sf0.1."""
import json, os, shutil, sys, tempfile, threading, time
from http.client import HTTPConnection

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from hazelcast_jet_contrib_spark import get_spark
from hazelcast_jet_contrib_spark.registry import QUERIES
from hazelcast_jet_contrib_spark.session import load_tables
from pyspark.sql import functions as F

SF = os.environ["SPARK_GRAFT_SF_DIR"]
spark = get_spark(app_name="prof_http")

# warm
spark.read.parquet(f"{SF}/region.parquet").collect()

from hazelcast_jet_contrib_spark.sources import http2
from hazelcast_jet_contrib_spark.sources.http_listener import HttpListenerSource
from hazelcast_jet_contrib_spark.streaming import message_log

# instrument append_segment
append_times = []
orig_append = message_log.append_segment
def timed_append(*a, **kw):
    t0 = time.perf_counter()
    r = orig_append(*a, **kw)
    append_times.append(time.perf_counter() - t0)
    return r
message_log.append_segment = timed_append
import hazelcast_jet_contrib_spark.sources.http_listener as hl
hl.message_log.append_segment = timed_append

for rep in range(3):
    append_times.clear()
    T = {}
    t0 = time.perf_counter()
    rows = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .filter(F.col("o_orderkey") % 101 == 0)
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .collect()
    )
    T["collect_rows"] = time.perf_counter() - t0
    bodies = [
        json.dumps({"k": r["o_orderkey"], "p": r["o_orderpriority"], "t": r["o_totalprice"]}).encode()
        for r in rows
    ]
    h2_bodies = bodies[::10]
    h11_bodies = [b for i, b in enumerate(bodies) if i % 10 != 0]
    spool = tempfile.mkdtemp(prefix="http_prof_")
    t0 = time.perf_counter()
    src = HttpListenerSource(spool, require_json=True, durable_ack=True).start()
    host, port = src._server.server_address[:2]
    T["start"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    it = iter(h11_bodies)
    lock = threading.Lock()
    def producer():
        import socket as _socket
        conn = HTTPConnection(host, port, timeout=30)
        conn.connect()
        conn.sock.setsockopt(_socket.IPPROTO_TCP, _socket.TCP_NODELAY, 1)
        try:
            while True:
                with lock:
                    body = next(it, None)
                if body is None:
                    return
                conn.request("POST", "/", body, {"Content-Type": "application/json"})
                r = conn.getresponse()
                r.read()
        finally:
            conn.close()
    workers = [threading.Thread(target=producer) for _ in range(8)]
    for w in workers: w.start()
    for w in workers: w.join()
    T["h11_posts"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    statuses = http2.post_h2c(host, port, h2_bodies)
    T["h2_posts"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    src.stop()
    T["stop"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    readback = (
        spark.read.schema("key string, value string")
        .json(os.path.join(spool, "http"))
        .select(
            F.get_json_object("value", "$.p").alias("priority"),
            F.get_json_object("value", "$.k").cast("long").alias("k"),
            F.get_json_object("value", "$.t").cast("double").alias("t"),
        ).cache()
    )
    got = readback.collect()
    T["readback_collect"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    agg = readback.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("t") * 100).cast("long")).alias("cents"),
        F.min("k").alias("min_key"), F.max("k").alias("max_key"),
    ).collect()
    T["agg"] = time.perf_counter() - t0
    readback.unpersist()
    shutil.rmtree(spool, ignore_errors=True)
    nseg = len(append_times)
    print(f"rep{rep}: total={sum(T.values()):.3f}", {k: round(v,3) for k,v in T.items()},
          f"n_posts={len(h11_bodies)}+{len(h2_bodies)} segments={nseg} append_sum={sum(append_times):.3f}")
spark.stop()
