"""HTTP listener source + SSE push sink tests — ports of the reference's
test contracts: 100 POSTed users, filter id >= 80 → 20 rows
(HttpListenerSourceTest.java:37-38,137-154); malformed JSON → HTTP 400
(HttpListenerSourceContext.java:103-107); push sink delivers rows to a
connected client (HttpListenerSinkTest)."""

from __future__ import annotations

import json
import os
import urllib.error
import urllib.request

import pytest
from pyspark.sql import functions as F

from hazelcast_jet_contrib_spark.sources.http_listener import HttpListenerSource, SsePushSink
from hazelcast_jet_contrib_spark.streaming import message_log


def _post(url: str, body: str):
    req = urllib.request.Request(url, data=body.encode(), method="POST")
    return urllib.request.urlopen(req, timeout=10)


def test_http_listener_filter_pipeline(spark, tmp_path):
    spool = str(tmp_path / "spool")
    listener = HttpListenerSource(spool, require_json=True).start()
    try:
        for i in range(100):
            _post(listener.address, json.dumps({"id": i, "name": f"name{i}"}))
    finally:
        listener.stop()

    message_log.register(spark)
    stream = spark.readStream.format("message_log").option("path", spool).load()
    users = stream.select(
        F.from_json("value", "id int, name string").alias("u")
    ).select("u.id", "u.name")
    out = users.filter(F.col("id") >= 80)

    q = (
        out.writeStream.format("memory")
        .queryName("http_users")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM http_users").collect()
    finally:
        q.stop()
    assert len(rows) == 20
    assert sorted(r["id"] for r in rows) == list(range(80, 100))


def test_http_listener_rejects_malformed_json(tmp_path):
    spool = str(tmp_path / "spool")
    listener = HttpListenerSource(spool, require_json=True).start()
    try:
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(listener.address, "{not json")
        assert exc.value.code == 400
        # valid payload still accepted afterwards
        assert _post(listener.address, '{"ok": 1}').status == 200
        listener.flush()
    finally:
        listener.stop()
    segs = os.listdir(os.path.join(spool, "http"))
    assert len(segs) == 1  # only the valid record spooled


def test_sse_push_sink_delivers(spark):
    sink = SsePushSink().start()
    try:
        df = spark.range(3).select(F.col("id"))
        sink.foreach_batch()(df, 0)

        req = urllib.request.Request(sink.address)
        with urllib.request.urlopen(req, timeout=10) as resp:
            data = resp.read(60).decode()
        assert "data:" in data and '"id":0' in data.replace(" ", "")
    finally:
        sink.stop()


def test_sse_sink_drop_oldest_accumulation():
    sink = SsePushSink(max_buffer=5)
    for i in range(12):
        sink.publish(str(i))
    assert sink._rows == [str(i) for i in range(7, 12)]
