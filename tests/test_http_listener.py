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


def test_https_listener_serves_tls_and_rejects_plaintext(tmp_path):
    """TLS parity with the reference's secured listener tests
    (HttpListenerSourceTest.java:76-113): payloads arrive over HTTPS;
    a plaintext request to the TLS port fails at the handshake."""
    import ssl
    import subprocess
    import urllib.request
    import urllib.error

    from hazelcast_jet_contrib_spark.sources.http_listener import HttpListenerSource

    cert = str(tmp_path / "cert.pem")
    key = str(tmp_path / "key.pem")
    subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-keyout", key,
         "-out", cert, "-days", "1", "-nodes", "-subj", "/CN=localhost"],
        check=True, capture_output=True,
    )

    src = HttpListenerSource(
        str(tmp_path / "spool"), batch_size=1, tls=(cert, key)
    ).start()
    try:
        assert src.address.startswith("https://")
        ctx = ssl.create_default_context()
        ctx.check_hostname = False
        ctx.verify_mode = ssl.CERT_NONE
        req = urllib.request.Request(src.address, data=b'{"ok":1}', method="POST")
        with urllib.request.urlopen(req, context=ctx, timeout=10) as resp:
            assert resp.status == 200

        plain = src.address.replace("https://", "http://")
        try:
            urllib.request.urlopen(
                urllib.request.Request(plain, data=b"x", method="POST"), timeout=5
            )
            raise AssertionError("plaintext request must not succeed on a TLS port")
        except (urllib.error.URLError, ConnectionError, TimeoutError):
            pass  # handshake rejected, as required
    finally:
        src.stop()

    import json as _json

    spool = tmp_path / "spool" / "http"
    values = [
        _json.loads(line)["value"]
        for seg in sorted(spool.glob("*.jsonl"))
        for line in open(seg)
    ]
    assert '{"ok":1}' in values
