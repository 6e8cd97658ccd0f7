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
    assert sink._buffer.snapshot() == [str(i) for i in range(7, 12)]


def test_push_buffer_resumes_at_absolute_sequence_under_trim():
    """Progress is an absolute sequence, not a list index: after a
    drop-oldest trim a client resumes at the oldest retained row —
    no re-delivery of already-sent rows, no skipping of live ones."""
    from hazelcast_jet_contrib_spark.sources.http_listener import _PushBuffer

    buf = _PushBuffer(max_buffer=5)
    for i in range(3):
        buf.publish(str(i))
    rows, seq = buf.rows_from(0, timeout=0.1)
    assert rows == ["0", "1", "2"] and seq == 3

    # trim: rows 3..9 published, buffer keeps only 5..9
    for i in range(3, 10):
        buf.publish(str(i))
    rows, seq = buf.rows_from(seq, timeout=0.1)
    assert rows == ["5", "6", "7", "8", "9"], "client must not re-receive or dup"
    assert seq == 10
    # caught-up client times out with no rows and an unchanged cursor
    rows, seq2 = buf.rows_from(seq, timeout=0.05)
    assert rows == [] and seq2 == seq


def test_durable_ack_spools_before_200(tmp_path):
    """With durable_ack (default), an HTTP 200 means the payload is
    already on disk — no flush() call, no batch_size threshold."""
    spool = tmp_path / "spool"
    listener = HttpListenerSource(str(spool), batch_size=1000).start()
    try:
        assert _post(listener.address, '{"n":1}').status == 200
        segs = list((spool / "http").glob("*.jsonl"))
        assert len(segs) == 1, "payload must be durable before the 200"
    finally:
        listener.stop()


def test_buffered_mode_background_flush(tmp_path):
    """durable_ack=False buffers, but the periodic flusher bounds the
    window: the payload lands without reaching batch_size."""
    import time

    spool = tmp_path / "spool"
    listener = HttpListenerSource(
        str(spool), batch_size=1000, durable_ack=False, flush_interval=0.1
    ).start()
    try:
        assert _post(listener.address, '{"n":1}').status == 200
        deadline = time.time() + 5
        while time.time() < deadline:
            if list((spool / "http").glob("*.jsonl")):
                break
            time.sleep(0.05)
        assert list((spool / "http").glob("*.jsonl")), "background flush missing"
    finally:
        listener.stop()


def _ws_handshake(address: str):
    """Minimal RFC 6455 client handshake; returns (socket, leftover)."""
    import base64
    import hashlib
    import os as _os
    import socket
    from urllib.parse import urlparse

    u = urlparse(address)
    s = socket.create_connection((u.hostname, u.port), timeout=10)
    key = base64.b64encode(_os.urandom(16)).decode()
    s.sendall(
        (
            f"GET / HTTP/1.1\r\nHost: {u.hostname}:{u.port}\r\n"
            "Upgrade: websocket\r\nConnection: Upgrade\r\n"
            f"Sec-WebSocket-Key: {key}\r\nSec-WebSocket-Version: 13\r\n\r\n"
        ).encode()
    )
    buf = b""
    while b"\r\n\r\n" not in buf:
        chunk = s.recv(4096)
        assert chunk, "connection closed during handshake"
        buf += chunk
    header, rest = buf.split(b"\r\n\r\n", 1)
    status = header.split(b"\r\n")[0]
    assert b"101" in status, status
    guid = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"
    expect = base64.b64encode(hashlib.sha1((key + guid).encode()).digest()).decode()
    assert f"Sec-WebSocket-Accept: {expect}".encode() in header
    return s, rest


def _ws_read_text_frames(sock, leftover: bytes, n: int) -> list[str]:
    """Parse n unmasked server->client text frames."""
    data = leftover
    frames: list[str] = []
    while len(frames) < n:
        while True:
            if len(data) >= 2:
                ln = data[1] & 0x7F
                off = 2
                if ln == 126:
                    if len(data) >= 4:
                        ln = int.from_bytes(data[2:4], "big")
                        off = 4
                    else:
                        ln = None
                elif ln == 127:
                    if len(data) >= 10:
                        ln = int.from_bytes(data[2:10], "big")
                        off = 10
                    else:
                        ln = None
                if ln is not None and len(data) >= off + ln:
                    assert data[0] == 0x81, "expected FIN text frame"
                    frames.append(data[off : off + ln].decode())
                    data = data[off + ln :]
                    if len(frames) == n:
                        return frames
                    continue
            chunk = sock.recv(4096)
            assert chunk, "connection closed mid-frame"
            data += chunk
    return frames


def test_websocket_push_sink_delivers_frames(spark):
    """A real WebSocket client completes the RFC 6455 handshake and
    receives pipeline rows as text frames (the reference's websocket
    sink contract, HttpListenerSinks.java:41-146)."""
    from hazelcast_jet_contrib_spark.sources.http_listener import WebSocketPushSink

    sink = WebSocketPushSink().start()
    try:
        df = spark.range(3).select(F.col("id"))
        sink.foreach_batch()(df, 0)

        sock, rest = _ws_handshake(sink.address)
        try:
            frames = _ws_read_text_frames(sock, rest, 3)
        finally:
            sock.close()
        assert [json.loads(f)["id"] for f in frames] == [0, 1, 2]
    finally:
        sink.stop()


def test_websocket_sink_rejects_plain_http():
    from hazelcast_jet_contrib_spark.sources.http_listener import WebSocketPushSink

    sink = WebSocketPushSink().start()
    try:
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(sink.address, timeout=5)
        assert exc.value.code == 400
    finally:
        sink.stop()


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


def test_mutual_tls_accepts_trusted_and_rejects_untrusted_client(tmp_path):
    """Mutual-auth parity (HttpListenerSourceTest.java:76-113): with
    client_ca set, a client presenting a CA-signed certificate is
    accepted; a client with no certificate (or one from another CA)
    fails the handshake."""
    import ssl
    import subprocess

    def run(*args):
        subprocess.run(list(args), check=True, capture_output=True)

    ca_key, ca_pem = str(tmp_path / "ca.key"), str(tmp_path / "ca.pem")
    run("openssl", "req", "-x509", "-newkey", "rsa:2048", "-keyout", ca_key,
        "-out", ca_pem, "-days", "1", "-nodes", "-subj", "/CN=testca")
    srv_key, srv_pem = str(tmp_path / "srv.key"), str(tmp_path / "srv.pem")
    run("openssl", "req", "-x509", "-newkey", "rsa:2048", "-keyout", srv_key,
        "-out", srv_pem, "-days", "1", "-nodes", "-subj", "/CN=localhost")
    cli_key, cli_csr, cli_pem = (
        str(tmp_path / "cli.key"), str(tmp_path / "cli.csr"), str(tmp_path / "cli.pem")
    )
    run("openssl", "req", "-newkey", "rsa:2048", "-keyout", cli_key,
        "-out", cli_csr, "-nodes", "-subj", "/CN=client")
    run("openssl", "x509", "-req", "-in", cli_csr, "-CA", ca_pem, "-CAkey", ca_key,
        "-CAcreateserial", "-out", cli_pem, "-days", "1")
    rogue_key, rogue_pem = str(tmp_path / "rogue.key"), str(tmp_path / "rogue.pem")
    run("openssl", "req", "-x509", "-newkey", "rsa:2048", "-keyout", rogue_key,
        "-out", rogue_pem, "-days", "1", "-nodes", "-subj", "/CN=rogue")

    src = HttpListenerSource(
        str(tmp_path / "spool"), tls=(srv_pem, srv_key), client_ca=ca_pem
    ).start()
    try:
        def ctx_with(cert=None, key=None):
            c = ssl.create_default_context()
            c.check_hostname = False
            c.verify_mode = ssl.CERT_NONE
            if cert:
                c.load_cert_chain(cert, key)
            return c

        req = urllib.request.Request(src.address, data=b'{"ok":1}', method="POST")
        with urllib.request.urlopen(
            req, context=ctx_with(cli_pem, cli_key), timeout=10
        ) as resp:
            assert resp.status == 200

        for bad_ctx in (ctx_with(), ctx_with(rogue_pem, rogue_key)):
            try:
                urllib.request.urlopen(
                    urllib.request.Request(src.address, data=b"x", method="POST"),
                    context=bad_ctx,
                    timeout=5,
                )
                raise AssertionError("unauthenticated client must be refused")
            except (urllib.error.URLError, ssl.SSLError, ConnectionError, OSError):
                pass
    finally:
        src.stop()

    spool = tmp_path / "spool" / "http"
    values = [
        json.loads(line)["value"]
        for seg in sorted(spool.glob("*.jsonl"))
        for line in open(seg)
    ]
    assert values == ['{"ok":1}']
