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


def test_push_sink_streams_oversized_batch_bounded_without_losing_delivery(spark):
    """VERDICT r10 What's-wrong #3: a single runaway batch (3× the
    buffer capacity) must not materialize wholesale on the driver —
    rows stream through partition-at-a-time (toLocalIterator). Crucial
    distinction: EVERY row is still published (a live client that keeps
    up would receive all 24 — retention policy is not delivery policy),
    while the drop-oldest buffer retains only the newest max_buffer for
    late joiners. Cross-batch drop-oldest stays exact."""
    import json

    sink = SsePushSink(max_buffer=8).start()
    try:
        published: list[str] = []
        orig_publish = sink.publish
        sink.publish = lambda row: (published.append(row), orig_publish(row))[1]
        big = spark.range(24).select(F.col("id")).repartition(6)  # 3x capacity
        sink.foreach_batch()(big, 0)
        # delivery: all 24 rows were published, none dropped pre-buffer
        assert {json.loads(r)["id"] for r in published} == set(range(24))
        # retention: the bounded buffer holds exactly the newest 8
        got = sink._buffer.snapshot()
        assert len(got) == 8
        assert [json.loads(r)["id"] for r in got] == [
            json.loads(r)["id"] for r in published[-8:]
        ]
        # cross-batch drop-oldest is unaffected
        sink.foreach_batch()(spark.range(100, 103).select(F.col("id")), 1)
        tail = [json.loads(r)["id"] for r in sink._buffer.snapshot()]
        assert tail[-3:] == [100, 101, 102] and len(tail) == 8
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


# --------------------------------------------------------------------------
# HTTP/2 (reference parity: ENABLE_HTTP2 on both listener contexts,
# HttpListenerSourceContext.java:80 / HttpListenerSinkContext.java:86).
# curl/nghttp2 is an independent, full-fidelity h2 client: these tests
# exercise real Huffman-coded HPACK off the wire, not our own encoder.
# --------------------------------------------------------------------------


def _curl(*args, timeout=15):
    import subprocess

    return subprocess.run(
        ["curl", "-sS", *args], capture_output=True, timeout=timeout, text=True
    )


def test_hpack_decoder_rfc7541_appendix_c_vectors():
    """RFC 7541 Appendix C.3 (plain) and C.4 (Huffman) request examples,
    including the dynamic-table evolution across the three requests of
    each series."""
    from hazelcast_jet_contrib_spark.sources.http2 import HpackDecoder

    # C.3: literal (non-Huffman) series
    d = HpackDecoder()
    first = bytes.fromhex("828684410f7777772e6578616d706c652e636f6d")
    assert d.decode(first) == [
        (":method", "GET"),
        (":scheme", "http"),
        (":path", "/"),
        (":authority", "www.example.com"),
    ]
    second = bytes.fromhex("828684be58086e6f2d6361636865")
    assert d.decode(second) == [
        (":method", "GET"),
        (":scheme", "http"),
        (":path", "/"),
        (":authority", "www.example.com"),  # dynamic index 62 (0xbe)
        ("cache-control", "no-cache"),
    ]
    third = bytes.fromhex(
        "828785bf400a637573746f6d2d6b65790c637573746f6d2d76616c7565"
    )
    assert d.decode(third) == [
        (":method", "GET"),
        (":scheme", "https"),
        (":path", "/index.html"),
        (":authority", "www.example.com"),
        ("custom-key", "custom-value"),
    ]

    # C.4: the same three requests, Huffman-coded
    h = HpackDecoder()
    assert h.decode(bytes.fromhex("828684418cf1e3c2e5f23a6ba0ab90f4ff")) == [
        (":method", "GET"),
        (":scheme", "http"),
        (":path", "/"),
        (":authority", "www.example.com"),
    ]
    assert h.decode(bytes.fromhex("828684be5886a8eb10649cbf")) == [
        (":method", "GET"),
        (":scheme", "http"),
        (":path", "/"),
        (":authority", "www.example.com"),
        ("cache-control", "no-cache"),
    ]
    assert h.decode(
        bytes.fromhex("828785bf408825a849e95ba97d7f8925a849e95bb8e8b4bf")
    ) == [
        (":method", "GET"),
        (":scheme", "https"),
        (":path", "/index.html"),
        (":authority", "www.example.com"),
        ("custom-key", "custom-value"),
    ]


def test_huffman_decode_rfc7541_string_vectors():
    from hazelcast_jet_contrib_spark.sources.http2 import huffman_decode

    # RFC 7541 C.4.x / C.6.x string literals
    assert huffman_decode(bytes.fromhex("f1e3c2e5f23a6ba0ab90f4ff")) == b"www.example.com"
    assert huffman_decode(bytes.fromhex("a8eb10649cbf")) == b"no-cache"
    assert huffman_decode(bytes.fromhex("25a849e95ba97d7f")) == b"custom-key"
    assert huffman_decode(bytes.fromhex("6402")) == b"302"
    assert huffman_decode(bytes.fromhex("aec3771a4b")) == b"private"
    assert huffman_decode(bytes.fromhex("d07abe941054d444a8200595040b8166e082a62d1bff")) == (
        b"Mon, 21 Oct 2013 20:13:21 GMT"
    )


def test_h2c_prior_knowledge_post_roundtrip(tmp_path):
    """curl --http2-prior-knowledge POSTs over cleartext h2: payload is
    spooled, response is HTTP/2 200; malformed JSON gets :status 400;
    HTTP/1.1 on the same port still works (preface sniffing).

    Each check is a separate curl invocation: Debian's curl 7.88 cannot
    REUSE an h2c connection for a second sequential transfer even
    against a minimal textbook response (verified with a bare-bones
    socket server: single HEADERS frame, indexed :status 200,
    END_STREAM — curl still aborts the reused connection with exit 16
    before sending a byte; its h2 internals were rewritten in 8.x).
    Server-side connection reuse is covered independently by
    test_h2_connection_reuse_sequential_streams below."""
    spool = str(tmp_path / "spool")
    src = HttpListenerSource(spool, batch_size=1, require_json=True).start()
    try:
        for i in (1, 2):
            r = _curl(
                "--http2-prior-knowledge", "-o", "/dev/null",
                "-w", "%{http_version} %{response_code}",
                "-d", f'{{"h2": {i}}}', src.address,
            )
            assert r.returncode == 0, r.stderr
            assert r.stdout == "2 200", r.stdout

        bad = _curl(
            "--http2-prior-knowledge", "-o", "/dev/null",
            "-w", "%{http_version} %{response_code}",
            "-d", "not-json{", src.address,
        )
        assert bad.stdout == "2 400", bad.stdout

        # HTTP/1.1 on the same port still works (preface sniffing)
        import urllib.request

        req = urllib.request.Request(src.address, data=b'{"h11": 3}', method="POST")
        with urllib.request.urlopen(req, timeout=10) as resp:
            assert resp.status == 200
    finally:
        src.stop()

    values = [
        json.loads(line)["value"]
        for seg in sorted((tmp_path / "spool" / "http").glob("*.jsonl"))
        for line in open(seg)
    ]
    assert values == ['{"h2": 1}', '{"h2": 2}', '{"h11": 3}']


def test_h2_connection_reuse_sequential_streams(tmp_path):
    """Two requests on ONE h2 connection (streams 1 and 3), the second
    referencing an HPACK dynamic-table entry inserted by the first —
    the connection-reuse contract a persistent webhook producer relies
    on. Uses a raw frame-level client because curl 7.88 cannot reuse
    h2c connections (see previous test)."""
    import socket
    import struct

    from hazelcast_jet_contrib_spark.sources import http2

    spool = str(tmp_path / "spool")
    src = HttpListenerSource(spool, batch_size=1).start()
    host, port = src._server.server_address[:2]

    def frame(t, fl, sid, pl=b""):
        return (
            struct.pack("!I", len(pl))[1:] + bytes((t, fl))
            + struct.pack("!I", sid) + pl
        )

    try:
        s = socket.create_connection((host, port), timeout=10)
        s.settimeout(10)
        f = s.makefile("rwb")
        f.write(http2.PREFACE)
        f.write(frame(4, 0, 0))  # client SETTINGS
        # stream 1: :method POST (idx 3), :scheme http (6), :path / (4),
        # :authority as literal WITH incremental indexing (enters the
        # dynamic table)
        f.write(frame(1, 0x4, 1, bytes([0x83, 0x86, 0x84, 0x41, 0x09]) + b"localhost"))
        f.write(frame(0, 0x1, 1, b'{"s": 1}'))
        f.flush()

        def read_until_response(stream_id):
            got_headers = ended = False
            while not (got_headers and ended):
                head = f.read(9)
                ln = int.from_bytes(head[:3], "big")
                t, fl = head[3], head[4]
                sid = int.from_bytes(head[5:9], "big") & 0x7FFFFFFF
                pl = f.read(ln) if ln else b""
                if sid == stream_id and t == 1:
                    got_headers = True
                    assert http2.HpackDecoder().decode(pl)[0] == (":status", "200")
                if sid == stream_id and fl & 0x1:
                    ended = True

        read_until_response(1)
        # stream 3 on the SAME connection: :authority via dynamic index
        # 62 (0xbe) — only decodable if the server kept HPACK state
        f.write(frame(1, 0x4, 3, bytes([0x83, 0x86, 0x84, 0xbe])))
        f.write(frame(0, 0x1, 3, b'{"s": 2}'))
        f.flush()
        read_until_response(3)
        f.write(frame(7, 0, 0, struct.pack("!II", 3, 0)))  # GOAWAY
        f.flush()
        s.close()
    finally:
        src.stop()

    values = [
        json.loads(line)["value"]
        for seg in sorted((tmp_path / "spool" / "http").glob("*.jsonl"))
        for line in open(seg)
    ]
    assert values == ['{"s": 1}', '{"s": 2}']


def test_h2_over_tls_alpn_negotiation(tmp_path):
    """Over TLS the client negotiates h2 via ALPN (no prior knowledge
    flag: curl --http2 upgrades only if ALPN offers it) — proving the
    listener advertises h2 and serves the negotiated connection."""
    import subprocess

    cert, key = str(tmp_path / "cert.pem"), str(tmp_path / "key.pem")
    subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-keyout", key,
         "-out", cert, "-days", "1", "-nodes", "-subj", "/CN=localhost"],
        check=True, capture_output=True,
    )
    spool = str(tmp_path / "spool")
    src = HttpListenerSource(spool, batch_size=1, tls=(cert, key)).start()
    try:
        r = _curl(
            "-k", "--http2", "-o", "/dev/null",
            "-w", "%{http_version} %{response_code}",
            "-d", '{"tls_h2": 1}', src.address,
        )
        assert r.returncode == 0, r.stderr
        assert r.stdout == "2 200", r.stdout
    finally:
        src.stop()
    values = [
        json.loads(line)["value"]
        for seg in sorted((tmp_path / "spool" / "http").glob("*.jsonl"))
        for line in open(seg)
    ]
    assert values == ['{"tls_h2": 1}']


def test_sse_push_sink_over_h2(spark):
    """The SSE push sink streams each event as its own HTTP/2 DATA
    frame to an h2 client."""
    sink = SsePushSink().start()
    try:
        for i in range(3):
            sink.publish(json.dumps({"n": i}))
        r = _curl(
            "--http2-prior-knowledge", "-m", "10",
            "-w", "\n%{http_version}", sink.address,
        )
        assert r.stdout.endswith("\n2"), r.stdout
        events = [l for l in r.stdout.splitlines() if l.startswith("data: ")]
        assert [json.loads(e[6:])["n"] for e in events] == [0, 1, 2]
    finally:
        sink.stop()


def test_hpack_truncated_varint_raises_value_error():
    """A header block ending mid-varint (continuation bit set on the
    final byte) must fail with the ValueError the connection handler
    catches — not an IndexError traceback per malicious connection."""
    import pytest

    from hazelcast_jet_contrib_spark.sources.http2 import HpackDecoder

    with pytest.raises(ValueError, match="truncated hpack integer"):
        HpackDecoder().decode(b"\xff")  # indexed field, varint continues


def test_hpack_decoder_ignores_client_header_table_size_zero():
    """SETTINGS_HEADER_TABLE_SIZE from the client constrains OUR
    encoder, not our decoder: a client advertising 0 (it decodes with
    no dynamic table) may still index against OUR advertised table, so
    our decoder must keep accepting incremental indexing + dynamic
    references."""
    from hazelcast_jet_contrib_spark.sources.http2 import HpackDecoder

    d = HpackDecoder()
    # literal WITH incremental indexing, new name "x: y", then an
    # indexed reference to the dynamic entry (index 62 = 0xbe)
    block1 = bytes([0x40, 0x01]) + b"x" + bytes([0x01]) + b"y"
    assert d.decode(block1) == [("x", "y")]
    assert d.decode(bytes([0xBE])) == [("x", "y")]


def test_h2_trailing_headers_preserve_request_pseudo_headers(tmp_path):
    """HEADERS -> DATA -> trailing HEADERS(END_STREAM) (RFC 7540 §8.1,
    the gRPC/curl --trailer shape): the trailer block must not clobber
    :method/:path — the POST still lands with a 200 and the payload is
    spooled."""
    import json as _json
    import socket
    import struct

    from hazelcast_jet_contrib_spark.sources import http2

    spool = str(tmp_path / "spool")
    src = HttpListenerSource(spool, batch_size=1).start()
    host, port = src._server.server_address[:2]

    def frame(t, fl, sid, pl=b""):
        return (
            struct.pack("!I", len(pl))[1:] + bytes((t, fl))
            + struct.pack("!I", sid) + pl
        )

    try:
        s = socket.create_connection((host, port), timeout=10)
        s.settimeout(10)
        f = s.makefile("rwb")
        f.write(http2.PREFACE)
        f.write(frame(4, 0, 0))
        # HEADERS without END_STREAM: POST / http localhost
        f.write(frame(1, 0x4, 1, bytes([0x83, 0x86, 0x84, 0x41, 0x09]) + b"localhost"))
        # DATA without END_STREAM
        f.write(frame(0, 0x0, 1, b'{"trailered": true}'))
        # trailing HEADERS with END_STREAM + END_HEADERS: one literal
        # without indexing, new name "x-checksum: ok"
        trailer = bytes([0x00, 0x0A]) + b"x-checksum" + bytes([0x02]) + b"ok"
        f.write(frame(1, 0x4 | 0x1, 1, trailer))
        f.flush()
        got_headers = ended = False
        while not (got_headers and ended):
            head = f.read(9)
            ln = int.from_bytes(head[:3], "big")
            t, fl = head[3], head[4]
            sid = int.from_bytes(head[5:9], "big") & 0x7FFFFFFF
            pl = f.read(ln) if ln else b""
            if sid == 1 and t == 1:
                got_headers = True
                assert http2.HpackDecoder().decode(pl)[0] == (":status", "200")
            if sid == 1 and fl & 0x1:
                ended = True
        s.close()
    finally:
        src.stop()

    values = [
        _json.loads(line)["value"]
        for seg in sorted((tmp_path / "spool" / "http").glob("*.jsonl"))
        for line in open(seg)
    ]
    assert values == ['{"trailered": true}']


def test_h2_large_response_respects_max_frame_size():
    """A 40 KB response must be split into DATA frames of at most the
    peer's SETTINGS_MAX_FRAME_SIZE (default 16384) — one oversized
    frame makes a conformant client abort with FRAME_SIZE_ERROR — and
    the window accounting must deliver every byte with END_STREAM on
    the final frame."""
    import io
    import struct

    from hazelcast_jet_contrib_spark.sources import http2

    def frame(t, fl, sid, pl=b""):
        return (
            struct.pack("!I", len(pl))[1:] + bytes((t, fl))
            + struct.pack("!I", sid) + pl
        )

    rfile = io.BytesIO(
        http2.PREFACE
        + frame(4, 0, 0)  # client SETTINGS (defaults)
        + frame(1, 0x4 | 0x1, 1, bytes([0x83, 0x86, 0x84]))  # POST, END_STREAM
    )
    wfile = io.BytesIO()
    body = b"x" * 40_000
    http2.serve_connection(rfile, wfile, lambda headers, data: (200, body))

    wfile.seek(0)
    data_frames = []
    while True:
        head = wfile.read(9)
        if len(head) < 9:
            break
        ln = int.from_bytes(head[:3], "big")
        t, fl = head[3], head[4]
        pl = wfile.read(ln)
        if t == 0:
            data_frames.append((pl, fl))
    assert all(len(pl) <= 16384 for pl, _ in data_frames), [
        len(pl) for pl, _ in data_frames
    ]
    assert b"".join(pl for pl, _ in data_frames) == body
    assert data_frames[-1][1] & 0x1, "END_STREAM on final DATA frame"


def test_h2_settings_initial_window_size_unblocks_flow_controlled_send():
    """RFC 7540 §6.9.2: a client may reopen a stream's send window by
    raising SETTINGS_INITIAL_WINDOW_SIZE instead of sending a stream
    WINDOW_UPDATE — the delta applies retroactively to every open
    stream. A >64KiB response exhausts both default windows; the client
    then opens the CONNECTION window with WINDOW_UPDATE(0) but the
    STREAM window only via SETTINGS. The server must parse that
    SETTINGS payload while flow-blocked (not just ACK it), apply the
    delta, and also honor the same frame's mid-stream MAX_FRAME_SIZE
    raise on the remaining DATA frames."""
    import io
    import struct

    from hazelcast_jet_contrib_spark.sources import http2

    def frame(t, fl, sid, pl=b""):
        return (
            struct.pack("!I", len(pl))[1:] + bytes((t, fl))
            + struct.pack("!I", sid) + pl
        )

    rfile = io.BytesIO(
        http2.PREFACE
        + frame(4, 0, 0)  # client SETTINGS (defaults)
        + frame(1, 0x4 | 0x1, 1, bytes([0x83, 0x86, 0x84]))  # POST, END_STREAM
        # consumed while the server is flow-blocked after 65535 bytes:
        + frame(8, 0, 0, struct.pack("!I", 200_000))  # WINDOW_UPDATE conn
        + frame(4, 0, 0, struct.pack("!HI", 4, 200_000)  # INITIAL_WINDOW_SIZE
                + struct.pack("!HI", 5, 32_768))  # MAX_FRAME_SIZE
    )
    wfile = io.BytesIO()
    body = b"y" * 100_000
    http2.serve_connection(rfile, wfile, lambda headers, data: (200, body))

    wfile.seek(0)
    data_frames = []
    while True:
        head = wfile.read(9)
        if len(head) < 9:
            break
        ln = int.from_bytes(head[:3], "big")
        t, fl = head[3], head[4]
        pl = wfile.read(ln)
        if t == 0:
            data_frames.append((pl, fl))
    assert b"".join(pl for pl, _ in data_frames) == body
    assert data_frames[-1][1] & 0x1, "END_STREAM on final DATA frame"
    sizes = [len(pl) for pl, _ in data_frames]
    assert max(sizes) <= 32_768, sizes
    # the post-SETTINGS tail actually used the raised MAX_FRAME_SIZE
    assert any(s > 16_384 for s in sizes), sizes


def test_h2_settings_payload_not_multiple_of_6_goaway_frame_size_error():
    """RFC 7540 §6.5: a SETTINGS frame whose payload length is not a
    multiple of 6 is a connection error of type FRAME_SIZE_ERROR (0x6)
    — the server must answer GOAWAY with that code and close, not die
    in struct.unpack."""
    import io
    import struct

    import pytest

    from hazelcast_jet_contrib_spark.sources import http2

    def frame(t, fl, sid, pl=b""):
        return (
            struct.pack("!I", len(pl))[1:] + bytes((t, fl))
            + struct.pack("!I", sid) + pl
        )

    rfile = io.BytesIO(
        http2.PREFACE + frame(4, 0, 0, b"\x00\x04\x00")  # 3-byte SETTINGS payload
    )
    wfile = io.BytesIO()
    with pytest.raises(ValueError):
        http2.serve_connection(rfile, wfile, lambda headers, data: (200, b""))

    wfile.seek(0)
    goaway = None
    while True:
        head = wfile.read(9)
        if len(head) < 9:
            break
        ln = int.from_bytes(head[:3], "big")
        t = head[3]
        pl = wfile.read(ln)
        if t == 7:  # GOAWAY
            goaway = pl
    assert goaway is not None, "no GOAWAY before teardown"
    _last_sid, err = struct.unpack("!II", goaway[:8])
    assert err == 0x6  # FRAME_SIZE_ERROR


def test_h2_settings_initial_window_above_2_31_goaway_flow_control_error():
    """RFC 7540 §6.9.2: SETTINGS_INITIAL_WINDOW_SIZE above 2^31-1 is a
    connection error of type FLOW_CONTROL_ERROR (0x3)."""
    import io
    import struct

    import pytest

    from hazelcast_jet_contrib_spark.sources import http2

    def frame(t, fl, sid, pl=b""):
        return (
            struct.pack("!I", len(pl))[1:] + bytes((t, fl))
            + struct.pack("!I", sid) + pl
        )

    rfile = io.BytesIO(
        http2.PREFACE + frame(4, 0, 0, struct.pack("!HI", 4, 2**31))
    )
    wfile = io.BytesIO()
    with pytest.raises(ValueError):
        http2.serve_connection(rfile, wfile, lambda headers, data: (200, b""))

    wfile.seek(0)
    goaway = None
    while True:
        head = wfile.read(9)
        if len(head) < 9:
            break
        ln = int.from_bytes(head[:3], "big")
        t = head[3]
        pl = wfile.read(ln)
        if t == 7:  # GOAWAY
            goaway = pl
    assert goaway is not None, "no GOAWAY before teardown"
    _last_sid, err = struct.unpack("!II", goaway[:8])
    assert err == 0x3  # FLOW_CONTROL_ERROR


def test_durable_ack_group_commit_coalesces_concurrent_posts(
    tmp_path, monkeypatch
):
    """Round 15: concurrent durable-ack requests GROUP-COMMIT — one
    leader writes every body buffered for the generation as a single
    segment while followers await its durability, so N racing
    producers land in far fewer than N segments with no body lost,
    duplicated, or acknowledged-before-durable.

    The segment write is throttled by ~10 ms (the flush-failure test's
    append_segment seam) so follower overlap is STRUCTURAL, not a race
    to win: coalescing happens exactly when bodies arrive during a
    leader's write, and on a loaded host the unthrottled version
    sometimes serialized arrivals so perfectly that every segment held
    one body (r17 flake: 200 posts -> >150 segments). A broken group
    commit still fails the bound — one-segment-per-request is one
    segment per request no matter how slow each write is."""
    import threading
    import time as _time

    import hazelcast_jet_contrib_spark.streaming.message_log as ml

    real_append = ml.append_segment

    def slow_append(root, stream, records, seq=None, seq_hint=None):
        _time.sleep(0.01)
        return real_append(root, stream, records, seq)

    monkeypatch.setattr(ml, "append_segment", slow_append)
    spool = str(tmp_path / "spool")
    src = HttpListenerSource(spool).start()
    n, workers = 200, 8
    ids = iter(range(n))
    lock = threading.Lock()

    def producer():
        while True:
            with lock:
                i = next(ids, None)
            if i is None:
                return
            assert _post(src.address, json.dumps({"i": i})).status == 200

    try:
        ts = [threading.Thread(target=producer) for _ in range(workers)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=60)
    finally:
        src.stop()
    segs = sorted((tmp_path / "spool" / "http").glob("*.jsonl"))
    bodies = [json.loads(line)["value"] for s in segs for line in open(s)]
    assert sorted(json.loads(b)["i"] for b in bodies) == list(range(n))
    # coalescing must be REAL: with 8 concurrent producers the leader
    # absorbs followers' bodies — far fewer segments than requests
    # (sequential worst case would be n; require at least 25% saved)
    assert len(segs) <= 3 * n // 4, (n, len(segs))


def test_durable_ack_flush_failure_errors_every_covered_request(
    tmp_path, monkeypatch
):
    """A failed group-commit write must error EVERY request of that
    generation (no 200 without a durable body) and leave later
    generations working."""
    import hazelcast_jet_contrib_spark.streaming.message_log as ml

    spool = str(tmp_path / "spool")
    src = HttpListenerSource(spool).start()
    real_append = ml.append_segment
    state = {"fail": 1}

    def flaky(root, stream, records, seq=None, seq_hint=None):
        if state["fail"]:
            state["fail"] -= 1
            raise OSError(28, "No space left on device (injected)")
        return real_append(root, stream, records, seq)

    monkeypatch.setattr(ml, "append_segment", flaky)
    try:
        failed = False
        try:
            _post(src.address, json.dumps({"i": 0}))
        except Exception:
            failed = True
        assert failed, "a lost write must never be acknowledged with 200"
        assert _post(src.address, json.dumps({"i": 1})).status == 200
    finally:
        src.stop()
    segs = sorted((tmp_path / "spool" / "http").glob("*.jsonl"))
    bodies = [json.loads(line)["value"] for s in segs for line in open(s)]
    assert bodies == ['{"i": 1}'], bodies


def _collect_sse(url, out, stop_token):
    """Minimal SSE client: append each event's data payload to `out`
    until the stop token arrives."""
    req = urllib.request.Request(url)
    with urllib.request.urlopen(req, timeout=30) as resp:
        while True:
            line = resp.readline()
            if not line:
                return
            text = line.decode().strip()
            if text.startswith("data: "):
                payload = text[len("data: "):]
                if payload == stop_token:
                    return
                out.append(payload)


def test_sse_roundtrip_driver_row_shape(spark):
    """Round-15 prep for the round-16 spare-slot candidate
    (ROUND15_PLAN.md §Round-16): the K8 sink driven in the full
    driver-row shape — a bounded events fixture pushed through the
    REAL foreachBatch adapter (toJSON -> toLocalIterator -> publish)
    to TWO concurrently-connected live SSE clients, each collecting
    until a sentinel. Every row must reach EVERY client exactly once
    (live-delivery contract: retention policy is not delivery policy),
    bodies intact — the r16 registry row adds the DuckDB oracle on
    top of exactly this pipeline."""
    import threading
    import time

    from hazelcast_jet_contrib_spark.registry import table
    from tests.conftest import SMOKE_SF

    src = (
        table(spark, SMOKE_SF, "events")
        .filter(F.col("event_id") % 7 == 0)
        .select("event_id", "event_type", "value")
    )
    expected = {(r["event_id"], r["event_type"]) for r in src.collect()}
    assert len(expected) > 50, "fixture must be non-trivial"
    sentinel = '{"_eof": 1}'
    sink = SsePushSink(max_buffer=50_000).start()
    outs: list[list[str]] = [[], []]
    try:
        clients = [
            threading.Thread(target=_collect_sse, args=(sink.address, o, sentinel))
            for o in outs
        ]
        for c in clients:
            c.start()
        time.sleep(0.2)  # both clients live before the batch lands
        sink.foreach_batch()(src, 0)
        sink.publish(sentinel)
        for c in clients:
            c.join(timeout=30)
            assert not c.is_alive(), "SSE client hung before the sentinel"
    finally:
        sink.stop()
    for out in outs:
        got = [(json.loads(p)["event_id"], json.loads(p)["event_type"]) for p in out]
        assert len(got) == len(expected), "duplicate or lost push"
        assert set(got) == expected


def test_sse_push_sink_h2_streaming_client_stops_at_sentinel():
    """get_h2c_stream (the post_h2c complement) consumes the sink's h2
    event stream frame-by-frame and early-exits on a sentinel without
    waiting out the server's idle timeout — the client shape the r16
    SSE driver row's h2 leg uses."""
    import time

    from hazelcast_jet_contrib_spark.sources import http2

    sink = SsePushSink().start()
    try:
        for i in range(5):
            sink.publish(json.dumps({"n": i}))
        sink.publish('{"_eof": 1}')
        host, port = sink._server.server_address[:2]
        t = time.perf_counter()
        status, chunks = http2.get_h2c_stream(
            host, port, stop=lambda c: b"_eof" in c
        )
        took = time.perf_counter() - t
    finally:
        sink.stop()
    assert status == "200"
    events = [json.loads(c.decode().strip()[len("data: "):]) for c in chunks[:-1]]
    assert [e["n"] for e in events] == [0, 1, 2, 3, 4]
    assert took < 4, f"sentinel exit must beat the 5s idle close ({took:.1f}s)"


def test_h2_stream_larger_than_default_window_drains(spark):
    """Review r15 #1 (reproduced): without client WINDOW_UPDATEs any h2
    response stream past the 65535-byte initial window deadlocked the
    server's _send_data. get_h2c_stream now replenishes both windows
    per DATA frame, so a ~200KiB event stream drains completely."""
    from hazelcast_jet_contrib_spark.sources import http2

    sink = SsePushSink(max_buffer=5000).start()
    try:
        payload = "x" * 1000
        for i in range(200):  # ~200KiB of events, >3 windows
            sink.publish(json.dumps({"n": i, "pad": payload}))
        sink.publish('{"_eof": 1}')
        host, port = sink._server.server_address[:2]
        status, chunks = http2.get_h2c_stream(
            host, port, timeout=20, stop=lambda c: b"_eof" in c
        )
    finally:
        sink.stop()
    assert status == "200"
    # frames split at window/max-frame boundaries, not event boundaries:
    # reassemble the byte stream, then parse SSE events
    text = b"".join(chunks).decode()
    events = [
        json.loads(block[len("data: "):])
        for block in text.split("\n\n")
        if block.startswith("data: ")
    ]
    ns = [e["n"] for e in events if "n" in e]
    assert ns == list(range(200)), f"lost frames past the 64KiB window: {len(ns)}"


def test_listener_keeps_http11_connection_alive_across_requests(tmp_path):
    """Review r15 #2 (reproduced): the stdlib handler's HTTP/1.0
    default closed the connection after every request, silently
    reconnecting 'keep-alive' producers (and dropping their socket
    options). The listener must answer HTTP/1.1 with Content-Length on
    every non-streaming response and reuse the connection."""
    from http.client import HTTPConnection

    spool = str(tmp_path / "spool")
    src = HttpListenerSource(spool, require_json=True).start()
    try:
        host, port = src._server.server_address[:2]
        conn = HTTPConnection(host, port, timeout=10)
        conn.request("POST", "/", b'{"i": 1}')
        r1 = conn.getresponse()
        r1.read()
        assert r1.version == 11 and not r1.will_close
        sock1 = conn.sock
        # a 400 must also be framed (Content-Length) and keep the
        # connection usable
        conn.request("POST", "/", b"{not json")
        r2 = conn.getresponse()
        body = r2.read()
        assert r2.status == 400 and body == b"malformed JSON"
        assert not r2.will_close
        conn.request("POST", "/", b'{"i": 2}')
        r3 = conn.getresponse()
        r3.read()
        assert r3.status == 200
        assert conn.sock is sock1, "keep-alive connection was not reused"
        conn.close()
    finally:
        src.stop()
    segs = sorted((tmp_path / "spool" / "http").glob("*.jsonl"))
    bodies = [json.loads(line)["value"] for s in segs for line in open(s)]
    assert bodies == ['{"i": 1}', '{"i": 2}']


def test_post_h2c_empty_bodies_returns_empty():
    """Review r15 #4: post_h2c([]) crashed encoding GOAWAY stream -1;
    an empty slice (tiny SF fixtures) must be a no-op."""
    from hazelcast_jet_contrib_spark.sources import http2

    assert http2.post_h2c("127.0.0.1", 1, []) == []  # no connection made


def test_sse_push_roundtrip_staged_r16_driver_comparison(spark):
    """The STAGED round-16 K8 driver row run through the EXACT driver
    comparison (row count + columns + normalized value multiset vs its
    DuckDB oracle) — the retired-query discipline applied forward:
    round 16 promotes the pair with @query and changes nothing else."""
    from hazelcast_jet_contrib_spark.queries_connectors import (
        SSE_PUSH_ROUNDTRIP_ORACLE,
        sse_push_roundtrip,
    )
    from tests.conftest import CORRECTNESS_SF, compare_with_oracle

    compare_with_oracle(
        spark,
        "sse_push_roundtrip",
        CORRECTNESS_SF,
        queries={"sse_push_roundtrip": sse_push_roundtrip},
        oracles={"sse_push_roundtrip": SSE_PUSH_ROUNDTRIP_ORACLE},
    )


def test_ws_push_roundtrip_staged_r17_driver_comparison(spark):
    """The STAGED round-17 K8 websocket driver row run through the
    EXACT driver comparison (row count + columns + normalized value
    multiset vs its DuckDB oracle) — the same forward-staging
    discipline the SSE row followed from round 15 to 16: round 17
    promotes the pair with @query and changes nothing else."""
    from hazelcast_jet_contrib_spark.queries_connectors import (
        WS_PUSH_ROUNDTRIP_ORACLE,
        ws_push_roundtrip,
    )
    from tests.conftest import CORRECTNESS_SF, compare_with_oracle

    compare_with_oracle(
        spark,
        "ws_push_roundtrip",
        CORRECTNESS_SF,
        queries={"ws_push_roundtrip": ws_push_roundtrip},
        oracles={"ws_push_roundtrip": WS_PUSH_ROUNDTRIP_ORACLE},
    )


def test_durable_ack_group_commit_exact_under_injected_scheduling_jitter(
    tmp_path, monkeypatch
):
    """The round-15 driver gate's failure class — '200-acked but
    absent/duplicated at read' under HOST load no local rerun
    reproduces (VERDICT r15 #1) — hammered deterministically: every
    spool append is delayed by a seeded pseudo-random 0-8 ms, holding
    each group-commit leader in its write long enough that followers
    pile up across MANY generations and every leader hand-off window
    (claim → write → verdict → next leader) is exercised under real
    thread preemption. 400 bodies over 12 keep-alive producers must
    land exactly once each — the audit is the per-key set comparison
    the driver rows now run inline."""
    import random
    import threading
    import time as _time
    from http.client import HTTPConnection

    import hazelcast_jet_contrib_spark.streaming.message_log as ml

    spool = str(tmp_path / "spool")
    real_append = ml.append_segment
    rng = random.Random(0xC0FFEE)
    delay_lock = threading.Lock()

    def slow_append(root, stream, records, seq=None, seq_hint=None):
        with delay_lock:
            d = rng.uniform(0, 0.008)
        _time.sleep(d)
        return real_append(root, stream, records, seq)

    monkeypatch.setattr(ml, "append_segment", slow_append)
    src = HttpListenerSource(spool, durable_ack=True).start()
    n, workers = 400, 12
    ids = iter(range(n))
    lock = threading.Lock()
    failures: list[str] = []

    def producer():
        host, port = src._server.server_address[:2]
        conn = HTTPConnection(host, port, timeout=30)
        try:
            while True:
                with lock:
                    i = next(ids, None)
                if i is None:
                    return
                conn.request(
                    "POST", "/", json.dumps({"i": i}),
                    {"Content-Type": "application/json"},
                )
                r = conn.getresponse()
                r.read()
                if r.status != 200:
                    failures.append(f"i={i}: HTTP {r.status}")
                    return
        except Exception as ex:
            failures.append(repr(ex))
        finally:
            conn.close()

    try:
        ts = [threading.Thread(target=producer) for _ in range(workers)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=120)
            assert not t.is_alive(), "producer hung past 120s"
    finally:
        src.stop()
    assert not failures, failures
    segs = sorted((tmp_path / "spool" / "http").glob("*.jsonl"))
    got = sorted(
        json.loads(json.loads(line)["value"])["i"]
        for s in segs
        for line in open(s)
    )
    missing = sorted(set(range(n)) - set(got))
    dup = sorted(i for i in set(got) if got.count(i) > 1)
    assert got == list(range(n)), (
        f"missing={missing[:20]} duplicated={dup[:20]} total={len(got)}"
    )


def test_listener_rejects_transfer_encoding_with_501_and_close(tmp_path):
    """ADVICE r15 #5 pin: the handler frames bodies by Content-Length
    only; a chunked request must get 501 + connection close (an unread
    chunked body left in a keep-alive buffer would be parsed as the
    next request), the body must NOT reach the spool, and the server
    must keep serving fresh connections."""
    from http.client import HTTPConnection

    spool = str(tmp_path / "spool")
    src = HttpListenerSource(spool, require_json=True).start()
    try:
        host, port = src._server.server_address[:2]
        conn = HTTPConnection(host, port, timeout=10)
        conn.putrequest("POST", "/")
        conn.putheader("Transfer-Encoding", "chunked")
        conn.putheader("Content-Type", "application/json")
        conn.endheaders()
        conn.send(b'8\r\n{"i": 1}\r\n0\r\n\r\n')
        r = conn.getresponse()
        body = r.read()
        assert r.status == 501, r.status
        assert b"Content-Length" in bytes(str(r.headers), "ascii").replace(
            b"content-length", b"Content-Length"
        )
        assert b"Transfer-Encoding" in body
        # close is signaled: http.client drops the socket on seeing
        # Connection: close; otherwise the raw read returns EOF
        assert r.getheader("Connection") == "close"
        assert conn.sock is None or conn.sock.recv(1) == b""
        conn.close()
        # fresh connections still served
        assert _post(src.address, json.dumps({"i": 2})).status == 200
    finally:
        src.stop()
    segs = sorted((tmp_path / "spool" / "http").glob("*.jsonl"))
    bodies = [json.loads(line)["value"] for s in segs for line in open(s)]
    assert bodies == ['{"i": 2}'], bodies


def test_websocket_400_is_length_framed_and_closes(tmp_path):
    """ADVICE r15 #4 pin: the WS sink's 400 for a non-upgrade request
    must carry Content-Length and close the connection — under the
    HTTP/1.1 handler default an unframed body would leave the client
    reading forever."""
    from http.client import HTTPConnection

    from hazelcast_jet_contrib_spark.sources.http_listener import WebSocketPushSink

    sink = WebSocketPushSink().start()
    try:
        host, port = sink._server.server_address[:2]
        conn = HTTPConnection(host, port, timeout=10)
        conn.request("GET", "/")  # no Upgrade headers
        r = conn.getresponse()
        body = r.read()
        assert r.status == 400, r.status
        assert r.getheader("Content-Length") == str(len(body))
        assert body == b"websocket upgrade required"
        assert r.getheader("Connection") == "close"
        assert conn.sock is None or conn.sock.recv(1) == b""
        conn.close()
    finally:
        sink.stop()


def test_sse_data_rows_drops_split_sentinel_blocks():
    """Review r16 #1 pin: the h2 SSE client's block parser must never
    count the sentinel as a data row, however the DATA frames split —
    complete, delimiter-less-tail, and MID-SENTINEL truncations (the
    stop callback fires on '"_eof"' before the closing brace arrives,
    so the final block can be unparseable JSON)."""
    from hazelcast_jet_contrib_spark.queries_connectors import _sse_data_rows

    rows = 'data: {"a": 1}\n\ndata: {"b": 2}\n\n'
    assert _sse_data_rows(rows + 'data: {"_eof": 1}\n\n') == [
        '{"a": 1}', '{"b": 2}'
    ]
    # sentinel's trailing \n\n in an unread frame
    assert _sse_data_rows(rows + 'data: {"_eof": 1}\n') == [
        '{"a": 1}', '{"b": 2}'
    ]
    # stop() fired mid-sentinel: unparseable fragment
    assert _sse_data_rows(rows + 'data: {"_eof"') == [
        '{"a": 1}', '{"b": 2}'
    ]
    # non-data noise (comments, blank blocks) ignored
    assert _sse_data_rows(": keepalive\n\n" + rows) == [
        '{"a": 1}', '{"b": 2}'
    ]
