"""HTTP(S) listener source + push sink — the reference's `http` module
re-landed on Spark's pull-based streaming model.

Reference behavior (http/.../HttpListenerSourceBuilder.java:36-254):
an embedded HTTP server accepts POST/PUT payloads, maps them to String /
JSON bean / custom type, and feeds the pipeline; malformed JSON returns
HTTP 400 (HttpListenerSourceContext.java:103-107). The sink side pushes
results to connected WebSocket/SSE clients (HttpListenerSinks.java:41-146).

Push-based sources don't fit Spark's replayable pull model (SURVEY.md
§7 risk 3), so the listener spools accepted payloads into a message-log
directory (the bounded-queue analog, but durable + replayable) and the
pipeline reads it with the `message_log` streaming source — giving the
webhook path the same exactly-once restart semantics the reference
reserves for its offset-snapshotting sources. JSON-bean mapping becomes
`from_json(schema)` downstream.

The sink serves the latest results over Server-Sent Events from a
single endpoint — the analog of forceTotalParallelismOne
(HttpListenerSinkBuilder.java:253-263): one serving point, fed by
foreachBatch.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from hazelcast_jet_contrib_spark.streaming import message_log


class HttpListenerSource:
    """Embedded HTTP server spooling POST/PUT bodies into a message-log
    stream. Start one per ingest endpoint; read with:

        spark.readStream.format("message_log").option("path", spool_dir)

    `require_json=True` rejects malformed JSON with HTTP 400 (parity with
    the reference's Undertow handler)."""

    def __init__(
        self,
        spool_dir: str,
        stream_name: str = "http",
        host: str = "127.0.0.1",
        port: int = 0,
        require_json: bool = False,
        batch_size: int = 100,
        tls: tuple[str, str] | None = None,
    ):
        """``tls=(certfile, keyfile)`` serves HTTPS (the reference's SSL
        listener, HttpListenerSourceBuilder SSL context + mutual-auth
        surface; HttpListenerSourceTest.java:76-113): plaintext requests
        to a TLS listener are rejected at the handshake."""
        self.spool_dir = spool_dir
        self.stream_name = stream_name
        self.require_json = require_json
        self.batch_size = batch_size
        self._buf: list[dict] = []
        self._lock = threading.Lock()
        self._server = ThreadingHTTPServer((host, port), self._handler_class())
        self._tls = tls is not None
        if tls is not None:
            import ssl

            ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
            ctx.load_cert_chain(certfile=tls[0], keyfile=tls[1])
            self._server.socket = ctx.wrap_socket(self._server.socket, server_side=True)
        self._thread: threading.Thread | None = None

    @property
    def address(self) -> str:
        host, port = self._server.server_address[:2]
        scheme = "https" if self._tls else "http"
        return f"{scheme}://{host}:{port}"

    def _handler_class(self):
        source = self

        class Handler(BaseHTTPRequestHandler):
            def _accept(self):
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length).decode("utf-8", errors="replace")
                if source.require_json:
                    try:
                        json.loads(body)
                    except json.JSONDecodeError:
                        self.send_response(400)
                        self.end_headers()
                        self.wfile.write(b"malformed JSON")
                        return
                source._enqueue(body)
                self.send_response(200)
                self.end_headers()

            do_POST = _accept
            do_PUT = _accept

            def log_message(self, *args):  # quiet
                pass

        return Handler

    def _enqueue(self, body: str) -> None:
        with self._lock:
            self._buf.append({"key": None, "value": body})
            if len(self._buf) >= self.batch_size:
                self._flush_locked()

    def _flush_locked(self) -> None:
        if self._buf:
            message_log.append_segment(self.spool_dir, self.stream_name, self._buf)
            self._buf = []

    def flush(self) -> None:
        with self._lock:
            self._flush_locked()

    def start(self) -> "HttpListenerSource":
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self.flush()
        self._server.shutdown()
        self._server.server_close()


class SsePushSink:
    """Server-Sent-Events push sink: an HTTP endpoint streaming every
    row appended by the pipeline to connected clients; rows arriving
    while no client is connected accumulate up to `max_buffer`, dropping
    the oldest (HttpListenerSinkContext.java:128-152 contract)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0, max_buffer: int = 1000):
        self.max_buffer = max_buffer
        self._rows: list[str] = []
        self._cv = threading.Condition()
        self._server = ThreadingHTTPServer((host, port), self._handler_class())
        self._thread: threading.Thread | None = None

    @property
    def address(self) -> str:
        host, port = self._server.server_address[:2]
        return f"http://{host}:{port}"

    def _handler_class(self):
        sink = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):
                self.send_response(200)
                self.send_header("Content-Type", "text/event-stream")
                self.end_headers()
                sent = 0
                try:
                    while True:
                        with sink._cv:
                            sink._cv.wait_for(lambda: len(sink._rows) > sent, timeout=5)
                            rows = sink._rows[sent:]
                            sent = len(sink._rows)
                        if not rows:
                            break
                        for r in rows:
                            self.wfile.write(f"data: {r}\n\n".encode())
                        self.wfile.flush()
                except (BrokenPipeError, ConnectionResetError):
                    pass

            def log_message(self, *args):
                pass

        return Handler

    def publish(self, row_json: str) -> None:
        with self._cv:
            self._rows.append(row_json)
            if len(self._rows) > self.max_buffer:
                # drop-oldest accumulation policy
                self._rows = self._rows[-self.max_buffer :]
            self._cv.notify_all()

    def foreach_batch(self):
        """foreachBatch adapter: rows are pushed in JSON form. The sink
        collects each (small, already-aggregated) result batch to the
        driver — the single-serving-point analog of
        forceTotalParallelismOne."""

        def fn(batch_df, epoch_id: int) -> None:
            for row in batch_df.toJSON().collect():
                self.publish(row)

        return fn

    def start(self) -> "SsePushSink":
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
