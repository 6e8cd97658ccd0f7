"""Minimal HTTP/2 (RFC 7540) server path + HPACK (RFC 7541) codec for
the HTTP listener source — closes the one reference capability the
HTTP/1.1-only stdlib server lacked: the reference enables HTTP/2
unconditionally on its embedded Undertow listener
(`http/.../HttpListenerSourceContext.java:80`,
`HttpListenerSinkContext.java:86` — `setServerOption(ENABLE_HTTP2,
true)`).

Scope is deliberately the listener's contract, not a general web
server: accept POST/PUT request streams (h2c prior-knowledge on
cleartext, ALPN-negotiated h2 on TLS), hand the decoded headers + body
to the same ingest callback the HTTP/1.1 handler uses, and answer with
:status + small body. Flow-control windows are replenished after every
DATA frame so uploads never stall; outgoing DATA honors the peer's
SETTINGS_MAX_FRAME_SIZE and both send windows (WINDOW_UPDATEs are
consumed while blocked, so streaming SSE responses larger than the
64 KiB default window drain correctly). No server push, no
prioritization (both optional for servers).

The HPACK implementation is complete — integer/string primitives, the
61-entry static table, a size-bounded dynamic table, and the full
Appendix-B Huffman code (validated prefix-free with Kraft sum exactly
1.0, spot-checked against the RFC's examples in
tests/test_http_listener.py, and exercised for real by curl/nghttp2's
Huffman-encoded requests). Responses use literal-without-indexing
fields only, which every conformant decoder must accept.
"""

from __future__ import annotations

import struct
from collections import deque
from collections.abc import Callable

# -- RFC 7541 Appendix B Huffman code: (nbits, code) indexed by symbol;
# symbol 256 is EOS. Public-spec data (verified prefix-free, Kraft
# sum == 1.0; see module docstring).
# fmt: off
_HUFF = [
    (13, 0x1ff8), (23, 0x7fffd8), (28, 0xfffffe2), (28, 0xfffffe3),
    (28, 0xfffffe4), (28, 0xfffffe5), (28, 0xfffffe6), (28, 0xfffffe7),
    (28, 0xfffffe8), (24, 0xffffea), (30, 0x3ffffffc), (28, 0xfffffe9),
    (28, 0xfffffea), (30, 0x3ffffffd), (28, 0xfffffeb), (28, 0xfffffec),
    (28, 0xfffffed), (28, 0xfffffee), (28, 0xfffffef), (28, 0xffffff0),
    (28, 0xffffff1), (28, 0xffffff2), (30, 0x3ffffffe), (28, 0xffffff3),
    (28, 0xffffff4), (28, 0xffffff5), (28, 0xffffff6), (28, 0xffffff7),
    (28, 0xffffff8), (28, 0xffffff9), (28, 0xffffffa), (28, 0xffffffb),
    (6, 0x14), (10, 0x3f8), (10, 0x3f9), (12, 0xffa),
    (13, 0x1ff9), (6, 0x15), (8, 0xf8), (11, 0x7fa),
    (10, 0x3fa), (10, 0x3fb), (8, 0xf9), (11, 0x7fb),
    (8, 0xfa), (6, 0x16), (6, 0x17), (6, 0x18),
    (5, 0x0), (5, 0x1), (5, 0x2), (6, 0x19),
    (6, 0x1a), (6, 0x1b), (6, 0x1c), (6, 0x1d),
    (6, 0x1e), (6, 0x1f), (7, 0x5c), (8, 0xfb),
    (15, 0x7ffc), (6, 0x20), (12, 0xffb), (10, 0x3fc),
    (13, 0x1ffa), (6, 0x21), (7, 0x5d), (7, 0x5e),
    (7, 0x5f), (7, 0x60), (7, 0x61), (7, 0x62),
    (7, 0x63), (7, 0x64), (7, 0x65), (7, 0x66),
    (7, 0x67), (7, 0x68), (7, 0x69), (7, 0x6a),
    (7, 0x6b), (7, 0x6c), (7, 0x6d), (7, 0x6e),
    (7, 0x6f), (7, 0x70), (7, 0x71), (7, 0x72),
    (8, 0xfc), (7, 0x73), (8, 0xfd), (13, 0x1ffb),
    (19, 0x7fff0), (13, 0x1ffc), (14, 0x3ffc), (6, 0x22),
    (15, 0x7ffd), (5, 0x3), (6, 0x23), (5, 0x4),
    (6, 0x24), (5, 0x5), (6, 0x25), (6, 0x26),
    (6, 0x27), (5, 0x6), (7, 0x74), (7, 0x75),
    (6, 0x28), (6, 0x29), (6, 0x2a), (5, 0x7),
    (6, 0x2b), (7, 0x76), (6, 0x2c), (5, 0x8),
    (5, 0x9), (6, 0x2d), (7, 0x77), (7, 0x78),
    (7, 0x79), (7, 0x7a), (7, 0x7b), (15, 0x7ffe),
    (11, 0x7fc), (14, 0x3ffd), (13, 0x1ffd), (28, 0xffffffc),
    (20, 0xfffe6), (22, 0x3fffd2), (20, 0xfffe7), (20, 0xfffe8),
    (22, 0x3fffd3), (22, 0x3fffd4), (22, 0x3fffd5), (23, 0x7fffd9),
    (22, 0x3fffd6), (23, 0x7fffda), (23, 0x7fffdb), (23, 0x7fffdc),
    (23, 0x7fffdd), (23, 0x7fffde), (24, 0xffffeb), (23, 0x7fffdf),
    (24, 0xffffec), (24, 0xffffed), (22, 0x3fffd7), (23, 0x7fffe0),
    (24, 0xffffee), (23, 0x7fffe1), (23, 0x7fffe2), (23, 0x7fffe3),
    (23, 0x7fffe4), (21, 0x1fffdc), (22, 0x3fffd8), (23, 0x7fffe5),
    (22, 0x3fffd9), (23, 0x7fffe6), (23, 0x7fffe7), (24, 0xffffef),
    (22, 0x3fffda), (21, 0x1fffdd), (20, 0xfffe9), (22, 0x3fffdb),
    (22, 0x3fffdc), (23, 0x7fffe8), (23, 0x7fffe9), (21, 0x1fffde),
    (23, 0x7fffea), (22, 0x3fffdd), (22, 0x3fffde), (24, 0xfffff0),
    (21, 0x1fffdf), (22, 0x3fffdf), (23, 0x7fffeb), (23, 0x7fffec),
    (21, 0x1fffe0), (21, 0x1fffe1), (22, 0x3fffe0), (21, 0x1fffe2),
    (23, 0x7fffed), (22, 0x3fffe1), (23, 0x7fffee), (23, 0x7fffef),
    (20, 0xfffea), (22, 0x3fffe2), (22, 0x3fffe3), (22, 0x3fffe4),
    (23, 0x7ffff0), (22, 0x3fffe5), (22, 0x3fffe6), (23, 0x7ffff1),
    (26, 0x3ffffe0), (26, 0x3ffffe1), (20, 0xfffeb), (19, 0x7fff1),
    (22, 0x3fffe7), (23, 0x7ffff2), (22, 0x3fffe8), (25, 0x1ffffec),
    (26, 0x3ffffe2), (26, 0x3ffffe3), (26, 0x3ffffe4), (27, 0x7ffffde),
    (27, 0x7ffffdf), (26, 0x3ffffe5), (24, 0xfffff1), (25, 0x1ffffed),
    (19, 0x7fff2), (21, 0x1fffe3), (26, 0x3ffffe6), (27, 0x7ffffe0),
    (27, 0x7ffffe1), (26, 0x3ffffe7), (27, 0x7ffffe2), (24, 0xfffff2),
    (21, 0x1fffe4), (21, 0x1fffe5), (26, 0x3ffffe8), (26, 0x3ffffe9),
    (28, 0xffffffd), (27, 0x7ffffe3), (27, 0x7ffffe4), (27, 0x7ffffe5),
    (20, 0xfffec), (24, 0xfffff3), (20, 0xfffed), (21, 0x1fffe6),
    (22, 0x3fffe9), (21, 0x1fffe7), (21, 0x1fffe8), (23, 0x7ffff3),
    (22, 0x3fffea), (22, 0x3fffeb), (25, 0x1ffffee), (25, 0x1ffffef),
    (24, 0xfffff4), (24, 0xfffff5), (26, 0x3ffffea), (23, 0x7ffff4),
    (26, 0x3ffffeb), (27, 0x7ffffe6), (26, 0x3ffffec), (26, 0x3ffffed),
    (27, 0x7ffffe7), (27, 0x7ffffe8), (27, 0x7ffffe9), (27, 0x7ffffea),
    (27, 0x7ffffeb), (28, 0xffffffe), (27, 0x7ffffec), (27, 0x7ffffed),
    (27, 0x7ffffee), (27, 0x7ffffef), (27, 0x7fffff0), (26, 0x3ffffee),
    (30, 0x3fffffff),
]
# fmt: on

_DECODE = {(n, c): sym for sym, (n, c) in enumerate(_HUFF)}
_EOS = 256


def huffman_decode(data: bytes) -> bytes:
    """Decode an RFC 7541 Huffman-coded string. Padding must be the
    most-significant bits of EOS (all ones, < 8 bits); an embedded EOS
    or over-long padding is a decoding error."""
    out = bytearray()
    cur = 0
    nbits = 0
    for byte in data:
        for shift in range(7, -1, -1):
            cur = (cur << 1) | ((byte >> shift) & 1)
            nbits += 1
            sym = _DECODE.get((nbits, cur))
            if sym is not None:
                if sym == _EOS:
                    raise ValueError("EOS in huffman string")
                out.append(sym)
                cur = 0
                nbits = 0
            elif nbits > 30:
                raise ValueError("invalid huffman code")
    if nbits >= 8 or cur != (1 << nbits) - 1:
        raise ValueError("invalid huffman padding")
    return bytes(out)


# -- RFC 7541 Appendix A static table (1-indexed) ------------------------
_STATIC = [
    (":authority", ""), (":method", "GET"), (":method", "POST"),
    (":path", "/"), (":path", "/index.html"), (":scheme", "http"),
    (":scheme", "https"), (":status", "200"), (":status", "204"),
    (":status", "206"), (":status", "304"), (":status", "400"),
    (":status", "404"), (":status", "500"), ("accept-charset", ""),
    ("accept-encoding", "gzip, deflate"), ("accept-language", ""),
    ("accept-ranges", ""), ("accept", ""),
    ("access-control-allow-origin", ""), ("age", ""), ("allow", ""),
    ("authorization", ""), ("cache-control", ""),
    ("content-disposition", ""), ("content-encoding", ""),
    ("content-language", ""), ("content-length", ""),
    ("content-location", ""), ("content-range", ""), ("content-type", ""),
    ("cookie", ""), ("date", ""), ("etag", ""), ("expect", ""),
    ("expires", ""), ("from", ""), ("host", ""), ("if-match", ""),
    ("if-modified-since", ""), ("if-none-match", ""), ("if-range", ""),
    ("if-unmodified-since", ""), ("last-modified", ""), ("link", ""),
    ("location", ""), ("max-forwards", ""), ("proxy-authenticate", ""),
    ("proxy-authorization", ""), ("range", ""), ("referer", ""),
    ("refresh", ""), ("retry-after", ""), ("server", ""),
    ("set-cookie", ""), ("strict-transport-security", ""),
    ("transfer-encoding", ""), ("user-agent", ""), ("vary", ""),
    ("via", ""), ("www-authenticate", ""),
]


class HpackDecoder:
    """Stateful HPACK decoder — one per HTTP/2 connection. The dynamic
    table MUST be maintained across every header block of the
    connection, even blocks whose fields the server ignores."""

    def __init__(self, max_table_size: int = 4096):
        self.max_size = max_table_size
        self._settings_cap = max_table_size
        self._dyn: deque[tuple[str, str]] = deque()
        self._dyn_size = 0

    # -- primitives ---------------------------------------------------
    @staticmethod
    def _int(data: bytes, pos: int, prefix_bits: int) -> tuple[int, int]:
        if pos >= len(data):
            raise ValueError("truncated hpack integer")
        mask = (1 << prefix_bits) - 1
        v = data[pos] & mask
        pos += 1
        if v < mask:
            return v, pos
        shift = 0
        while True:
            if pos >= len(data):  # continuation bit set on final byte
                raise ValueError("truncated hpack integer")
            b = data[pos]
            pos += 1
            v += (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                return v, pos

    def _str(self, data: bytes, pos: int) -> tuple[str, int]:
        huff = bool(data[pos] & 0x80)
        length, pos = self._int(data, pos, 7)
        raw = data[pos : pos + length]
        if len(raw) != length:
            raise ValueError("truncated hpack string")
        pos += length
        if huff:
            raw = huffman_decode(raw)
        return raw.decode("latin-1"), pos

    # -- dynamic table --------------------------------------------------
    def _entry(self, index: int) -> tuple[str, str]:
        if index <= 0:
            raise ValueError("hpack index 0")
        if index <= len(_STATIC):
            return _STATIC[index - 1]
        d = index - len(_STATIC) - 1
        if d >= len(self._dyn):
            raise ValueError(f"hpack index {index} beyond tables")
        return self._dyn[d]

    def _add(self, name: str, value: str) -> None:
        size = len(name) + len(value) + 32
        self._dyn.appendleft((name, value))
        self._dyn_size += size
        self._evict()

    def _evict(self) -> None:
        while self._dyn_size > self.max_size and self._dyn:
            n, v = self._dyn.pop()
            self._dyn_size -= len(n) + len(v) + 32

    # -- header block -----------------------------------------------------
    def decode(self, block: bytes) -> list[tuple[str, str]]:
        out: list[tuple[str, str]] = []
        pos = 0
        while pos < len(block):
            b = block[pos]
            if b & 0x80:  # indexed field
                idx, pos = self._int(block, pos, 7)
                out.append(self._entry(idx))
            elif b & 0x40:  # literal with incremental indexing
                idx, pos = self._int(block, pos, 6)
                name = self._entry(idx)[0] if idx else None
                if name is None:
                    name, pos = self._str(block, pos)
                value, pos = self._str(block, pos)
                self._add(name, value)
                out.append((name, value))
            elif b & 0x20:  # dynamic table size update
                size, pos = self._int(block, pos, 5)
                if size > self._settings_cap:
                    raise ValueError("table size update beyond settings cap")
                self.max_size = size
                self._evict()
            else:  # literal without indexing (0000) / never indexed (0001)
                idx, pos = self._int(block, pos, 4)
                name = self._entry(idx)[0] if idx else None
                if name is None:
                    name, pos = self._str(block, pos)
                value, pos = self._str(block, pos)
                out.append((name, value))
        return out


def encode_response_headers(fields: list[tuple[str, str]]) -> bytes:
    """Encode response headers as literal-without-indexing fields with
    literal (non-Huffman) strings — stateless, and every conformant
    HPACK decoder accepts it (RFC 7541 §6.2.2)."""
    out = bytearray()
    for name, value in fields:
        out.append(0x00)  # literal w/o indexing, new name
        nb, vb = name.encode("latin-1"), value.encode("latin-1")
        for s in (nb, vb):
            if len(s) >= 127:
                raise ValueError("long header encoding not needed here")
            out.append(len(s))
            out += s
    return bytes(out)


# -- RFC 7540 frames ------------------------------------------------------
PREFACE = b"PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n"

_DATA, _HEADERS, _PRIORITY, _RST, _SETTINGS, _PUSH, _PING, _GOAWAY, _WINUP, _CONT = range(10)
_FLAG_END_STREAM = 0x1
_FLAG_ACK = 0x1
_FLAG_END_HEADERS = 0x4
_FLAG_PADDED = 0x8
_FLAG_PRIORITY = 0x20


def _frame(ftype: int, flags: int, stream: int, payload: bytes = b"") -> bytes:
    return struct.pack("!I", len(payload))[1:] + bytes((ftype, flags)) + struct.pack(
        "!I", stream & 0x7FFFFFFF
    ) + payload


def _read_exact(rfile, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = rfile.read(n - len(buf))
        if not chunk:
            raise EOFError
        buf += chunk
    return buf


class _Stream:
    __slots__ = (
        "headers", "body", "header_frags", "headers_done", "ended", "send_win",
    )

    def __init__(self, send_win: int = 65535):
        self.headers: dict[str, str] = {}
        self.body = bytearray()
        self.header_frags = bytearray()
        self.headers_done = False
        self.ended = False
        self.send_win = send_win  # peer's receive window for our DATA


def serve_connection(
    rfile,
    wfile,
    handler: Callable[[dict[str, str], bytes], tuple[int, bytes]],
    preface_consumed: bool = False,
) -> None:
    """Serve one HTTP/2 connection until GOAWAY/EOF. ``handler`` gets
    (pseudo+regular headers dict, body bytes) per completed request
    stream and returns (status, response body). Requests on different
    streams are answered in completion order — the multiplexing
    contract."""
    if not preface_consumed:
        if _read_exact(rfile, len(PREFACE)) != PREFACE:
            raise ValueError("bad connection preface")
    wfile.write(_frame(_SETTINGS, 0, 0))  # server settings: all defaults
    wfile.flush()

    hpack = HpackDecoder()
    streams: dict[int, _Stream] = {}
    expect_cont: int | None = None  # stream id whose CONTINUATIONs are due
    # peer-facing send state: connection window, per-stream initial
    # window, and max frame size — all updated from the client's
    # SETTINGS / WINDOW_UPDATE frames
    conn = {"win": 65535, "init_win": 65535, "max_frame": 16384}

    def _goaway(error_code: int) -> None:
        """Send GOAWAY(last_stream_id=highest seen, error_code) before
        tearing the connection down — the RFC 7540 §5.4.1 connection-
        error path (vs. the bare-ValueError handler kill it replaces)."""
        last_sid = max(streams, default=0)
        wfile.write(_frame(_GOAWAY, 0, 0, struct.pack("!II", last_sid, error_code)))
        wfile.flush()

    def _apply_window_update(frame_sid: int, payload: bytes) -> None:
        inc = int.from_bytes(payload[:4], "big") & 0x7FFFFFFF
        if frame_sid == 0:
            conn["win"] += inc
        elif frame_sid in streams:
            streams[frame_sid].send_win += inc

    def _apply_settings(payload: bytes) -> None:
        """Parse + ACK a (non-ACK) SETTINGS frame. Shared by the main
        loop and the flow-control-blocked send loop, so a client that
        reopens the window by raising SETTINGS_INITIAL_WINDOW_SIZE
        (instead of WINDOW_UPDATE) unblocks a pending >64KiB response,
        and a mid-stream MAX_FRAME_SIZE change takes effect immediately.
        SETTINGS_HEADER_TABLE_SIZE (0x1) constrains the peer's DECODER,
        i.e. OUR encoder — which is stateless literal-without-indexing,
        so nothing to do; our decoder's cap stays at the table size WE
        advertised (applying the client's value to our decoder would
        reject conformant clients that advertise 0 while still indexing
        against our default 4096-byte table)."""
        # RFC 7540 §6.5: a SETTINGS payload is a sequence of 6-byte
        # (ident, value) entries — any other length is a connection
        # error of type FRAME_SIZE_ERROR, not an unpack crash
        if len(payload) % 6:
            _goaway(0x6)  # FRAME_SIZE_ERROR
            raise ValueError("SETTINGS payload not a multiple of 6 bytes")
        for off in range(0, len(payload), 6):
            ident, value = struct.unpack_from("!HI", payload, off)
            if ident == 0x4:  # SETTINGS_INITIAL_WINDOW_SIZE
                # §6.9.2: an initial window above 2^31-1 is a
                # connection error of type FLOW_CONTROL_ERROR
                if value > 2**31 - 1:
                    _goaway(0x3)  # FLOW_CONTROL_ERROR
                    raise ValueError(
                        f"SETTINGS_INITIAL_WINDOW_SIZE {value} exceeds 2^31-1"
                    )
                # RFC 7540 §6.9.2: a change to the initial window
                # applies retroactively to every open stream's window
                delta = value - conn["init_win"]
                conn["init_win"] = value
                for s in streams.values():
                    s.send_win += delta
            elif ident == 0x5:  # SETTINGS_MAX_FRAME_SIZE
                conn["max_frame"] = max(16384, min(value, (1 << 24) - 1))
        wfile.write(_frame(_SETTINGS, _FLAG_ACK, 0))
        wfile.flush()

    def _send_data(sid: int, st: _Stream, chunk: bytes, end: bool) -> None:
        """DATA respecting the peer's SETTINGS_MAX_FRAME_SIZE and both
        flow-control windows. When a window is exhausted mid-send, block
        on the socket and consume ONLY connection-maintenance frames
        (WINDOW_UPDATE / PING / SETTINGS / RST of this stream) until it
        reopens — a client pipelining NEW requests while its receive
        window is closed is out of scope for this parity server and
        fails loudly rather than deadlocking."""
        if not chunk and not end:
            return  # nothing to send; don't spin on a closed window
        view = memoryview(chunk)
        while True:
            n = min(len(view), conn["max_frame"], conn["win"], st.send_win)
            if n > 0 or (end and not view):
                flags = _FLAG_END_STREAM if end and n == len(view) else 0
                wfile.write(_frame(_DATA, flags, sid, bytes(view[:n])))
                wfile.flush()
                conn["win"] -= n
                st.send_win -= n
                view = view[n:]
                if not view:
                    return
                continue
            # window closed: wait for the peer to reopen it
            head = _read_exact(rfile, 9)
            ln = int.from_bytes(head[:3], "big")
            ft, fl = head[3], head[4]
            fsid = int.from_bytes(head[5:9], "big") & 0x7FFFFFFF
            pl = _read_exact(rfile, ln) if ln else b""
            if ft == _WINUP:
                _apply_window_update(fsid, pl)
            elif ft == _PING and not fl & _FLAG_ACK:
                wfile.write(_frame(_PING, _FLAG_ACK, 0, pl))
                wfile.flush()
            elif ft == _SETTINGS:
                if not fl & _FLAG_ACK:
                    _apply_settings(pl)
            elif ft == _RST and fsid == sid:
                raise BrokenPipeError("stream reset while flow-blocked")
            elif ft == _GOAWAY:
                raise BrokenPipeError("goaway while flow-blocked")
            else:
                raise ValueError(
                    "unsupported frame while flow-control blocked"
                )

    def _finish(sid: int, st: _Stream) -> None:
        status, body = handler(st.headers, bytes(st.body))
        fields = [(":status", str(status))]
        streaming = not isinstance(body, (bytes, bytearray))
        if streaming:
            # chunk-iterator response (the SSE push sink): stream each
            # chunk as its own DATA frame, END_STREAM on a final empty one
            fields.append(("content-type", "text/event-stream"))
        else:
            fields.append(("content-length", str(len(body))))
            fields.append(("content-type", "text/plain; charset=utf-8"))
        wfile.write(_frame(_HEADERS, _FLAG_END_HEADERS, sid, encode_response_headers(fields)))
        if streaming:
            for chunk in body:
                _send_data(sid, st, bytes(chunk), end=False)
            _send_data(sid, st, b"", end=True)
        else:
            _send_data(sid, st, bytes(body), end=True)
        del streams[sid]

    def _headers_complete(sid: int, st: _Stream) -> None:
        fields = hpack.decode(bytes(st.header_frags))
        st.header_frags.clear()
        if st.headers_done:
            # trailing HEADERS (RFC 7540 §8.1): the HPACK state above is
            # already applied (mandatory for connection health); the
            # fields are trailers and must NOT overwrite the request's
            # pseudo-headers — :method/:path survive, trailers merge in
            if not st.ended:
                raise ValueError("trailers without END_STREAM")
            for k, v in fields:
                if k.startswith(":"):
                    raise ValueError("pseudo-header in trailers")
                st.headers.setdefault(k, v)
            _finish(sid, st)
            return
        st.headers = dict(fields)
        st.headers_done = True
        if st.ended:
            _finish(sid, st)

    while True:
        try:
            head = _read_exact(rfile, 9)
        except EOFError:
            return
        length = int.from_bytes(head[:3], "big")
        ftype, flags = head[3], head[4]
        sid = int.from_bytes(head[5:9], "big") & 0x7FFFFFFF
        payload = _read_exact(rfile, length) if length else b""

        if expect_cont is not None and (ftype != _CONT or sid != expect_cont):
            raise ValueError("expected CONTINUATION")

        if ftype == _SETTINGS:
            if not flags & _FLAG_ACK:
                _apply_settings(payload)
        elif ftype == _HEADERS:
            st = streams.setdefault(sid, _Stream(conn["init_win"]))
            pos, end = 0, len(payload)
            if flags & _FLAG_PADDED:
                end -= payload[pos]
                pos += 1
            if flags & _FLAG_PRIORITY:
                pos += 5
            st.header_frags += payload[pos:end]
            if flags & _FLAG_END_STREAM:
                st.ended = True
            if flags & _FLAG_END_HEADERS:
                _headers_complete(sid, st)
            else:
                expect_cont = sid
        elif ftype == _CONT:
            st = streams[sid]
            st.header_frags += payload
            if flags & _FLAG_END_HEADERS:
                expect_cont = None
                _headers_complete(sid, st)
        elif ftype == _DATA:
            st = streams.get(sid)
            if st is None:
                raise ValueError(f"DATA on idle stream {sid}")
            pos, end = 0, len(payload)
            if flags & _FLAG_PADDED:
                end -= payload[pos]
                pos += 1
            st.body += payload[pos:end]
            if length:  # replenish flow-control windows
                inc = struct.pack("!I", length)
                wfile.write(_frame(_WINUP, 0, 0, inc))
                if not flags & _FLAG_END_STREAM:
                    wfile.write(_frame(_WINUP, 0, sid, inc))
                wfile.flush()
            if flags & _FLAG_END_STREAM:
                st.ended = True
                if st.headers_done:
                    _finish(sid, st)
        elif ftype == _PING:
            if not flags & _FLAG_ACK:
                wfile.write(_frame(_PING, _FLAG_ACK, 0, payload))
                wfile.flush()
        elif ftype == _GOAWAY:
            return
        elif ftype == _RST:
            streams.pop(sid, None)
        elif ftype == _WINUP:
            _apply_window_update(sid, payload)
        # PRIORITY / PUSH_PROMISE (never from clients) / unknown
        # extension frames: consumed and ignored


def _open_h2c(host: str, port: int, timeout: float):
    """Shared client bring-up for the h2c helpers: TCP connect with
    TCP_NODELAY (frames are tiny and request/response alternates —
    without it Nagle x delayed-ACK stalls each exchange ~40ms, measured
    48ms -> <1ms locally), then the connection preface + an empty client
    SETTINGS frame. Returns (socket, buffered file)."""
    import socket

    s = socket.create_connection((host, port), timeout=timeout)
    s.settimeout(timeout)
    s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
    f = s.makefile("rwb")
    f.write(PREFACE)
    f.write(_frame(_SETTINGS, 0, 0))
    return s, f


def _read_frame(f) -> tuple[int, int, int, bytes]:
    """Read one frame head + payload: (ftype, flags, stream id, payload)."""
    head = _read_exact(f, 9)
    ln = int.from_bytes(head[:3], "big")
    payload = _read_exact(f, ln) if ln else b""
    return head[3], head[4], int.from_bytes(head[5:9], "big") & 0x7FFFFFFF, payload


def _authority_literal(authority: str) -> bytes:
    auth = authority.encode()
    if len(auth) > 126:
        raise ValueError("authority too long for 1-byte HPACK length")
    return bytes([0x41, len(auth)]) + auth


def post_h2c(
    host: str,
    port: int,
    bodies: list[bytes],
    path: str = "/",
    authority: str = "localhost",
    timeout: float = 30.0,
) -> list[str]:
    """Minimal h2c prior-knowledge client: POST every body as its own
    stream on ONE cleartext HTTP/2 connection (streams 1, 3, 5, ...),
    sequentially awaiting each response, and return the ``:status`` of
    each. Exists for the test tier and the driver-gate row — a
    dependency-free counterpart of ``curl --http2-prior-knowledge``
    that can REUSE the connection across transfers (curl 7.88 cannot,
    see tests/test_http_listener.py). Request headers are the
    static-table trio (:method POST, :scheme http, :path /) plus
    ``:authority`` as a literal; bodies must fit one DATA frame
    (< 16384 bytes, the default SETTINGS_MAX_FRAME_SIZE)."""
    if path != "/":
        raise ValueError("static-table client only speaks path '/'")
    if not bodies:
        return []  # nothing to send; GOAWAY below would need stream -1
    req_headers = bytes([0x83, 0x86, 0x84]) + _authority_literal(authority)
    statuses: list[str] = []
    s, f = _open_h2c(host, port, timeout)
    try:
        for i, body in enumerate(bodies):
            if len(body) >= 16384:
                raise ValueError("body exceeds one DATA frame")
            sid = 2 * i + 1
            f.write(_frame(_HEADERS, _FLAG_END_HEADERS, sid, req_headers))
            f.write(_frame(_DATA, _FLAG_END_STREAM, sid, body))
            f.flush()
            got_headers = ended = False
            dec = HpackDecoder()
            while not (got_headers and ended):
                ftype, flags, fsid, payload = _read_frame(f)
                if fsid == sid and ftype == _HEADERS:
                    got_headers = True
                    statuses.append(dict(dec.decode(payload))[":status"])
                if fsid == sid and flags & _FLAG_END_STREAM:
                    ended = True
        f.write(_frame(_GOAWAY, 0, 0, struct.pack("!II", 2 * len(bodies) - 1, 0)))
        f.flush()
    finally:
        s.close()
    return statuses


def get_h2c_stream(
    host: str,
    port: int,
    authority: str = "localhost",
    timeout: float = 30.0,
    stop=None,
) -> tuple[str, list[bytes]]:
    """Minimal h2c prior-knowledge streaming GET (the client-side
    complement of ``post_h2c``, for the push-sink surfaces): opens ONE
    stream, returns ``(status, chunks)`` where chunks are the DATA
    frames as the server flushed them — each SSE event arrives as its
    own frame. Reads until END_STREAM, or early-exits when
    ``stop(chunk)`` returns True (how a client leaves an
    otherwise-idle event stream without waiting out the server's idle
    timeout). Flow control: every DATA frame is replenished with
    connection- and stream-level WINDOW_UPDATEs (the server's own
    strategy), so streams larger than the 64 KiB default window drain
    instead of deadlocking the sender."""
    req_headers = bytes([0x82, 0x86, 0x84]) + _authority_literal(authority)
    s, f = _open_h2c(host, port, timeout)
    try:
        f.write(
            _frame(_HEADERS, _FLAG_END_HEADERS | _FLAG_END_STREAM, 1, req_headers)
        )
        f.flush()
        status = ""
        chunks: list[bytes] = []
        while True:
            ftype, flags, sid, payload = _read_frame(f)
            if sid == 1 and ftype == _HEADERS:
                status = dict(HpackDecoder().decode(payload))[":status"]
            elif sid == 1 and ftype == _DATA and payload:
                # replenish BOTH windows before anything else so the
                # server never stalls at the 65535-byte initial window
                inc = struct.pack("!I", len(payload))
                f.write(_frame(_WINUP, 0, 0, inc))
                if not flags & _FLAG_END_STREAM:
                    f.write(_frame(_WINUP, 0, sid, inc))
                f.flush()
                chunks.append(payload)
                if stop is not None and stop(payload):
                    break
            if sid == 1 and flags & _FLAG_END_STREAM:
                break
        return status, chunks
    finally:
        s.close()
