"""JSON-RPC HTTP façade over the simulator's page store.

The reference's simulator is a daemon serving a JSON-RPC POST endpoint
(/root/reference/cmd/reorgd/main.go:175-253): ``eth_blockNumber`` head
polls, ``eth_getBlockByNumber`` point lookups (with the
latest/earliest/pending specials), a client-version probe, and a logs
stub — and the crawler's liveness probe hits it at startup
(/root/reference/crawler/crawler.go:18-27). This module closes the
network-path gap the same way, in the crawl domain:

  method               reference analog          result
  ------------------   ----------------------    ------------------------
  sim_clientVersion    web3_clientVersion        version string
  sim_head             eth_blockNumber           {version, n_pshards,
                                                 n_pages} high-water dict
  sim_getPage [url]    eth_getBlockByNumber      page record (html base64)
  sim_getPage latest   ...  "latest" special     highest-url page of
                                                 pshard 0 (deterministic)
  sim_getPage pending  ...  "pending" special    error -39001 (mirrored)
  sim_mutate [urls]    reorgd's reorg roll       {mutated: n} — rewrites
                                                 pages in place via
                                                 gen.apply_mutations and
                                                 bumps the head version

``sim_mutate`` writes through to the SAME on-disk store the engine's
follow mode polls, so an engine running ``run_follow`` against the
served ``pages_dir`` picks the mutation up on its next tick exactly as
it does for direct file rewrites (digest mismatch -> DROPPED ->
re-crawl). The simulator stays deterministic (mutations are explicit
RPC calls, not dice rolls — SURVEY.md documents the divergence: a
seeded test fixture must not self-mutate).

Server is stdlib ``ThreadingHTTPServer`` on localhost TCP or (like the
reference's ipc dialer scheme, common/rpc.go:25-55) on a unix-domain
socket via ``unix_path=``; the TCP listener also answers WebSocket
upgrades (RFC 6455, stdlib-only framing) so the full reference dialer
scheme set — ``http://`` / ``ipc://`` / ``ws://`` — is served and
dispatched by the ``rpc()`` client. No third-party HTTP stack exists in
(or is needed by) this repo.
"""

from __future__ import annotations

import base64
import json
import os
import socket
import socketserver
import struct
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyarrow.parquet as pq

JSONRPC = "2.0"
CLIENT_VERSION = "blockspider-ray-simd/0.1"

# --- WebSocket (RFC 6455) minimal framing -------------------------------
# The reference dialer speaks http, ipc AND ws by URL scheme
# (/root/reference/common/rpc.go:25-55, ws branch :39-44); this is the ws
# leg: stdlib-only handshake + single-frame text messages (no
# fragmentation — every JSON-RPC body fits one frame; client frames are
# masked per spec, server frames are not).
_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"


def _ws_accept_key(key: str) -> str:
    import hashlib

    return base64.b64encode(hashlib.sha1((key + _WS_GUID).encode()).digest()).decode()


def _ws_frame(payload: bytes, *, mask: bool, opcode: int = 1) -> bytes:
    hdr = bytearray([0x80 | opcode])  # FIN + opcode
    n = len(payload)
    mbit = 0x80 if mask else 0
    if n < 126:
        hdr.append(mbit | n)
    elif n < (1 << 16):
        hdr.append(mbit | 126)
        hdr += struct.pack(">H", n)
    else:
        hdr.append(mbit | 127)
        hdr += struct.pack(">Q", n)
    if mask:
        key = os.urandom(4)
        hdr += key
        payload = _ws_xor(payload, key)
    return bytes(hdr) + payload


def _ws_xor(payload: bytes, key: bytes) -> bytes:
    import numpy as np

    n = len(payload)
    if n == 0:
        return payload
    k = np.frombuffer((key * ((n + 3) // 4))[:n], np.uint8)
    return (np.frombuffer(payload, np.uint8) ^ k).tobytes()


def _ws_recv(rfile) -> tuple[int | None, bytes]:
    """Read one frame; returns (opcode, payload), (None, b'') on EOF."""
    hdr = rfile.read(2)
    if len(hdr) < 2:
        return None, b""
    opcode = hdr[0] & 0x0F
    masked = bool(hdr[1] & 0x80)
    n = hdr[1] & 0x7F
    if n == 126:
        n = int.from_bytes(rfile.read(2), "big")
    elif n == 127:
        n = int.from_bytes(rfile.read(8), "big")
    key = rfile.read(4) if masked else b""
    payload = rfile.read(n) if n else b""
    if masked and payload:
        payload = _ws_xor(payload, key)
    return opcode, payload


class _UnixHTTPServer(ThreadingHTTPServer):
    """ThreadingHTTPServer over AF_UNIX — the ipc:// dialer transport
    (the reference dialer speaks http/ipc/ws by URL scheme,
    /root/reference/common/rpc.go:25-55; the ws leg is served by the
    same TCP listener via the GET-Upgrade path below)."""

    address_family = socket.AF_UNIX

    def server_bind(self):
        # HTTPServer.server_bind unpacks ``host, port =
        # self.server_address[:2]`` — for AF_UNIX the address is a str
        # path, so that slice is two CHARACTERS of the path. Bypass it:
        # bind via the socketserver base and set the name fields
        # explicitly (they only feed logging/getfqdn).
        if os.path.exists(self.server_address):
            os.unlink(self.server_address)
        socketserver.TCPServer.server_bind(self)
        self.server_name = "ipc"
        self.server_port = 0

    def get_request(self):
        # AF_UNIX accept() returns '' for the peer address; hand the
        # handler a tuple so BaseHTTPRequestHandler's bookkeeping works
        request, _ = self.socket.accept()
        return request, ("ipc", 0)


class SimulatorHTTPD:
    """Serve one page store over JSON-RPC on localhost.

    ``port=0`` binds an ephemeral port (read it from ``.port`` after
    construction). ``start()``/``close()`` own a daemon thread."""

    def __init__(
        self,
        pages_dir: str,
        host: str = "127.0.0.1",
        port: int = 0,
        unix_path: str | None = None,
    ):
        from .pages import PageStore

        self.pages_dir = pages_dir
        self._store = PageStore(pages_dir)
        self.version = 0
        self._lock = threading.Lock()
        facade = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                try:
                    req = json.loads(self.rfile.read(n) or b"{}")
                except json.JSONDecodeError:
                    req = {}
                resp = facade.handle(req)
                body = json.dumps(resp).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                # ws:// leg: GET + Upgrade on the SAME listener (the
                # reference node serves http and ws RPC on one surface;
                # the dialer picks by scheme, common/rpc.go:25-55)
                if self.headers.get("Upgrade", "").lower() != "websocket":
                    self.send_error(404, "only websocket upgrade is served on GET")
                    return
                key = self.headers.get("Sec-WebSocket-Key", "")
                self.send_response(101, "Switching Protocols")
                self.send_header("Upgrade", "websocket")
                self.send_header("Connection", "Upgrade")
                self.send_header("Sec-WebSocket-Accept", _ws_accept_key(key))
                self.end_headers()
                # frame loop: each text frame carries one JSON-RPC request
                while True:
                    op, payload = _ws_recv(self.rfile)
                    if op is None or op == 8:  # EOF / close
                        try:
                            self.wfile.write(_ws_frame(b"", mask=False, opcode=8))
                        except OSError:
                            pass
                        break
                    if op == 9:  # ping -> pong
                        self.wfile.write(_ws_frame(payload, mask=False, opcode=10))
                        continue
                    try:
                        req = json.loads(payload or b"{}")
                    except json.JSONDecodeError:
                        req = {}
                    resp = facade.handle(req)
                    self.wfile.write(_ws_frame(json.dumps(resp).encode(), mask=False))
                self.close_connection = True

        if unix_path is not None:
            # ipc transport: same RPC surface over a unix-domain socket
            self._httpd = _UnixHTTPServer(unix_path, Handler)
            self.host, self.port = None, None
            self.unix_path = unix_path
        else:
            self._httpd = ThreadingHTTPServer((host, port), Handler)
            self.host, self.port = self._httpd.server_address[:2]
            self.unix_path = None
        self._thread: threading.Thread | None = None

    # --- rpc dispatch ---------------------------------------------------
    def handle(self, req: dict) -> dict:
        rid = req.get("id")
        method = req.get("method")
        params = req.get("params") or []
        out = {"id": rid, "jsonrpc": JSONRPC, "result": None, "error": None}
        if method == "sim_clientVersion":
            out["result"] = CLIENT_VERSION
        elif method == "sim_head":
            with self._lock:
                out["result"] = {
                    "version": self.version,
                    "n_pshards": self._store.n_shards,
                    "n_pages": self._n_pages(),
                }
        elif method == "sim_getPage":
            key = str(params[0]) if params else "latest"
            if key in ("pending", "finalized", "safe"):
                # mirrored reference behavior: these are defined errors
                out["error"] = {"code": -39001, "message": "-39001: Unknown block"}
            else:
                out["result"] = self._get_page(key)
        elif method == "sim_mutate":
            urls = list(params[0]) if params else []
            from .. import gen

            with self._lock:
                changed = gen.apply_mutations(self.pages_dir, urls)
                self.version += 1
            out["result"] = {"mutated": len(changed), "version": self.version}
        # unknown methods: result stays None (reference default branch)
        return out

    def _n_pages(self) -> int:
        return sum(
            pq.ParquetFile(self._store._shard_path(s)).metadata.num_rows
            for s in range(self._store.n_shards)
            if os.path.exists(self._store._shard_path(s))
        )

    def _get_page(self, key: str) -> dict | None:
        import pyarrow.compute as pc

        from ..functions.urls import url_host

        if key in ("latest", "earliest"):
            # deterministic specials: extreme url of pshard 0 (the store
            # has no block height; url order is its total order)
            t = pq.read_table(self._store._shard_path(0))
            if t.num_rows == 0:
                return None
            urls = t.column("url").to_pylist()
            i = urls.index(max(urls)) if key == "latest" else urls.index(min(urls))
            row = t.slice(i, 1)
        else:
            s = int(self._store.shard_of_hosts([url_host(key)])[0])
            t = pq.read_table(self._store._shard_path(s))
            row = t.filter(pc.equal(t.column("url"), key))
            if row.num_rows == 0:
                return None
        d = row.to_pylist()[0]
        if d.get("html") is not None:
            d["html"] = base64.b64encode(d["html"]).decode()
        if d.get("warc_ts") is not None:
            d["warc_ts"] = str(d["warc_ts"])
        return d

    # --- lifecycle ------------------------------------------------------
    def start(self) -> "SimulatorHTTPD":
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    @property
    def url(self) -> str:
        if self.unix_path is not None:
            return f"ipc://{self.unix_path}"
        return f"http://{self.host}:{self.port}/"

    @property
    def ws_url(self) -> str:
        """The same RPC surface over WebSocket (TCP listener only)."""
        if self.unix_path is not None:
            raise ValueError("ws:// is served on the TCP listener, not ipc")
        return f"ws://{self.host}:{self.port}/"

    def close(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None
        if self.unix_path is not None and os.path.exists(self.unix_path):
            os.unlink(self.unix_path)


def _rpc_ipc(sock_path: str, body: bytes, timeout: float) -> dict:
    """One HTTP/1.1 POST over a unix-domain socket (Connection: close —
    the simplest correct framing for a one-shot RPC)."""
    with socket.socket(socket.AF_UNIX, socket.SOCK_STREAM) as s:
        s.settimeout(timeout)
        s.connect(sock_path)
        s.sendall(
            b"POST / HTTP/1.1\r\nHost: localhost\r\n"
            b"Content-Type: application/json\r\n"
            b"Content-Length: %d\r\nConnection: close\r\n\r\n" % len(body)
            + body
        )
        data = b""
        while True:
            chunk = s.recv(65536)
            if not chunk:
                break
            data += chunk
    _, _, payload = data.partition(b"\r\n\r\n")
    return json.loads(payload)


class _WSConn:
    """One persistent client WebSocket: handshake once, then one masked
    text frame per RPC call (request/response in lockstep — the calling
    pattern of the fetch stage's thread pool, one thread per conn)."""

    def __init__(self, url: str, timeout: float):
        from urllib.parse import urlsplit

        parts = urlsplit(url)
        host, _, port = parts.netloc.partition(":")
        self.sock = socket.create_connection((host, int(port or 80)), timeout=timeout)
        key = base64.b64encode(os.urandom(16)).decode()
        self.sock.sendall(
            (
                f"GET {parts.path or '/'} HTTP/1.1\r\nHost: {parts.netloc}\r\n"
                "Upgrade: websocket\r\nConnection: Upgrade\r\n"
                f"Sec-WebSocket-Key: {key}\r\nSec-WebSocket-Version: 13\r\n\r\n"
            ).encode()
        )
        self.rfile = self.sock.makefile("rb")
        status = self.rfile.readline()
        if b"101" not in status:
            raise OSError(f"ws handshake rejected: {status!r}")
        accept = None
        while True:
            line = self.rfile.readline()
            if line in (b"\r\n", b""):
                break
            k, _, v = line.decode().partition(":")
            if k.strip().lower() == "sec-websocket-accept":
                accept = v.strip()
        if accept != _ws_accept_key(key):
            raise OSError("ws handshake: bad Sec-WebSocket-Accept")

    def call(self, body: bytes) -> dict:
        self.sock.sendall(_ws_frame(body, mask=True))
        while True:
            op, payload = _ws_recv(self.rfile)
            if op is None or op == 8:
                raise OSError("ws connection closed by server")
            if op in (1, 2):  # text/binary
                return json.loads(payload)
            if op == 9:  # ping -> pong, keep waiting
                self.sock.sendall(_ws_frame(payload, mask=True, opcode=10))

    def close(self) -> None:
        try:
            self.sock.sendall(_ws_frame(b"", mask=True, opcode=8))
            self.sock.close()
        except OSError:
            pass


_ws_local = threading.local()


def _rpc_ws(base_url: str, body: bytes, timeout: float) -> dict:
    cache = getattr(_ws_local, "conns", None)
    if cache is None:
        cache = _ws_local.conns = {}
    conn = cache.get(base_url)
    if conn is None:
        conn = cache[base_url] = _WSConn(base_url, timeout)
    try:
        return conn.call(body)
    except Exception:
        # stale socket: reconnect once
        conn.close()
        cache.pop(base_url, None)
        conn = cache[base_url] = _WSConn(base_url, timeout)
        return conn.call(body)


_http_local = threading.local()


def _http_conn(netloc: str, timeout: float):
    """Per-thread persistent HTTP/1.1 connection (keep-alive): the fetch
    stage's thread pool issues one sim_getPage per URL, and a fresh TCP
    connect per call both costs a round-trip and churns ephemeral ports.
    One cached ``http.client.HTTPConnection`` per (thread, netloc)."""
    import http.client

    cache = getattr(_http_local, "conns", None)
    if cache is None:
        cache = _http_local.conns = {}
    conn = cache.get(netloc)
    if conn is None:
        host, _, port = netloc.partition(":")
        conn = http.client.HTTPConnection(host, int(port or 80), timeout=timeout)
        cache[netloc] = conn
    return conn


def _rpc_http(base_url: str, body: bytes, timeout: float) -> dict:
    from urllib.parse import urlsplit

    parts = urlsplit(base_url)
    conn = _http_conn(parts.netloc, timeout)
    try:
        conn.request("POST", parts.path or "/", body, {"Content-Type": "application/json"})
        return json.loads(conn.getresponse().read())
    except Exception:
        # stale keep-alive (server restarted / idle-closed): drop the
        # cached connection and retry once on a fresh one
        conn.close()
        _http_local.conns.pop(parts.netloc, None)
        conn = _http_conn(parts.netloc, timeout)
        conn.request("POST", parts.path or "/", body, {"Content-Type": "application/json"})
        return json.loads(conn.getresponse().read())


def rpc(base_url: str, method: str, params: list | None = None, timeout: float = 10.0) -> dict:
    """Minimal stdlib JSON-RPC client, scheme-dispatched like the
    reference dialer (/root/reference/common/rpc.go:25-55): ``http://``
    over TCP (per-thread keep-alive connection), ``ipc://<socket path>``
    over a unix-domain socket, ``ws://`` over a WebSocket (RFC 6455)
    with a per-thread persistent connection (the test/ops counterpart of
    the reference crawler's rpc client)."""
    body = json.dumps({"id": 1, "jsonrpc": JSONRPC, "method": method, "params": params or []}).encode()
    if base_url.startswith("ipc://"):
        return _rpc_ipc(base_url[len("ipc://"):], body, timeout)
    if base_url.startswith("ws://"):
        return _rpc_ws(base_url, body, timeout)
    return _rpc_http(base_url, body, timeout)
