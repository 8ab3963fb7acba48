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
socket via ``unix_path=``; the ``rpc()`` client dispatches on the
``http://`` / ``ipc://`` scheme. No third-party HTTP stack exists in
(or is needed by) this repo.
"""

from __future__ import annotations

import base64
import json
import os
import socket
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyarrow.parquet as pq

JSONRPC = "2.0"
CLIENT_VERSION = "blockspider-ray-simd/0.1"


class _UnixHTTPServer(ThreadingHTTPServer):
    """ThreadingHTTPServer over AF_UNIX — the ipc:// dialer transport
    (the reference dialer speaks http/ipc/ws by URL scheme,
    /root/reference/common/rpc.go:25-55; ws adds nothing over http for
    a request/response RPC and is intentionally out of scope)."""

    address_family = socket.AF_UNIX

    def server_bind(self):
        if os.path.exists(self.server_address):
            os.unlink(self.server_address)
        super().server_bind()

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


def rpc(base_url: str, method: str, params: list | None = None, timeout: float = 10.0) -> dict:
    """Minimal stdlib JSON-RPC client, scheme-dispatched like the
    reference dialer (/root/reference/common/rpc.go:25-55): ``http://``
    over TCP, ``ipc://<socket path>`` over a unix-domain socket (the
    test/ops counterpart of the reference crawler's rpc client)."""
    body = json.dumps({"id": 1, "jsonrpc": JSONRPC, "method": method, "params": params or []}).encode()
    if base_url.startswith("ipc://"):
        return _rpc_ipc(base_url[len("ipc://"):], body, timeout)
    import urllib.request

    req = urllib.request.Request(base_url, data=body, headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())
