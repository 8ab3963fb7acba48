"""Authenticated push-ingest bridge — the webhook daemon analog (M8 + S12).

The reference's ``transmuted`` daemon accepts webhook POSTs, verifies an
HMAC-SHA256 hex signature over the raw body, parses the JSON event, and
produces the converted block to Kafka
(/root/reference/cmd/transmuted/main.go:66-72 isValidSignatureForStringBody,
:141-174 the gin route). Here the event payload carries seed URLs and the
engine's ``append_seeds`` stands in for the Kafka producer; the response
dicts mirror the gin JSON responses (status / error).

No HTTP server is run in this sandbox: ``WebhookIngest.handle`` is the
route handler itself — a real deployment mounts it behind any WSGI/ASGI
route, which is exactly the slice of transmuted that is engine-relevant
(the gin/router plumbing is framework, not semantics).
"""

from __future__ import annotations

import hashlib
import hmac
import json


def verify_signature(body: bytes, signature: str, signing_key: bytes) -> bool:
    """Constant-time HMAC-SHA256 hex-digest check of a raw webhook body
    (cmd/transmuted/main.go:66-72; the reference compares with ``==`` —
    we use ``compare_digest``, a deliberate hardening divergence)."""
    digest = hmac.new(signing_key, body, hashlib.sha256).hexdigest()
    return hmac.compare_digest(digest, signature)


def sign_body(body: bytes, signing_key: bytes) -> str:
    """Produce the hex signature a sender would attach (test/client side)."""
    return hmac.new(signing_key, body, hashlib.sha256).hexdigest()


def parse_seed_event(body: bytes) -> list[str]:
    """Parse the push payload: ``{"seeds": ["http://...", ...]}`` ->
    seed URL list (the AlchemyEvent -> common block Convert analog,
    main.go:159-163). Raises ValueError on malformed payloads."""
    try:
        event = json.loads(body)
    except json.JSONDecodeError as e:
        raise ValueError(f"invalid JSON: {e}") from e
    seeds = event.get("seeds") if isinstance(event, dict) else None
    if not isinstance(seeds, list) or not all(isinstance(s, str) for s in seeds):
        raise ValueError("payload must be an object with a 'seeds' list of strings")
    return seeds


class WebhookIngest:
    """The authenticated route handler: verify -> parse -> append.

    ``sink`` is anything with ``append_seeds(list[str])`` — the engine,
    or a recording fake in tests. Invalid signatures and malformed
    payloads change NO state (the row-auth filter the reference applies
    before producing, main.go:149-157)."""

    def __init__(self, sink, signing_key: bytes):
        self.sink = sink
        self.key = signing_key
        self.accepted = 0
        self.rejected = 0

    def handle(self, body: bytes, signature: str) -> dict:
        if not verify_signature(body, signature, self.key):
            self.rejected += 1
            return {"status": 400, "error": "invalid signature"}
        try:
            seeds = parse_seed_event(body)
        except ValueError as e:
            self.rejected += 1
            return {"status": 400, "error": str(e)}
        self.sink.append_seeds(seeds)
        self.accepted += 1
        return {"status": 200, "ok": True, "n_seeds": len(seeds)}
