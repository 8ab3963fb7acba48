"""Hex / quantity codecs with the reference's exact scalar semantics.

Direct analogs of /root/reference/util/util.go:53-97 and
util/hexutil.go:44-170 — kept because the reference's *observable* value
semantics (notably: malformed input decodes to 0 rather than erroring)
shape outputs, and SURVEY.md §2.3 lists them as part of the operator
inventory. Vectorized variants operate on numpy object arrays for
``map_batches`` use.

Pinned quirks (SURVEY.md §2.8.6):
  - ``decode_hex``: 0x-prefixed hex -> uint64; returns 0 (not an error)
    on malformed or oversized input (util/util.go:66-73).
  - ``decode_value_hex``: 0x-hex -> decimal big-int STRING; "0" for 0x0
    and short inputs (util/util.go:76-97).
  - quantity codec is strict: no leading zeros, minimal digits
    (util/hexutil.go:1-14, 76-103).
  - big-int codec caps at 256 bits (util/hexutil.go:128-130).
"""

from __future__ import annotations

import numpy as np

_HEX = set("0123456789abcdefABCDEF")


def decode_hex(s: str) -> int:
    """0x-hex string -> uint64; 0 on any malformed/oversized input."""
    if not isinstance(s, str) or not s.startswith("0x"):
        return 0
    body = s[2:]
    if not body or any(c not in _HEX for c in body):
        return 0
    v = int(body, 16)
    if v >= 1 << 64:
        return 0
    return v


def decode_value_hex(s: str) -> str:
    """0x-hex string -> decimal big-int string; "0" on short/malformed."""
    if not isinstance(s, str) or len(s) <= 2 or not s.startswith("0x"):
        return "0"
    body = s[2:]
    if any(c not in _HEX for c in body):
        return "0"
    return str(int(body, 16))


def encode_uint64(v: int) -> str:
    """Minimal-digit 0x quantity encoding (hexutil.EncodeUint64)."""
    return hex(int(v))


def decode_uint64(s: str) -> int:
    """Strict quantity decoding: 0x-prefixed, non-empty, no leading zeros
    (except "0x0"), <= 64 bits. Raises ValueError otherwise
    (hexutil.DecodeUint64 error semantics)."""
    if not isinstance(s, str) or not s.startswith("0x"):
        raise ValueError("hex string without 0x prefix")
    body = s[2:]
    if not body:
        raise ValueError("empty hex string")
    if len(body) > 1 and body[0] == "0":
        raise ValueError("leading zero digits")
    if any(c not in _HEX for c in body):
        raise ValueError("invalid hex digit")
    if len(body) > 16:
        raise ValueError("uint64 overflow")
    return int(body, 16)


def encode_bytes(b: bytes) -> str:
    """bytes -> even-length 0x hex blob (hexutil.Encode)."""
    return "0x" + b.hex()


def decode_bytes(s: str) -> bytes:
    """Even-length 0x hex blob -> bytes; ValueError on odd length or bad
    digits (hexutil.Decode)."""
    if not isinstance(s, str) or not s.startswith("0x"):
        raise ValueError("hex string without 0x prefix")
    body = s[2:]
    if len(body) % 2:
        raise ValueError("odd length hex string")
    try:
        return bytes.fromhex(body)
    except ValueError:
        raise ValueError("invalid hex digit")


def decode_big(s: str) -> int:
    """Quantity -> big int, capped at 256 bits (hexutil.DecodeBig)."""
    if not isinstance(s, str) or not s.startswith("0x"):
        raise ValueError("hex string without 0x prefix")
    body = s[2:]
    if not body:
        raise ValueError("empty hex string")
    if len(body) > 1 and body[0] == "0":
        raise ValueError("leading zero digits")
    if len(body) > 64:
        raise ValueError("hex number > 256 bits")
    if any(c not in _HEX for c in body):
        raise ValueError("invalid hex digit")
    return int(body, 16)


def encode_big(v: int) -> str:
    return hex(int(v))


def input_params_to_address(word: str) -> str:
    """32-byte ABI word -> 0x + lowercase 20-byte address
    (util/util.go:99-101: slice the last 40 hex chars)."""
    return "0x" + word[-40:].lower()


# --- vectorized forms for map_batches ---------------------------------------
def decode_hex_many(values) -> np.ndarray:
    return np.fromiter((decode_hex(v) for v in values), dtype=np.uint64, count=len(values))


def decode_value_hex_many(values) -> list[str]:
    return [decode_value_hex(v) for v in values]
