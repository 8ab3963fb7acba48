"""Minimal deterministic robots.txt parsing and matching.

Analog of the reference's per-sink config filters
(/root/reference/kafka/kafka.go:5-9, crawler/blocks.go:202-228): a small,
broadcastable rule set applied as a vectorized predicate. We implement
the *intended* positional semantics (see SURVEY.md §2.8.1: the reference's
per-rune topic iteration is a defect we do not reproduce).

Only ``User-agent: *`` groups with ``Disallow:`` path-prefix rules are
honored — the subset the fixtures exercise (FIXTURES.md §1).
"""

from __future__ import annotations


def parse_robots(text: str) -> list[str]:
    """Parse robots.txt body -> list of disallowed path prefixes for '*'."""
    disallow: list[str] = []
    applies = False
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            applies = val == "*"
        elif key == "disallow" and applies and val:
            disallow.append(val)
    return disallow


def is_allowed(path: str, disallow_prefixes: list[str]) -> bool:
    return not any(path.startswith(p) for p in disallow_prefixes)
