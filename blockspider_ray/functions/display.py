"""Display / unit-conversion helpers — the reference's formatting layer
(/root/reference/util/util.go:28-51 FloatToString/BigFloatToString,
:103-115 FromWei/FromWeiToGwei).

These are DISPLAY-ONLY (SURVEY.md §2.3 keeps them out of the core crawl
path); implemented for API completeness. Deliberate divergence,
documented: the reference routes values through 53-bit ``big.Float``
defaults, so large quantities silently lose precision — here the
conversions are exact ``Decimal`` arithmetic (a correctness improvement
a user switching repos would want, not a behavior we need to mimic,
since nothing downstream consumes these strings)."""

from __future__ import annotations

from decimal import Decimal


def _trim(d: Decimal) -> str:
    """Shortest plain-decimal form: no exponent, no trailing zeros."""
    s = format(d, "f")
    if "." in s:
        s = s.rstrip("0").rstrip(".")
    return s or "0"


def from_wei(value: str) -> str:
    """wei -> ether string (util.go:103-108), exact decimal."""
    return _trim(Decimal(value) / Decimal(10) ** 18)


def from_wei_to_gwei(value: str) -> str:
    """wei -> gwei string (util.go:110-115), exact decimal."""
    return _trim(Decimal(value) / Decimal(10) ** 9)


def float_to_string(f: float) -> str:
    """Fixed 8-decimal rendering (util.go:28-32 FormatFloat(f,'f',8,64))."""
    return f"{f:.8f}"


def big_float_to_string(value: str, prec: int) -> str:
    """The reference's two-decimal-padding / truncating formatter
    (util.go:34-51): integer -> append '.00'; one fraction digit ->
    pad with '0'; longer -> TRUNCATE (not round) to ``prec`` digits."""
    parts = str(value).split(".")
    if len(parts) == 1:
        return parts[0] + ".00"
    if len(parts) == 2:
        head, frac = parts
        if len(frac) == 1:
            return f"{head}.{frac}0"
        return f"{head}.{frac[:prec]}"
    return str(value)
