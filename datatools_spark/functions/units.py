"""Unit-conversion registry (reference parity: units.py:33-73).

Same semantics as the reference's nested-dict registry with automatic
reciprocal lookup (units.py:58-64): ``convert('ft','m')`` returns a
multiplier; if only the reverse direction is registered, the reciprocal is
used. Applied on the data path as ``col * lit(k)`` — constant-folded by
Catalyst, zero runtime cost.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["convert", "convert_col", "register"]

# registry parity: units.py:33-43
_REGISTRY: dict[str, dict[str, float]] = {
    "mbar": {"mH2O": 0.0102, "ftH2O": 0.03346},
    "ft": {"m": 0.3048},
    "in": {"m": 0.0254, "mm": 25.4},
}


def register(src: str, dst: str, factor: float) -> None:
    _REGISTRY.setdefault(src, {})[dst] = factor


def convert(src: str, dst: str) -> float:
    """Multiplier converting ``src`` units to ``dst`` (units.py:46-64),
    with reciprocal fallback."""
    if src == dst:
        return 1.0
    direct = _REGISTRY.get(src, {}).get(dst)
    if direct is not None:
        return direct
    reverse = _REGISTRY.get(dst, {}).get(src)
    if reverse is not None:
        return 1.0 / reverse
    raise KeyError(f"no conversion registered between {src!r} and {dst!r}")


def convert_col(col: Column | str, src: str, dst: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c * F.lit(convert(src, dst))
