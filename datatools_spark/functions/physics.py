"""Physical constants and hydrology/glaciology expressions.

Constants parity: constants.py:29-45 (densities, gravity, ice thickness
per station). Formulas parity: hydrotools.py:75-138 (fraction of
overburden family), melt_model.py:576-610 (temperature-index melt
equation, Pellicciotti et al. 2005).

All pure Column expressions — constant-folded, codegen'd, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "RHO_ICE", "RHO_WATER", "GRAVITY",
    "wlb_to_fob", "gwl_to_fob", "masl_to_pct_overburden", "melt_expr",
    "add_in_quadrature",
]

# constants.py parity
RHO_ICE = 917.0      # kg/m3
RHO_WATER = 1000.0   # kg/m3
GRAVITY = 9.8        # m/s2

# melt-model coefficients (melt_model.py:509-510)
TEMP_FACTOR = 0.05          # TF, mm h-1 C-1
SHORTWAVE_FACTOR = 0.0094   # SRF, mm m2 W-1 h-1


def wlb_to_fob(wlb: Column | str, ice_thickness_m: float) -> Column:
    """Water level below surface → fraction of overburden
    (hydrotools.py:119-138)."""
    c = F.col(wlb) if isinstance(wlb, str) else wlb
    return c / ((RHO_ICE / RHO_WATER) * ice_thickness_m)


def gwl_to_fob(gwl: Column | str, ice_thickness_m: float) -> Column:
    """Ground water level (above bed) → fraction of overburden
    (hydrotools.py:98-116)."""
    c = F.col(gwl) if isinstance(gwl, str) else gwl
    return c / ((RHO_ICE / RHO_WATER) * ice_thickness_m)


def masl_to_pct_overburden(masl: Column | str, bed_elevation_m: float,
                           ice_thickness_m: float) -> Column:
    """Elevation (m a.s.l.) → percent of ice overburden pressure
    (hydrotools.py:75-95)."""
    c = F.col(masl) if isinstance(masl, str) else masl
    return 100.0 * (c - bed_elevation_m) / ((RHO_ICE / RHO_WATER) * ice_thickness_m)


def melt_expr(temp: Column | str, solar: Column | str, albedo: Column | str,
              threshold_temp: float = 0.0,
              temp_factor: float = TEMP_FACTOR,
              srf: float = SHORTWAVE_FACTOR) -> Column:
    """Hourly melt (mm w.e.): ``TF·T + SRF·(1−α)·G if T > TT else 0``
    (melt_model.py:576-610; gate :522-523)."""
    t = F.col(temp) if isinstance(temp, str) else temp
    g = F.col(solar) if isinstance(solar, str) else solar
    a = F.col(albedo) if isinstance(albedo, str) else albedo
    m = F.lit(temp_factor) * t + F.lit(srf) * (F.lit(1.0) - a) * g
    return F.when(t > threshold_temp, m).otherwise(F.lit(0.0))


def add_in_quadrature(*cols) -> Column:
    """``sqrt(Σ x²)`` (utils.py:59-63)."""
    acc = None
    for c in cols:
        cc = F.col(c) if isinstance(c, str) else c
        term = cc * cc
        acc = term if acc is None else acc + term
    return F.sqrt(acc)
