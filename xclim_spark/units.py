"""Driver-side unit algebra (reference ``src/xclim/core/units.py``).

The reference leans on pint; pint is not available here, so this is a
small, self-contained CF-flavoured unit system covering the units climate
indicators actually use (temperature with offsets, precipitation
rate/amount incl. the "hydro" kg m-2 s-1 <-> mm/day equivalence, wind,
pressure, energy flux, time, percent).

Everything here runs in the **driver** at plan-build time — executors only
ever see pre-computed scalar factors baked into Column expressions
(multiply/add), exactly the design split the SURVEY prescribes: pint never
crosses the serialization boundary.

Covers: ``str2pint``/``units2pint`` (parse), ``convert_units_to``
(reference units.py:334-452), ``to_agg_units`` (:621-743),
``rate2amount``/``amount2rate`` (:744-994), ``declare_units`` contract
checking (:1424), with CF "hydro" auto-transforms (:1502).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from fractions import Fraction

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "Quantity",
    "parse_units",
    "str2pint",
    "convert_units_to",
    "units_convert_factor",
    "to_agg_units",
    "rate2amount",
    "amount2rate",
    "pint2cfunits",
    "pint2cfattrs",
    "ensure_cf_units",
    "cf_conversion",
    "CF_CONVERSIONS",
    "declare_relative_units",
    "amount2lwethickness",
    "lwethickness2amount",
    "rate2flux",
    "flux2rate",
    "pint_multiply",
    "infer_sampling_units",
    "ensure_absolute_temperature",
    "ensure_delta",
    "infer_context",
    "declare_units",
    "check_units",
    "DimensionalityError",
]

WATER_DENSITY = 1000.0  # kg/m3, CF standard for lwe transforms


class DimensionalityError(ValueError):
    pass


# Base dimensions: length, mass, time, temperature (offset handled apart)
_DIMS = ("L", "M", "T", "K")


@dataclass(frozen=True)
class UnitDef:
    factor: float           # multiplier to SI base
    dims: tuple             # exponents over _DIMS
    offset: float = 0.0     # additive offset to SI (temperature)


def _d(L=0, M=0, T=0, K=0):
    return (Fraction(L), Fraction(M), Fraction(T), Fraction(K))


_UNITS: dict[str, UnitDef] = {
    # length
    "m": UnitDef(1.0, _d(L=1)), "cm": UnitDef(0.01, _d(L=1)),
    "mm": UnitDef(0.001, _d(L=1)), "km": UnitDef(1000.0, _d(L=1)),
    "in": UnitDef(0.0254, _d(L=1)),
    # mass
    "kg": UnitDef(1.0, _d(M=1)), "g": UnitDef(0.001, _d(M=1)),
    # time
    "s": UnitDef(1.0, _d(T=1)), "min": UnitDef(60.0, _d(T=1)),
    "h": UnitDef(3600.0, _d(T=1)), "hr": UnitDef(3600.0, _d(T=1)),
    "d": UnitDef(86400.0, _d(T=1)), "day": UnitDef(86400.0, _d(T=1)),
    "week": UnitDef(604800.0, _d(T=1)),
    "a": UnitDef(31557600.0, _d(T=1)), "yr": UnitDef(31557600.0, _d(T=1)),
    # temperature
    "K": UnitDef(1.0, _d(K=1)),
    "degC": UnitDef(1.0, _d(K=1), offset=273.15),
    "degF": UnitDef(5.0 / 9.0, _d(K=1), offset=255.3722222222222),
    # pressure
    "Pa": UnitDef(1.0, _d(M=1, L=-1, T=-2)),
    "hPa": UnitDef(100.0, _d(M=1, L=-1, T=-2)),
    "kPa": UnitDef(1000.0, _d(M=1, L=-1, T=-2)),
    "mbar": UnitDef(100.0, _d(M=1, L=-1, T=-2)),
    # power flux
    "W": UnitDef(1.0, _d(M=1, L=2, T=-3)),
    # dimensionless
    "1": UnitDef(1.0, _d()), "%": UnitDef(0.01, _d()),
    "percent": UnitDef(0.01, _d()), "pct": UnitDef(0.01, _d()),
}

_ALIASES = {
    "°C": "degC", "°F": "degF", "celsius": "degC", "fahrenheit": "degF",
    "kelvin": "K", "degK": "K", "deg_C": "degC", "deg_F": "degF",
    "degree_celsius": "degC", "degree_fahrenheit": "degF",
    "meter": "m", "metre": "m", "millimeter": "mm", "millimetre": "mm",
    "second": "s", "seconds": "s", "hour": "h", "days": "day",
    "dimensionless": "1", "": "1", "count": "1",
}

_TOKEN = re.compile(r"([A-Za-z°%_]+)(?:\s*\^?\s*(-?\d+))?")


@dataclass(frozen=True)
class Quantity:
    """A parsed quantity: magnitude + resolved unit (factor/dims/offset)."""

    magnitude: float
    factor: float
    dims: tuple
    offset: float
    units: str  # original string, for metadata

    @property
    def si(self) -> float:
        return self.magnitude * self.factor + self.offset

    def to(self, target_units: str) -> "Quantity":
        tgt = parse_units(target_units)
        if tgt.dims != self.dims:
            conv = _auto_transform(self.dims, tgt.dims)
            if conv is None:
                raise DimensionalityError(
                    f"Cannot convert {self.units!r} to {target_units!r}"
                )
            si = self.si * conv
        else:
            si = self.si
        mag = (si - tgt.offset) / tgt.factor
        return Quantity(mag, tgt.factor, tgt.dims, tgt.offset, target_units)


def _resolve(tok: str) -> UnitDef:
    tok = _ALIASES.get(tok, tok)
    if tok not in _UNITS:
        tok2 = _ALIASES.get(tok.lower(), tok.lower())
        if tok2 in _UNITS:
            return _UNITS[tok2]
        raise ValueError(f"Unknown unit {tok!r}")
    return _UNITS[tok]


def parse_units(units: str) -> UnitDef:
    """Parse a CF unit string like ``kg m-2 s-1``, ``mm/d``, ``W/m^2``."""
    units = units.strip()
    if units in ("", "1"):
        return UnitDef(1.0, _d())
    # split on '/' once: numerator / denominator
    if "/" in units:
        num_s, den_s = units.split("/", 1)
    else:
        num_s, den_s = units, ""
    factor = 1.0
    dims = list(_d())
    offset = 0.0
    n_toks = 0
    for part, sign in ((num_s, 1), (den_s, -1)):
        for m in _TOKEN.finditer(part):
            tok, exp_s = m.group(1), m.group(2)
            exp = int(exp_s) if exp_s else 1
            u = _resolve(tok)
            e = sign * exp
            factor *= u.factor ** e
            dims = [d0 + de * e for d0, de in zip(dims, u.dims)]
            if u.offset:
                offset = u.offset if e == 1 else 0.0
            n_toks += 1
    if n_toks == 0:
        raise ValueError(f"Cannot parse units {units!r}")
    if n_toks > 1:
        offset = 0.0  # offsets only meaningful for bare temperature units
    return UnitDef(factor, tuple(dims), offset)


_QTY_RE = re.compile(r"^\s*(-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)\s*(.*)$")


def str2pint(q: str | float | int, default_units: str = "1") -> Quantity:
    """Parse ``"25 degC"``-style quantified strings
    (reference units.py:309-333)."""
    if isinstance(q, (int, float)):
        u = parse_units(default_units)
        return Quantity(float(q), u.factor, u.dims, u.offset, default_units)
    m = _QTY_RE.match(q)
    if not m:
        raise ValueError(f"Cannot parse quantity {q!r}")
    mag, units = float(m.group(1)), (m.group(2).strip() or default_units)
    u = parse_units(units)
    return Quantity(mag, u.factor, u.dims, u.offset, units)


# CF auto-transforms (the "hydro" context, reference units.py:1502):
# precipitation rate [kg m-2 s-1] <-> lwe thickness rate [m s-1] via water
# density; amount [kg m-2] <-> thickness [m].
def _auto_transform(from_dims: tuple, to_dims: tuple) -> float | None:
    mass_flux = _d(M=1, L=-2, T=-1)
    lwe_rate = _d(L=1, T=-1)
    mass_amt = _d(M=1, L=-2)
    lwe_amt = _d(L=1)
    if from_dims == mass_flux and to_dims == lwe_rate:
        return 1.0 / WATER_DENSITY
    if from_dims == lwe_rate and to_dims == mass_flux:
        return WATER_DENSITY
    if from_dims == mass_amt and to_dims == lwe_amt:
        return 1.0 / WATER_DENSITY
    if from_dims == lwe_amt and to_dims == mass_amt:
        return WATER_DENSITY
    # amount <-> rate at daily grain (reference rate2amount/amount2rate,
    # units.py:744-994 with a 1-day timestep — the engine's canonical
    # source frequency): "1 mm" == "1 mm/d" over one day.
    day = 86400.0
    if from_dims == lwe_amt and to_dims == lwe_rate:
        return 1.0 / day
    if from_dims == lwe_rate and to_dims == lwe_amt:
        return day
    if from_dims == mass_amt and to_dims == mass_flux:
        return 1.0 / day
    if from_dims == mass_flux and to_dims == mass_amt:
        return day
    if from_dims == lwe_amt and to_dims == mass_flux:
        return WATER_DENSITY / day
    if from_dims == mass_flux and to_dims == lwe_amt:
        return day / WATER_DENSITY
    if from_dims == mass_amt and to_dims == lwe_rate:
        return 1.0 / (WATER_DENSITY * day)
    if from_dims == lwe_rate and to_dims == mass_amt:
        return WATER_DENSITY * day
    return None


def units_convert_factor(from_units: str, to_units: str) -> tuple[float, float]:
    """(scale, shift) such that ``x_to = x_from * scale + shift``.

    This is what executors see: ``convert_units_to`` compiles to
    ``col * lit(scale) + lit(shift)``.
    """
    src = parse_units(from_units)
    tgt = parse_units(to_units)
    if src.dims != tgt.dims:
        conv = _auto_transform(src.dims, tgt.dims)
        if conv is None:
            raise DimensionalityError(
                f"Cannot convert {from_units!r} to {to_units!r}"
            )
        scale = src.factor * conv / tgt.factor
        shift = -tgt.offset / tgt.factor
        return scale, shift
    scale = src.factor / tgt.factor
    shift = (src.offset - tgt.offset) / tgt.factor
    return scale, shift


def convert_units_to(source, target_units: str, *, source_units: str | None = None):
    """Reference ``convert_units_to`` (units.py:334-452).

    * source str/float/Quantity -> returns a float in ``target_units``
      (thresholds at plan time);
    * source Column (requires ``source_units``) -> returns a Column
      expression performing the scalar affine conversion.
    """
    if isinstance(source, Column):
        if source_units is None:
            raise ValueError("source_units required for Column conversion")
        scale, shift = units_convert_factor(source_units, target_units)
        out = source
        if scale != 1.0:
            out = out * F.lit(scale)
        if shift != 0.0:
            out = out + F.lit(shift)
        return out
    q = source if isinstance(source, Quantity) else str2pint(source)
    return q.to(target_units).magnitude


_FREQ_SECONDS = {"D": 86400.0, "H": 3600.0, "W": 604800.0, "T": 60.0}


def to_agg_units(out_units_of_input: str, op: str, *, src_freq: str = "D") -> str:
    """Output units implied by a reducer (reference units.py:621-743)."""
    if op in ("count", "doymax", "doymin"):
        return {"D": "days", "H": "h", "W": "weeks"}.get(src_freq, "1")
    if op in ("mean", "min", "max", "median", "sum", "std"):
        return out_units_of_input
    if op == "var":
        return f"({out_units_of_input})^2"
    if op == "integral":
        return f"{out_units_of_input} {{time}}"
    raise ValueError(op)


def rate2amount(col: Column, rate_units: str, *, src_freq: str = "D",
                out_units: str | None = None) -> Column:
    """Rate -> amount over each timestep (reference units.py:744-994).

    For regular sub-monthly steps the timestep length is a constant scalar;
    the month-length variant multiplies by
    ``dayofmonth(last_day(time))`` — still a pure expression.
    """
    seconds = _FREQ_SECONDS[src_freq.upper()]
    amt = col * F.lit(seconds)
    if out_units is not None:
        # amount units of rate*s: strip one T-1
        src = parse_units(rate_units)
        amt_dims = tuple(d + e for d, e in zip(src.dims, _d(T=1)))
        tgt = parse_units(out_units)
        if tgt.dims != amt_dims:
            conv = _auto_transform(amt_dims, tgt.dims)
            if conv is None:
                raise DimensionalityError(f"{rate_units} * s -> {out_units}")
            amt = amt * F.lit(src.factor * conv / tgt.factor)
        else:
            amt = amt * F.lit(src.factor / tgt.factor)
    return amt


def amount2rate(col: Column, *, src_freq: str = "D") -> Column:
    """Amount per period -> mean rate (reference units.py:995-1064)."""
    return col / F.lit(_FREQ_SECONDS[src_freq.upper()])


def pint2cfunits(value) -> str:
    """CF-symbol form of a unit string or :class:`Quantity` (reference
    ``pint2cfunits``, units.py:205-260): aliases resolved to canonical
    symbols, denominators flipped into CF negative-exponent suffixes
    (``'mm/d'`` -> ``'mm d-1'``)."""
    units_str = value.units if isinstance(value, Quantity) else str(value)
    units_str = units_str.strip()
    if units_str in ("", "1", "dimensionless"):
        return "1"
    parse_units(units_str)  # validate
    if "/" in units_str:
        num_s, den_s = units_str.split("/", 1)
    else:
        num_s, den_s = units_str, ""
    parts = []
    for part, sign in ((num_s, 1), (den_s, -1)):
        for m in _TOKEN.finditer(part):
            tok, exp_s = m.group(1), m.group(2)
            canon = _ALIASES.get(tok, _ALIASES.get(tok.lower(), tok))
            e = sign * (int(exp_s) if exp_s else 1)
            parts.append(canon if e == 1 else f"{canon}{e}")
    return " ".join(parts)


def pint2cfattrs(value, is_difference: bool | None = None) -> dict:
    """Attrs dict for a quantity (reference ``pint2cfattrs``,
    units.py:261-300): ``{"units": <CF string>}``, with delta form for
    temperature differences."""
    u = pint2cfunits(value)
    if is_difference:
        u = ensure_delta(u)
    return {"units": u}


def ensure_cf_units(units_str: str) -> str:
    """Normalize any accepted unit spelling to the CF-symbol form
    (reference ``ensure_cf_units``, units.py:301-320)."""
    return pint2cfunits(units_str)


# Standard-name pairs for automatic conversions (reference
# data/variables.yml `conversions:`; the common precipitation family —
# extend per deployment vocabulary).
CF_CONVERSIONS: dict[str, list[tuple[str, str]]] = {
    "amount2rate": [
        ("precipitation_amount", "precipitation_flux"),
        ("rainfall_amount", "rainfall_flux"),
        ("snowfall_amount", "snowfall_flux"),
        ("lwe_thickness_of_precipitation_amount", "lwe_precipitation_rate"),
        ("lwe_thickness_of_snowfall_amount", "lwe_snowfall_rate"),
        ("runoff_amount", "runoff_flux"),
    ],
    "amount2lwethickness": [
        ("precipitation_amount", "lwe_thickness_of_precipitation_amount"),
        ("precipitation_flux", "lwe_precipitation_rate"),
        ("snowfall_amount", "lwe_thickness_of_snowfall_amount"),
        ("snowfall_flux", "lwe_snowfall_rate"),
    ],
}


def cf_conversion(standard_name: str, conversion: str,
                  direction: str) -> str | None:
    """Standard name after applying ``conversion`` in ``direction``
    (reference ``cf_conversion``, units.py:454-500): e.g.
    ``('precipitation_amount', 'amount2rate', 'to') ->
    'precipitation_flux'``; None when no pair is registered."""
    if direction not in ("to", "from"):
        raise ValueError("direction must be 'to' or 'from'")
    for a, b in CF_CONVERSIONS.get(conversion, []):
        if direction == "to" and standard_name == a:
            return b
        if direction == "from" and standard_name == b:
            return a
    return None


def declare_relative_units(**units_by_name: str):
    """Decorator checking that argument units are mutually compatible
    (reference ``declare_relative_units``, units.py:1313-1423):
    contracts reference OTHER parameters, e.g. ``thresh="<da>"`` or
    ``rate="<da> / [time]"``.  Dimensionality is checked at call time
    against the referenced argument's units; the contract is stored as
    ``relative_units`` for the indicator builder."""
    import re as _re

    def deco(fn):
        def wrapper(*args, **kwargs):
            resolved: dict[str, str] = {}
            for name, val in kwargs.items():
                if isinstance(val, tuple) and len(val) == 2 and \
                        isinstance(val[1], str):
                    resolved[name] = val[1]
                elif isinstance(val, str) and any(c.isdigit()
                                                  for c in val):
                    resolved[name] = str2pint(val).units
            for name, contract in units_by_name.items():
                if name not in resolved:
                    continue
                m = _re.match(r"^<(\w+)>$", contract.strip())
                if m and m.group(1) in resolved:
                    check_units(resolved[name], resolved[m.group(1)])
            return fn(*args, **kwargs)

        wrapper.relative_units = dict(units_by_name)
        wrapper.__name__ = fn.__name__
        wrapper.__doc__ = fn.__doc__
        return wrapper

    return deco


def amount2lwethickness(col: Column, *, out_units: str | None = None) -> Column:
    """Liquid-water amount [kg m-2] -> liquid-water-equivalent thickness
    (reference units.py:995-1050): divide by the CF water density
    1000 kg/m3.  1 kg/m2 == 1 mm lwe, so in mm this is numerically the
    identity; ``out_units`` other than mm rescale."""
    thick_mm = col / F.lit(WATER_DENSITY / 1000.0)  # kg/m2 -> mm
    if out_units is not None and out_units != "mm":
        f, off = units_convert_factor("mm", out_units)
        return thick_mm * F.lit(f) + F.lit(off)
    return thick_mm


def lwethickness2amount(col: Column, *, in_units: str = "mm") -> Column:
    """Inverse of :func:`amount2lwethickness` (reference
    units.py:1051-1108): thickness -> amount [kg m-2]."""
    if in_units != "mm":
        f, off = units_convert_factor(in_units, "mm")
        col = col * F.lit(f) + F.lit(off)
    return col * F.lit(WATER_DENSITY / 1000.0)


def _density_kg_m3(density: str | float) -> float:
    """Parse a density given as a quantified string or plain float and
    normalize it to kg/m3 — a density in g/cm3 (or any other mass/volume
    unit) converts before the magnitude is taken; plain floats are
    assumed kg/m3."""
    if isinstance(density, str):
        q = str2pint(density)
        scale, _ = units_convert_factor(q.units, "kg m-3")
        return q.magnitude * scale
    return float(density)


def rate2flux(col: Column, density: str | float) -> Column:
    """Rate x density -> flux (reference units.py:1109-1166), e.g. snow
    thickness rate [m s-1] x 312 kg/m3 -> mass flux [kg m-2 s-1].
    ``density`` is a quantified string (normalized to kg/m3) or a plain
    kg/m3 factor, applied as one literal multiply."""
    return col * F.lit(_density_kg_m3(density))


def flux2rate(col: Column, density: str | float) -> Column:
    """Inverse of :func:`rate2flux` (reference units.py:1167-1224)."""
    return col / F.lit(_density_kg_m3(density))


def pint_multiply(col: Column, q: str | float,
                  *, out_units: str | None = None) -> Column:
    """Multiply a Column by a quantified scalar (reference
    units.py:280-318): the quantity is parsed at plan-build time and the
    product optionally converted to ``out_units`` — one literal multiply
    in the plan, nothing executor-side."""
    quant = str2pint(q) if isinstance(q, str) else None
    mag = quant.magnitude if quant is not None else float(q)
    out = col * F.lit(mag)
    if out_units is not None and quant is not None:
        f, off = units_convert_factor(quant.units, out_units)
        out = out * F.lit(f) + F.lit(off)
    return out


# keyed by parse_offset().base letters
_FREQ_SAMPLING_UNITS = {
    "D": (1, "d"), "H": (1, "h"), "W": (1, "week"), "M": (1, "month"),
    "Q": (3, "month"), "Y": (1, "a"), "T": (1, "min"),
}


def infer_sampling_units(freq: str) -> tuple[int, str]:
    """(multiplier, unit string) of one sampling period (reference
    ``infer_sampling_units``, units.py:503-561 — there inferred from the
    time coordinate; the engine carries explicit freq strings, so the
    offset is parsed instead)."""
    from .calendar import parse_offset

    off = parse_offset(freq)
    base = _FREQ_SAMPLING_UNITS.get(off.base)
    if base is None:
        base = _FREQ_SAMPLING_UNITS.get(freq)
    if base is None:
        raise ValueError(f"Cannot infer sampling units of freq {freq!r}")
    m, u = base
    return m * off.mult, u


def ensure_absolute_temperature(units_str: str) -> str:
    """Delta temperature units -> absolute counterpart (reference
    units.py:562-589): degC -> K, degF -> degR; all else unchanged."""
    return {"degC": "K", "delta_degC": "K",
            "degF": "degR", "delta_degF": "degR"}.get(units_str, units_str)


def ensure_delta(units_str: str) -> str:
    """Temperature units -> delta form (reference units.py:590-620):
    degC -> delta_degC, degF -> delta_degF, K unchanged; other
    dimensionalities pass through."""
    return {"degC": "delta_degC", "degF": "delta_degF"}.get(
        units_str, units_str)


def infer_context(standard_name: str | None = None,
                  dimension: str | None = None) -> str:
    """'hydro' when the variable smells like water (reference
    units.py:1502-1540: standard_name containing precipitation / rainfall
    / lwe, or a [precipitation]-ish dimension), else 'none'."""
    hydro_names = ("rainfall", "lwe", "precipitation")
    if standard_name and any(s in standard_name for s in hydro_names):
        return "hydro"
    if dimension and "[precipitation]" in dimension:
        return "hydro"
    return "none"


def check_units(value_units: str, dim_units: str) -> None:
    """Dimensionality contract check (reference units.py:1215-1260)."""
    a = parse_units(value_units)
    b = parse_units(dim_units)
    if a.dims != b.dims and _auto_transform(a.dims, b.dims) is None:
        raise DimensionalityError(
            f"Units {value_units!r} are not compatible with {dim_units!r}"
        )


def declare_units(**contracts: str):
    """Decorator recording + checking input unit dimensionality
    (reference units.py:1424-1502).  Functions receive kwargs of
    ``(column, units)`` tuples or quantified strings; the decorator checks
    dimensionality of declared args at call time."""

    def deco(fn):
        def wrapper(*args, **kwargs):
            for name, dim_units in contracts.items():
                if name in kwargs:
                    v = kwargs[name]
                    units = None
                    if isinstance(v, tuple) and len(v) == 2:
                        units = v[1]
                    elif isinstance(v, str):
                        units = str2pint(v).units
                    if units is not None:
                        check_units(units, dim_units)
            return fn(*args, **kwargs)

        wrapper.__name__ = fn.__name__
        wrapper.__doc__ = fn.__doc__
        wrapper._declared_units = contracts
        return wrapper

    return deco
