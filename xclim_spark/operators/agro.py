"""Agroclimatic stateful kernels: chill portions (Dynamic Model) and
chill units (Utah model) — reference ``src/xclim/indices/_agro.py``.

``chill_units`` is a pure per-hour Column mapping + period sum (JVM-side).
``chill_portions`` carries a two-state hourly recursion (intermediate
product E, transformed fraction), so it runs per (cell, period) inside
``applyInPandas`` — state resets each period, exactly like the
reference's per-season ``resample_map`` (reference _agro.py:1436-1537).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..calendar import period_start
from ..util import repartition_for_apply

__all__ = ["chill_units", "chill_portions", "chill_portions_1d"]

# Dynamic Model constants (Fishman et al. 1987 / Luedeling et al. 2009;
# reference _agro.py:1445-1450)
_E0, _E1 = 4153.5, 12888.8
_A0, _A1 = 139500.0, 2.567e18
_SLP, _TETMLT = 1.6, 277.0


def chill_units(tas_c, positive_only: bool = False) -> Column:
    """Utah-model chill units per hour (Richardson et al. 1974; reference
    ``chill_units``, _agro.py): piecewise mapping of hourly temperature
    [degC] -> {-1, -0.5, 0, 0.5, 1}, NULL-propagating."""
    t = tas_c if isinstance(tas_c, Column) else F.col(tas_c)
    cu = (
        F.when(t.isNull(), F.lit(None).cast("double"))
        .when((t <= 1.4) | ((t > 12.4) & (t <= 15.9)), 0.0)
        .when(((t > 1.4) & (t <= 2.4)) | ((t > 9.1) & (t <= 12.4)), 0.5)
        .when((t > 2.4) & (t <= 9.1), 1.0)
        .when((t > 15.9) & (t <= 17.9), -0.5)
        .otherwise(-1.0)
    )
    return cu


def chill_portions_1d(tas_k: np.ndarray) -> float:
    """Dynamic-Model chill portions for one season of hourly temperatures
    [K] (reference ``_chill_portion_one_season``, _agro.py:1436-1470)."""
    aa = _A0 / _A1
    ee = _E1 - _E0
    ftmprt = _SLP * _TETMLT * (tas_k - _TETMLT) / tas_k
    sr = np.exp(ftmprt)
    xi = sr / (1.0 + sr)
    xs = aa * np.exp(ee / tas_k)
    ak1 = _A1 * np.exp(-_E1 / tas_k)
    inter_e = np.zeros_like(tas_k)
    for i in range(1, len(tas_k)):
        prev_e, prev_xi = inter_e[i - 1], xi[i - 1]
        curr_s = prev_e if prev_e < 1 else prev_e - prev_e * prev_xi
        inter_e[i] = xs[i] - (xs[i] - curr_s) * np.exp(-ak1[i])
    delta = np.where(inter_e >= 1.0, inter_e * xi, 0.0)
    return float(delta.sum())


def chill_portions(
    df: DataFrame, var: str, freq: str = "YS", *,
    time: str = "time", cells: Sequence[str] = (),
    alias: str = "chill_portions",
) -> DataFrame:
    """Chill portions per period (reference ``chill_portions``,
    _agro.py:1472-1537): the hourly recursion runs per (cell, period)
    pandas task — state resets at period boundaries like the reference's
    per-season map.  ``var`` is hourly temperature in Kelvin."""
    df = df.withColumn("period", period_start(time, freq))
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    schema = ", ".join(
        [f"{c} {fields[c]}" for c in cells]
        + [f"period {fields['period']}", f"{alias} DOUBLE"]
    )

    def _one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(time)
        val = chill_portions_1d(pdf[var].to_numpy(dtype=float))
        out = {c: [pdf[c].iloc[0]] for c in cells}
        out["period"] = [pdf["period"].iloc[0]]
        out[alias] = [val]
        return pd.DataFrame(out)

    return repartition_for_apply(df, [*cells, "period"]) \
        .groupBy(*cells, "period").applyInPandas(_one, schema=schema)
