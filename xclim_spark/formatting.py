"""Metadata formatting + internationalization for indicator outputs
(reference src/xclim/core/formatting.py:42-394 ``AttrFormatter`` /
``merge_attributes`` / ``update_history`` and src/xclim/core/locales.py
:1-352; behavior re-derived, not copied).

Spark results are plain DataFrames without an attrs sidecar, so the
formatted metadata rides on :class:`~xclim_spark.indicators.core.
IndicatorResult.attrs` — same content, different carrier.
"""

from __future__ import annotations

import datetime as dt
import string
import warnings
from collections.abc import Sequence
from fnmatch import fnmatch

__all__ = [
    "AttrFormatter",
    "default_formatter",
    "get_local_formatter",
    "get_local_attrs",
    "list_locales",
    "register_locale",
    "merge_attributes",
    "update_history",
    "parse_doc",
    "generate_indicator_docstring",
    "prefix_attrs",
    "unprefix_attrs",
    "get_percentile_metadata",
    "gen_call_string",
    "TRANSLATABLE_ATTRS",
]

TRANSLATABLE_ATTRS = ["long_name", "description", "comment", "title",
                      "abstract", "keywords"]


class AttrFormatter(string.Formatter):
    """``str.format`` variant that knows how frequently-used metadata
    values decline across languages.

    ``mapping`` sends a base value (a ``fnmatch`` pattern, e.g. ``YS-*``)
    to its variations; ``modifiers`` name each variation slot (e.g.
    ``["m", "f"]`` for French gender).  ``{freq:f}`` then renders the
    feminine variation of whatever ``freq`` holds; no modifier renders
    the first variation; the reserved ``r`` modifier renders the raw
    value.  Unknown values pass through to normal formatting (with a
    warning if a modifier was requested for them).
    """

    def __init__(self, mapping: dict[str, Sequence[str]],
                 modifiers: Sequence[str]) -> None:
        super().__init__()
        if "r" in modifiers:
            raise ValueError("Modifier 'r' is reserved for raw formatting")
        self.mapping = dict(mapping)
        self.modifiers = list(modifiers)

    def _match(self, value):
        if isinstance(value, str):
            for pat in self.mapping:
                if fnmatch(value, pat):
                    return pat
        return None

    def format_field(self, value, format_spec: str) -> str:
        base = self._match(value)
        if base is None:
            if format_spec in (*self.modifiers, "r"):
                warnings.warn(
                    f"Requested formatting {format_spec!r} for unknown "
                    f"value {value!r}")
                format_spec = ""
            return super().format_field(value, format_spec)
        variations = self.mapping[base]
        if not format_spec:
            return variations[0]
        if format_spec == "r":
            return super().format_field(value, "")
        if format_spec in self.modifiers:
            if len(variations) == 1:
                return variations[0]
            return variations[self.modifiers.index(format_spec)]
        # known value, built-in format spec: apply it to the default form
        return super().format_field(variations[0], format_spec)


default_formatter = AttrFormatter(
    {
        "D": ["daily", "days"],
        "YS": ["annual", "years"],
        "YS-*": ["annual", "years"],
        "MS": ["monthly", "months"],
        "QS-*": ["seasonal", "seasons"],
        "DJF": ["winter"],
        "MAM": ["spring"],
        "JJA": ["summer"],
        "SON": ["fall"],
        "mean": ["average"],
        "max": ["maximal", "maximum"],
        "min": ["minimal", "minimum"],
        "sum": ["total", "sum"],
        "std": ["standard deviation"],
        "count": ["count"],
        "doymin": ["day of minimum"],
        "doymax": ["day of maximum"],
    },
    ["adj", "noun"],
)


# ---------------------------------------------------------------------------
# Locales (reference locales.py): one dict per language with an
# "attrs_mapping" (modifiers + value declensions) and per-indicator
# translated attributes keyed by registry identifier.
# ---------------------------------------------------------------------------

_LOCALES: dict[str, dict] = {}


def register_locale(name: str, data: dict) -> None:
    """Register a locale table: ``{"attrs_mapping": {"modifiers": [...],
    "<value>": [...]}, "<IDENTIFIER>": {"long_name": ..., ...}, ...}``."""
    if "attrs_mapping" not in data or "modifiers" not in \
            data["attrs_mapping"]:
        raise ValueError(
            "locale data needs attrs_mapping with a modifiers list")
    _LOCALES[name] = data


def list_locales() -> list[str]:
    return list(_LOCALES)


def get_local_formatter(locale: str) -> AttrFormatter:
    am = dict(_LOCALES[locale]["attrs_mapping"])
    modifiers = am.pop("modifiers")
    return AttrFormatter(am, modifiers)


def get_local_attrs(identifier: str, locale: str,
                    append_locale_name: bool = True) -> dict[str, str]:
    """Translated attribute templates for one indicator; keys become
    ``<attr>_<locale>`` unless ``append_locale_name=False``."""
    entry = _LOCALES[locale].get(identifier, {})
    suffix = f"_{locale}" if append_locale_name else ""
    return {f"{k}{suffix}": v for k, v in entry.items()
            if k in TRANSLATABLE_ATTRS and v}


# French: the reference ships fr as its one complete builtin locale
# (src/xclim/data/fr.json).  This table covers the frequent-value
# declensions plus the indicators this engine exposes most prominently;
# it extends per register_locale like any user locale.
FR = {
    "attrs_mapping": {
        "modifiers": ["m", "f", "mpl", "fpl"],
        "D": ["quotidien", "quotidienne", "quotidiens", "quotidiennes"],
        "YS": ["annuel", "annuelle", "annuels", "annuelles"],
        "YS-*": ["annuel", "annuelle", "annuels", "annuelles"],
        "MS": ["mensuel", "mensuelle", "mensuels", "mensuelles"],
        "QS-*": ["saisonnier", "saisonnière", "saisonniers",
                 "saisonnières"],
        "DJF": ["hivernal", "hivernale", "hivernaux", "hivernales"],
        "MAM": ["printanier", "printanière", "printaniers",
                "printanières"],
        "JJA": ["estival", "estivale", "estivaux", "estivales"],
        "SON": ["automnal", "automnale", "automnaux", "automnales"],
        "mean": ["moyen", "moyenne", "moyens", "moyennes"],
        "max": ["maximal", "maximale", "maximaux", "maximales"],
        "min": ["minimal", "minimale", "minimaux", "minimales"],
        "sum": ["total", "totale", "totaux", "totales"],
    },
    "tg_mean": {
        "long_name": "Moyenne {freq:f} de la température journalière "
                     "moyenne",
        "title": "Moyenne de la température journalière moyenne",
    },
    "tx_days_above": {
        "long_name": "Nombre de jours avec une température maximale "
                     "{op} {thresh}",
        "title": "Jours de température maximale au-dessus du seuil",
    },
    "frost_days": {
        "long_name": "Nombre de jours de gel (température minimale "
                     "sous {thresh})",
        "title": "Jours de gel",
    },
    "growing_degree_days": {
        "long_name": "Somme {freq:f} des degrés-jours de croissance "
                     "(au-dessus de {thresh})",
        "title": "Degrés-jours de croissance",
    },
    "wetdays": {
        "long_name": "Nombre {freq:m} de jours pluvieux (précipitations "
                     "au moins {thresh})",
        "title": "Jours pluvieux",
    },
}
register_locale("fr", FR)


# ---------------------------------------------------------------------------
# History / provenance (reference formatting.py:342-460)
# ---------------------------------------------------------------------------

def merge_attributes(attribute: str, *inputs, new_line: str = "\n",
                     missing_str: str | None = None,
                     **named_inputs) -> str:
    """Combine one attribute across input attr-dicts (or objects with an
    ``attrs`` dict), prefixing named inputs with their name."""
    pairs = [(None, i) for i in inputs] + list(named_inputs.items())
    parts = []
    for name, obj in pairs:
        attrs = obj if isinstance(obj, dict) else getattr(obj, "attrs", {})
        if attribute in attrs or missing_str is not None:
            val = attrs.get(attribute, missing_str)
            prefix = f"{name}: " if name is not None and len(pairs) > 1 \
                else ""
            parts.append(f"{prefix}{val}")
    return new_line.join(parts)


def parse_doc(doc: str | None) -> dict:
    """Parse a numpydoc-style indice docstring into the metadata an
    indicator constructor needs (reference ``parse_doc``,
    formatting.py:239-286): title + abstract from the intro,
    ``parameters`` as name -> {'description'}, ``notes`` /
    ``references`` verbatim."""
    import re
    import textwrap

    if not doc:
        return {}
    doc = textwrap.dedent(doc)
    out: dict = {}
    sections = re.split(r"(\w+\s?\w+)\n-{3,50}", doc)
    intro = sections.pop(0)
    if intro:
        parts = [p.strip() for p in intro.strip().split("\n\n")]
        if len(parts) == 1:
            out["title"] = parts[0]
        elif len(parts) >= 2:
            out["title"] = parts[0]
            out["abstract"] = " ".join(
                s.strip() for s in parts[1].splitlines())
    for i in range(0, len(sections) - 1, 2):
        header, content = sections[i], sections[i + 1]
        if header in ("Notes", "References"):
            out[header.lower()] = content.replace("\n    ", "\n").strip()
        elif header == "Parameters":
            params: dict = {}
            cur = None
            for line in content.split("\n"):
                if line.startswith(" ") and cur:
                    sep = " " if params[cur]["description"] else ""
                    params[cur]["description"] += sep + line.strip()
                elif line and not line.startswith(" ") and ":" in line:
                    cur = line.split(":", 1)[0].strip()
                    params[cur] = {"description": ""}
            out["parameters"] = params
    return out


def generate_indicator_docstring(ind) -> str:
    """Build a human-readable docstring for a registered indicator
    (reference ``generate_indicator_docstring``, formatting.py:701-742):
    title/realm header, abstract, missing-method note, compute
    reference, and the declared parameters with defaults."""
    lines = [f"{ind.title or ind.identifier} (realm: {ind.realm})", ""]
    if ind.description:
        lines += [ind.description, ""]
    if getattr(ind, "missing", None):
        lines.append("This indicator will check for missing values "
                     f'according to the method "{ind.missing}".')
    lines.append(f"Based on compute :py:func:`{ind.compute}`.")
    if ind.parameters:
        lines += ["", "Parameters", "----------"]
        for name, p in ind.parameters.items():
            default = getattr(p, "default", None)
            units = getattr(p, "units", "") or ""
            annot = f" [{units}]" if units else ""
            lines.append(f"{name}{annot} : default {default!r}")
    if ind.units:
        lines += ["", "Returns", "-------",
                  f"{ind.identifier} [{ind.units}]"]
    if ind.references:
        lines += ["", "References", "----------", ind.references]
    return "\n".join(lines) + "\n"


def prefix_attrs(source: dict, keys, prefix: str) -> dict:
    """Rename selected keys of an attrs dict by adding ``prefix``
    (reference ``prefix_attrs``, formatting.py:544-568)."""
    return {(f"{prefix}{k}" if k in keys else k): v
            for k, v in source.items()}


def unprefix_attrs(source: dict, keys, prefix: str) -> dict:
    """Inverse of :func:`prefix_attrs` (reference formatting.py:571-597):
    strips ``prefix`` from matching keys; un-prefixed keys keep their
    value unless the stripped key already claimed the slot."""
    out: dict = {}
    n = len(prefix)
    for key, val in source.items():
        k = key[n:]
        if k in keys and key.startswith(prefix):
            out[k] = val
        elif key not in out:
            out[key] = val
    return out


def get_percentile_metadata(attrs: dict, prefix: str) -> dict:
    """Percentile-configuration metadata mapping (reference
    ``get_percentile_metadata``, formatting.py:743-775): the threshold
    percentile(s), pooling window and climatology bounds recorded by the
    climatology builders, keyed under ``prefix`` (e.g. ``tasmin_per``).
    ``attrs`` is the climatology's metadata sidecar dict (the engine's
    long-format stand-in for DataArray attrs/coords)."""
    percs = attrs.get("percentiles",
                      attrs.get("quantile", "<unknown percentiles>"))
    return {
        f"{prefix}_thresh": percs,
        f"{prefix}_window": attrs.get("window", "<unknown window>"),
        f"{prefix}_period": attrs.get("climatology_bounds",
                                      "<unknown bounds>"),
    }


def update_history(hist_str: str, *inputs, new_name: str | None = None,
                   **named_inputs) -> str:
    """Timestamped history line prepended to the merged input histories:
    ``[<UTC timestamp>] <name>: <hist_str> - xclim_spark version <v>``."""
    from . import __version__

    merged = merge_attributes("history", *inputs, new_line="\n",
                              missing_str="", **named_inputs)
    stamp = dt.datetime.now(dt.timezone.utc).strftime("%Y-%m-%d %H:%M:%S")
    head = (f"[{stamp}] {new_name or ''}: {hist_str} "
            f"- xclim_spark version: {__version__}")
    return head + ("\n" + merged if merged else "")


def gen_call_string(funcname: str, **kwargs) -> str:
    """``funcname(k1=v1, k2=v2)`` with repr-formatted scalars."""
    elems = []
    for k, v in kwargs.items():
        if isinstance(v, str):
            elems.append(f"{k}='{v}'")
        else:
            elems.append(f"{k}={v!r}")
    return f"{funcname}({', '.join(elems)})"
