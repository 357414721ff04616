"""Global engine options + ``set_options`` context manager.

Spark-first counterpart of the reference's ``src/xclim/core/options.py``
(:19-284): a plan-build-time settings dict — options influence how
DataFrame plans are BUILT (which missing mask, how loud validation is),
never executor behavior, so there is nothing to ship to workers.
"""

from __future__ import annotations

METADATA_LOCALES = "metadata_locales"
DATA_VALIDATION = "data_validation"
CF_COMPLIANCE = "cf_compliance"
CHECK_MISSING = "check_missing"
MISSING_OPTIONS = "missing_options"
AS_DATASET = "as_dataset"

OPTIONS: dict = {
    METADATA_LOCALES: [],
    DATA_VALIDATION: "raise",
    CF_COMPLIANCE: "warn",
    CHECK_MISSING: "any",
    MISSING_OPTIONS: {"pct": {"tolerance": 0.05}, "at_least_n": {"n": 20}},
    AS_DATASET: False,
}

_LOUDNESS = frozenset(["log", "warn", "raise"])


def _validate(key: str, value) -> None:
    if key in (DATA_VALIDATION, CF_COMPLIANCE) and value not in _LOUDNESS:
        raise ValueError(f"{key} must be one of {sorted(_LOUDNESS)}")
    if key == CHECK_MISSING:
        from .operators.missing import MISSING_METHODS

        if value is not None and value not in MISSING_METHODS:
            raise ValueError(
                f"{key} must name a registered missing method "
                f"({sorted(MISSING_METHODS)}) or None")
    if key == MISSING_OPTIONS and not isinstance(value, dict):
        raise ValueError(f"{key} must be a dict of method -> kwargs")


class set_options:
    """Set engine options globally or within a ``with`` block (reference
    ``set_options``, options.py:190-284)::

        with set_options(check_missing="pct"):
            ...            # indicators mask outputs by percentage

    Unknown option names raise; values are validated on entry.
    """

    def __init__(self, **kwargs):
        self.old = {}
        for key, value in kwargs.items():
            if key not in OPTIONS:
                raise ValueError(
                    f"Unknown option {key!r}; valid: {sorted(OPTIONS)}")
            _validate(key, value)
            self.old[key] = OPTIONS[key]
        OPTIONS.update(kwargs)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        OPTIONS.update(self.old)
        return False
