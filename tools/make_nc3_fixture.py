"""Generate the committed golden NetCDF3-classic fixture
(tests/golden/tiny_tas.nc): 5 days x 3 cells of deterministic values.
Run once; the fixture is committed so tests never regenerate it."""

import os

import numpy as np

from xclim_spark.io.netcdf3 import write_nc3

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "tests", "golden", "tiny_tas.nc")

time = np.arange(5, dtype="int32")
cell = np.array([1, 2, 3], dtype="int32")
# deterministic: tas[t, c] = 20.25 - 3*t - 0.875*(c-1) — pinned in tests
tas = 20.25 - 3.0 * time[:, None] - 0.875 * (cell[None, :] - 1)
assert tas[0, 0] == 20.25 and abs(tas[4, 2] - 6.5) < 1e-9

write_nc3(
    OUT, {"time": 5, "cell": 3},
    {"time": (["time"], time), "cell": (["cell"], cell),
     "tas": (["time", "cell"], tas)},
    gattrs={"title": "xclim_spark golden fixture"},
    var_attrs={"time": {"units": "days since 2001-01-01"},
               "tas": {"units": "degC"}},
)
print("wrote", OUT, "tas[4,2] =", tas[4, 2])
