"""End-to-end quickstart: classic-NetCDF ingest -> indicator ->
partitioned dataset -> frequency analysis.

Runnable in this repo's container (stdlib NetCDF parser, no h5py):

    python examples/quickstart.py [workdir]

At deployment scale the same code runs unchanged on a cluster — the
ingest parallelizes per file, every operator is a Catalyst plan keyed
on (cell[, period]), and the dataset layout prunes by year.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(workdir: str) -> None:
    from xclim_spark import session
    from xclim_spark.indicators import registry
    from xclim_spark.io.dataset import read_dataset, write_dataset
    from xclim_spark.io.netcdf3 import ingest_netcdf3, write_nc3
    from xclim_spark.stats import fa

    spark = session("quickstart", master="local[4]")

    # --- 1. fabricate two years of daily tas as classic NetCDF files ---
    rng = np.random.RandomState(0)
    paths = []
    for year, ndays in (("2001", 365), ("2002", 365)):
        cells = np.arange(4, dtype="int32")
        tas = (15.0 + 12.0 * np.sin(np.arange(ndays) / 58.1)[:, None]
               + rng.normal(0, 2.5, (ndays, len(cells))))
        p = os.path.join(workdir, f"tas_{year}.nc")
        write_nc3(
            p, {"time": 0, "cell": len(cells)},
            {"time": (["time"], np.arange(ndays, dtype="int32")),
             "cell": (["cell"], cells),
             "tas": (["time", "cell"], tas)},
            var_attrs={"time": {"units": f"days since {year}-01-01"},
                       "tas": {"units": "degC"}},
        )
        paths.append(p)

    # --- 2. manifest-parallel ingest (one task per file, no shuffle) ---
    df = ingest_netcdf3(spark, paths, ["tas"])
    print(f"ingested rows: {df.count()}")

    # --- 3. a registry indicator, exactly like the reference's API ---
    out = registry["tx_days_above"](
        df, tasmax="tas", thresh="25 degC", freq="YS",
        time="time", cells=["cell"], missing=None).df
    out.show(8)

    # --- 4. write/read the year-partitioned dataset layout ---
    store = os.path.join(workdir, "dataset")
    write_dataset(df.withColumnRenamed("time", "time"), store,
                  time="time")
    back = read_dataset(spark, store, years=(2002, 2002))
    print(f"2002 rows after partition pruning: {back.count()}")

    # --- 5. return-period values from the new distribution surface ---
    rv = fa(df, "tas", [2, 10], "gumbel_r", "max", "PWM",
            cells=["cell"])
    rv.show(8)


if __name__ == "__main__":
    wd = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xclim_spark_quickstart"
    os.makedirs(wd, exist_ok=True)
    main(wd)
