"""IO tier: dataset read/write + NetCDF ingest.

The engine's native format is Parquet (long layout, partitioned by
year/variable for partition pruning); NetCDF enters through a
manifest-parallel converter (reference CLI open path,
``src/xclim/cli.py:55-73``).
"""

from .netcdf import ingest_netcdf, netcdf_manifest
from .zarr import read_zarr, write_zarr_array, zarr_chunk_manifest
from .dataset import write_dataset, read_dataset

__all__ = ["ingest_netcdf", "netcdf_manifest", "write_dataset",
           "read_dataset"]
