"""End-to-end CLI test: parquet in -> generated subcommand -> parquet out
(reference src/xclim/cli.py drives indicators the same way)."""

import pytest

from xclim_spark.cli import build_parser, main


def test_parser_has_indicator_subcommands():
    p = build_parser()
    sub = next(a for a in p._actions
               if isinstance(a, type(p._subparsers._group_actions[0])))
    names = set(sub.choices)
    assert {"tx_days_above", "tg_mean", "growing_degree_days"} <= names


def test_cli_tx_days_above_end_to_end(spark, tmp_path):
    from tests.conftest import series

    # 10 days: 3 above 30 degC
    vals = [25, 31, 29, 35, 30, 28, 33, 22, 27, 26]
    df = series(spark, vals, var="tmax", start="2000-01-01")
    inp = str(tmp_path / "in.parquet")
    outp = str(tmp_path / "out.parquet")
    df.write.parquet(inp)

    rc = main([
        "tx_days_above", "-i", inp, "-o", outp,
        "--map", "tasmax=tmax", "--cells", "cell", "--time", "time",
        "--thresh", "30.0 degC", "--freq", "YS", "--master", "local[4]",
    ])
    assert rc == 0

    out = spark.read.parquet(outp).collect()
    assert len(out) == 1
    row = out[0]
    assert row["cell"] == 0
    # strictly above 30: 31, 35, 33
    assert row["tx_days_above"] == 3.0


def test_cli_missing_mask_applied(spark, tmp_path):
    from tests.conftest import series

    vals = [25, None, 29, 35, 30, 28, 33, 22, 27, 26]
    df = series(spark, vals, var="tmax", start="2000-01-01")
    inp = str(tmp_path / "in_missing.parquet")
    outp = str(tmp_path / "out_missing.parquet")
    df.write.parquet(inp)

    rc = main([
        "tx_days_above", "-i", inp, "-o", outp,
        "--map", "tasmax=tmax", "--cells", "cell", "--time", "time",
        "--thresh", "30.0 degC", "--freq", "YS", "--missing", "any",
    ])
    assert rc == 0
    out = spark.read.parquet(outp).collect()
    assert len(out) == 1
    # one NULL day -> 'any' missing mask nulls the period
    assert out[0]["tx_days_above"] is None


def test_cli_rejects_unknown_indicator():
    with pytest.raises(SystemExit):
        build_parser().parse_args(["definitely_not_an_indicator"])


def test_cli_utility_commands(capsys):
    from xclim_spark.cli import main

    assert main(["indices"]) == 0
    out = capsys.readouterr().out
    assert "tx_days_above" in out and "CDD" in out
    assert main(["info", "tx_days_above"]) == 0
    out = capsys.readouterr().out
    assert "title:" in out and "param" in out
    assert main(["show_version_info"]) == 0
    assert "pyspark" in capsys.readouterr().out


def test_cli_dataflags(spark, tmp_path, capsys):
    from pyspark.sql import functions as F

    from xclim_spark.cli import main
    from xclim_spark.testing import timeseries

    d = timeseries(spark, [10.0, 20.0, -95.0], start="2000-01-01")
    path = str(tmp_path / "in.parquet")
    d.write.parquet(path)
    rc = main(["dataflags", "-i", path, "--var", "tas=value",
               "--master", "local[2]"])
    assert rc == 0
    assert "temperature_extremely_low" in capsys.readouterr().out


def test_cli_describe(capsys):
    from xclim_spark.cli import main

    assert main(["describe", "tx_days_above"]) == 0
    out = capsys.readouterr().out
    assert "realm:" in out and "Based on compute" in out
