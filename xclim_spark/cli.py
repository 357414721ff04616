"""Generated CLI: one subcommand per registered indicator
(reference ``src/xclim/cli.py`` — click group with dynamic subcommands,
:120-157; here argparse, since click is not in this environment).

Usage::

    python -m xclim_spark.cli tx_days_above \\
        -i data.parquet -o out.parquet \\
        --map tasmax=qty --cells cell --time day \\
        --thresh "30 degC" --freq MS

The input is read with ``spark.read.parquet``; indicator parameters are
exposed as ``--<name>`` options generated from the spec (the reference
builds click options from ``indicator.parameters`` the same way); the
result is written back as parquet (lazy until the write, like the
reference's dask pipeline).
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    from .indicators import registry

    p = argparse.ArgumentParser(prog="xclim_spark",
                                description=__doc__.split("\n")[0])
    sub = p.add_subparsers(dest="indicator", required=True)
    # utility commands mirroring the reference CLI (cli.py:159-348)
    sp = sub.add_parser("indices", help="List indicators")
    sp.add_argument("--info", action="store_true",
                    help="include titles")
    sp = sub.add_parser("info", help="Show an indicator's metadata")
    sp.add_argument("names", nargs="+")
    sp = sub.add_parser("describe",
                        help="Render an indicator's full docstring")
    sp.add_argument("names", nargs="+")
    sp = sub.add_parser("show_version_info",
                        help="Print dependency versions")
    sp = sub.add_parser("dataflags", help="Run QC data flags")
    sp.add_argument("-i", "--input", required=True)
    sp.add_argument("--var", required=True,
                    help="column to check, e.g. tas=qty")
    sp.add_argument("--cells", default="")
    sp.add_argument("--time", default="time")
    sp.add_argument("--raise-flags", action="store_true")
    sp.add_argument("--master", default="local[*]")
    for name, ind in sorted(registry.items()):
        sp = sub.add_parser(name, help=ind.title or name)
        sp.add_argument("-i", "--input", required=True,
                        help="input parquet path")
        sp.add_argument("-o", "--output", required=True,
                        help="output parquet path")
        sp.add_argument("--map", action="append", default=[],
                        metavar="VAR=COLUMN",
                        help="bind an input variable to a column")
        sp.add_argument("--time", default="time")
        sp.add_argument("--cells", default="",
                        help="comma-separated cell key columns")
        sp.add_argument("--missing", default=None,
                        help="missing-value method (any/pct/at_least_n/wmo)")
        sp.add_argument("--master", default="local[*]")
        for pname, param in ind.parameters.items():
            if param.kind == "dataframe":
                continue
            sp.add_argument(f"--{pname}", default=None,
                            help=f"{param.kind} "
                                 f"(default {param.default!r})")
    return p


def _cmd_indices(args) -> int:
    from .indicators import registry

    for name, ind in sorted(registry.items()):
        line = name if not args.info else f"{name}: {ind.title or ''}"
        print(line)
    return 0


def _cmd_info(args) -> int:
    from .indicators import registry

    for n in args.names:
        ind = registry[n]
        print(f"{n}:")
        print(f"  title: {ind.title}")
        for k in ("units", "standard_name", "long_name", "description",
                  "cell_methods", "references"):
            v = getattr(ind, k, None)
            if v:
                print(f"  {k}: {v}")
        for pname, par in ind.parameters.items():
            print(f"  param {pname}: {par.kind} "
                  f"(default {par.default!r})")
    return 0


def _cmd_version(_args) -> int:
    import numpy
    import pandas
    import pyspark

    import xclim_spark

    print(f"xclim_spark: {getattr(xclim_spark, '__version__', 'dev')}")
    print(f"pyspark: {pyspark.__version__}")
    print(f"pandas: {pandas.__version__}")
    print(f"numpy: {numpy.__version__}")
    return 0


def _cmd_dataflags(args) -> int:
    from pyspark.sql import SparkSession

    from .dataflags import REGISTRY, data_flags

    spark = (SparkSession.builder.master(args.master)
             .appName("xclim_spark:dataflags").getOrCreate())
    df = spark.read.parquet(args.input)
    var, col = args.var.split("=", 1)
    # default per-variable suite, like the reference's variable->flags
    # mapping (reference data/variables.yml + dataflags.py:581)
    if var.startswith(("pr", "precip")):
        checks = {
            "negative_accumulation_values":
                REGISTRY["negative_accumulation_values"](col),
            "very_large_precipitation_events":
                REGISTRY["very_large_precipitation_events"](col),
        }
    else:
        checks = {
            "temperature_extremely_low":
                REGISTRY["temperature_extremely_low"](col),
            "temperature_extremely_high":
                REGISTRY["temperature_extremely_high"](col),
        }
    row = data_flags(df, checks).collect()[0].asDict()
    bad = [k for k, v in row.items() if v]
    for k in bad:
        print(f"FLAG {k}")
    if args.raise_flags and bad:
        raise SystemExit(f"{len(bad)} data flags raised")
    print(f"dataflags: {len(bad)} raised", file=sys.stderr)
    return 0


def main(argv: list[str] | None = None) -> int:
    from pyspark.sql import SparkSession

    from .indicators import registry

    args = build_parser().parse_args(argv)
    if args.indicator == "indices":
        return _cmd_indices(args)
    if args.indicator == "info":
        return _cmd_info(args)
    if args.indicator == "describe":
        from .formatting import generate_indicator_docstring
        from .indicators import registry as _reg

        for n in args.names:
            print(generate_indicator_docstring(_reg[n]))
        return 0
    if args.indicator == "show_version_info":
        return _cmd_version(args)
    if args.indicator == "dataflags":
        return _cmd_dataflags(args)
    ind = registry[args.indicator]
    spark = (
        SparkSession.builder.master(args.master)
        .appName(f"xclim_spark:{args.indicator}").getOrCreate()
    )
    df = spark.read.parquet(args.input)
    kwargs = {}
    for m in args.map:
        var, col = m.split("=", 1)
        kwargs[var] = col
    for pname, param in ind.parameters.items():
        if param.kind == "dataframe":
            continue
        val = getattr(args, pname, None)
        if val is None:
            continue
        if param.kind in ("number", "window"):
            val = float(val) if "." in val else int(val)
        kwargs[pname] = val
    cells = [c for c in args.cells.split(",") if c]
    res = ind(df, time=args.time, cells=cells, missing=args.missing,
              **kwargs)
    res.df.write.mode("overwrite").parquet(args.output)
    print(f"{args.indicator}: wrote {args.output}", file=sys.stderr)
    for k, v in res.attrs.items():
        print(f"  {k}: {v}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
