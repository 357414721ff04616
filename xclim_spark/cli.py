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


def main(argv: list[str] | None = None) -> int:
    from pyspark.sql import SparkSession

    from .indicators import registry

    args = build_parser().parse_args(argv)
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
