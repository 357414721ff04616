"""Catalog fan-out: map one indicator over a tree of named datasets.

The reference accepts a ``DataTree`` and maps the indicator over every
node (ref: src/xclim/core/indicator.py:174-177,858-877 —
``xarray.map_over_datasets``).  The Spark-first equivalent is a dict of
named DataFrames (a catalog/tree of tables); the fan-out builds ONE
Catalyst plan that unions the per-node subplans tagged with a ``node``
column, so on a cluster the whole tree computes as a single job — no
driver-side loop of actions, and common-subplan reuse/AQE apply across
nodes.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .core import IndicatorResult

__all__ = ["map_over_nodes"]


def map_over_nodes(
    indicator,
    nodes: dict[str, DataFrame],
    node_col: str = "node",
    **kwargs,
) -> IndicatorResult:
    """Apply ``indicator`` to every DataFrame in ``nodes`` and union the
    results with a ``node`` path column.

    ``kwargs`` are passed to every node's indicator call (variable
    mappings, ``freq``, thresholds, ``time=``/``cells=`` …).  Nodes are
    visited in sorted path order so the plan — and therefore the result —
    is deterministic.  Returns an :class:`IndicatorResult` whose ``attrs``
    are the (node-independent) attrs of the first node's result.
    """
    if not nodes:
        raise ValueError("map_over_nodes: empty node catalog")
    outs = []
    attrs: dict[str, str] = {}
    for path in sorted(nodes):
        res = indicator(nodes[path], **kwargs)
        if not attrs:
            attrs = dict(res.attrs)
        outs.append(res.df.withColumn(node_col, F.lit(path)))
    return IndicatorResult(reduce(DataFrame.unionByName, outs), attrs)
