"""Static lint over the driver-facing workload registry.

The driver comparator hashes cell values after sorting columns by name;
it crashes on list cells and distinguishes int64 from float64 renderings
(round-3 postmortem). This lint catches the whole class at pytest time,
before a workload ever reaches the driver:

1. every workload's Spark OUTPUT SCHEMA is scalar-only — no
   array/map/struct/binary columns (md5/array_join them per the xhash
   rule in ``operators/xhash.py``);
2. the priority window is well-formed: 50 unique, registered names.

Schema checks need analysis only (no job execution) for pure-plan
workloads; iterative builders (pagerank, clusters) run their bounded
driver loops at sf0.001, which is cheap.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from etl_lealone_spark.workloads import _PRIORITY, all_workloads

_FORBIDDEN = (T.ArrayType, T.MapType, T.StructType, T.BinaryType)


def test_priority_window_well_formed():
    wl = all_workloads()
    assert len(_PRIORITY) == len(set(_PRIORITY)), "duplicate priority entries"
    missing = [n for n in _PRIORITY if n not in wl]
    assert not missing, f"priority names not registered: {missing}"
    # the driver reads exactly the first 50 registry entries
    assert len(wl) >= 50


@pytest.fixture(scope="module")
def workload_schemas(spark, sf_dir):
    out = {}
    for name, w in all_workloads().items():
        out[name] = w.build(spark, sf_dir).schema
    return out


def test_all_outputs_scalar_only(workload_schemas):
    bad = []
    for name, schema in workload_schemas.items():
        for f in schema.fields:
            if isinstance(f.dataType, _FORBIDDEN):
                bad.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not bad, (
        "non-scalar driver-facing output columns (driver comparator "
        f"crashes on these — md5/array_join them): {bad}"
    )


def test_all_outputs_no_unaliased_aggregates(workload_schemas):
    # an un-aliased aggregate surfaces as e.g. `sum(l_quantity)` and can
    # never hash-match the oracle's alias
    bad = [
        f"{name}.{f.name}"
        for name, schema in workload_schemas.items()
        for f in schema.fields
        if "(" in f.name
    ]
    assert not bad, f"un-aliased computed columns: {bad}"
