"""Bench-scale executability guard.

Two bench rounds in a row nearly died to the same failure class: a
query green at the sf0.01 oracle gate crashed at the bench's sf0.1 —
r04's NTZ breakage voided BENCH_r04.json outright, and round 5's
interval-join span guard tripped only at sf0.1 (the `value` column's
max grows with scale, so an uncapped attribution window breached the
declared span bound there and nowhere smaller).

The oracle differential can't see these: it runs at sf0.01. This test
executes every HEADLINE query once at sf0.1 through the bench's own
noop-write sink (full evaluation — no timing, no best-of-2) so
"bench.py will produce a JSON line" is a tested invariant, not a
hope. Scale-dependent guards (span bounds, corpus validations)
thereby get exercised against the same data AND the same action the
driver benches.
"""

from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="bench-scale testdata absent")
def test_every_headline_query_executes_at_bench_scale(spark):
    import bench
    from s3logs_parquet_spark.plans.queries import QUERIES

    failures = {}
    for name in bench.HEADLINE:
        fn, _sql = QUERIES[name]
        try:
            # bench.force (noop write), NOT count(): count() lets
            # Catalyst prune unused subtrees (e.g. an aggregate's
            # expression inputs and the joins feeding them), so a
            # scale-crash inside a pruned branch would never execute
            # here yet WOULD under the bench's full evaluation —
            # the exact gap this guard exists to close (the
            # count()-pruning artifact, PERF.md round 6)
            bench.force(fn(spark, SF_DIR))
        except Exception as e:  # noqa: BLE001 — collect all, report once
            failures[name] = repr(e)[:300]
    assert not failures, failures


def test_build_once_registry_is_exhaustive():
    """VERDICT r13 #3: the build-once timed-region contract is ONE
    explicit table. Every module-level mutable cache in plans/queries.py
    (the per-(process, sf_dir) build-once pattern is an empty dict/set
    literal at module scope) must be named by a BUILD_ONCE entry — a
    new per-query hidden cache fails here until it is declared. Every
    entry must resolve: the gate and its twin exist in QUERIES, the
    cache object exists."""
    import ast
    import inspect

    from s3logs_parquet_spark.plans import queries as qmod
    from s3logs_parquet_spark.plans.queries import BUILD_ONCE, QUERIES

    tree = ast.parse(inspect.getsource(qmod))
    caches = set()
    for node in tree.body:  # top-level statements only
        target = None
        if isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            target, value = node.target.id, node.value
        elif isinstance(node, ast.Assign) and len(node.targets) == 1 and isinstance(
            node.targets[0], ast.Name
        ):
            target, value = node.targets[0].id, node.value
        if target is None:
            continue
        is_empty_dict = isinstance(value, ast.Dict) and not value.keys
        is_empty_set = (
            isinstance(value, ast.Call)
            and isinstance(value.func, ast.Name)
            and value.func.id == "set"
            and not value.args
        )
        if is_empty_dict or is_empty_set:
            caches.add(target)

    declared = {entry["cache"] for entry in BUILD_ONCE.values()}
    undeclared = caches - declared
    assert not undeclared, (
        f"module-level cache(s) {sorted(undeclared)} in plans/queries.py are "
        "not declared in BUILD_ONCE — add an entry (with the build-included "
        "twin) or remove the cache"
    )
    stale = declared - caches
    assert not stale, f"BUILD_ONCE names cache(s) that no longer exist: {sorted(stale)}"

    for name, entry in BUILD_ONCE.items():
        assert name in QUERIES, f"BUILD_ONCE entry {name} not in QUERIES"
        assert hasattr(qmod, entry["cache"]), entry["cache"]
        assert entry["kind"] in ("plan", "materialized"), entry
        twin = entry["build_included_twin"]
        if twin is not None:
            assert twin.split(" ")[0] in QUERIES, f"{name}: twin {twin!r} not in QUERIES"

    # shared (non-per-query) caches declare module + cache name and
    # must be plan-only: unexecuted plan objects, nothing materialized
    import importlib

    from s3logs_parquet_spark.plans.queries import BUILD_ONCE_SHARED

    for name, entry in BUILD_ONCE_SHARED.items():
        mod = importlib.import_module(entry["module"])
        assert hasattr(mod, entry["cache"]), f"{name}: {entry['cache']} missing"
        assert entry["kind"] == "plan", f"shared cache {name} must be plan-only"
