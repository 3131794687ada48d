"""Registry/driver-contract guards that run WITHOUT Spark — catch
broken oracle SQL or registry drift in milliseconds, not minutes."""

from __future__ import annotations

import re

import duckdb

from cgtcalc_data_transformer_spark import registry

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)
SF = "/root/testdata/sf0.001"


def test_names_are_well_formed():
    names = list(registry.REGISTRY)
    assert len(names) == len(set(names))
    for n in names:
        assert re.fullmatch(r"[a-z][a-z0-9_]+", n), n


def test_oracles_subset_of_queries():
    assert set(registry.oracle_sql()) <= set(registry.queries())


def test_every_oracle_sql_plans_in_duckdb():
    """EXPLAIN (bind + plan, no execution) every oracle against the
    real table schemas — syntax errors, bad casts, and unknown
    columns all surface here without a Spark session."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    for name, sql in registry.oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:  # pragma: no cover - the assert carries the name
            raise AssertionError(f"oracle for {name!r} does not plan: {e}") from e


def test_bench_headline_subset_of_registry():
    """Every bench HEADLINE entry must be a registered query — a
    rename or removal in the registry without a bench update would
    crash the driver's per-round perf run."""
    import importlib.util, os

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    assert set(bench.HEADLINE) <= set(registry.REGISTRY)
    # every registry query is either benched or has a NAMED exclusion
    # reason — the bench artifact must never silently truncate
    excluded = {n for names in bench.EXCLUDED.values() for n in names}
    assert excluded <= set(registry.REGISTRY)
    assert not (excluded & set(bench.HEADLINE))
    unaccounted = set(registry.REGISTRY) - set(bench.HEADLINE) - excluded
    assert not unaccounted, f"not benched and not excluded: {unaccounted}"


def test_round_window_is_contiguous_prefix():
    """The driver checks the FIRST 50 queries() entries — the rotation
    only works if the declared window is exactly that prefix."""
    names = list(registry.REGISTRY)
    assert names[: len(registry._ROUND_WINDOW)] == registry._ROUND_WINDOW
    assert len(registry._ROUND_WINDOW) == 50
    # every window entry is oracled (hash row) or a declared rows-only
    # streaming engine run
    oracled = set(registry.oracle_sql())
    assert set(registry._ROUND_WINDOW) <= oracled | set(
        registry._STREAMING_ROWS_ONLY
    )
    assert set(registry._STREAMING_ROWS_ONLY) & oracled == set()


def _driver_green_names() -> set[str]:
    """Union of hash-green names across the committed per-round
    driver correctness artifacts from rounds STRICTLY BEFORE the
    active window's round — the ground truth for 'already proven',
    recomputed instead of hand-maintained. The current round's
    artifact lands on disk mid-round; counting it would flag every
    name that went green THIS round as an undeclared reburn the
    moment it is committed (VERDICT r5 item 1)."""
    import glob
    import json
    import os
    import re as _re

    root = os.path.join(os.path.dirname(__file__), "..")
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = _re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m and int(m.group(1)) >= registry.CURRENT_ROUND:
            continue
        with open(path) as fh:
            for name, rec in json.load(fh).items():
                if rec.get("hash_match") is True:
                    green.add(name)
    return green


def test_window_slot_accounting():
    """Mechanical rotation safety (VERDICT r4 item 5): every
    never-driver-green oracled query must occupy a window slot, and
    every slot burned on an already-green name must be a DECLARED
    recheck — a future edit can't silently re-burn slots on proven
    queries or orphan an unproven one."""
    green = _driver_green_names()
    oracled = set(registry.oracle_sql())
    window = set(registry._ROUND_WINDOW)
    never_green = oracled - green
    # (a) nothing oracled-and-unproven is left outside the window
    assert never_green <= window, (
        f"never-driver-green oracled queries missing from the window: "
        f"{sorted(never_green - window)}"
    )
    # (b) already-green window slots are exactly the declared rechecks
    reburned = window & green & oracled
    assert reburned == set(registry._ROUND_RECHECKS), (
        f"undeclared recheck slots: {sorted(reburned - set(registry._ROUND_RECHECKS))}; "
        f"declared but not green/in-window: "
        f"{sorted(set(registry._ROUND_RECHECKS) - reburned)}"
    )
    # (c) this round's new operators are never-green by construction
    assert set(registry._ROUND_NEW) & green == set()
