"""bench.py stdout-contract guards (no Spark).

The driver records only the LAST 2000 chars of bench stdout; a line
longer than that arrives head-truncated and parses as null (the
BENCH_r03 lesson). These tests pin the pruning floor as the registry
grows past 200 queries (VERDICT r5 item 5).
"""

from __future__ import annotations

import importlib.util
import json
import os


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    return bench


def _payload(bench, timings):
    # Build via the SAME constructor main() uses — a hand-kept mirror
    # went stale when main() grew cold_first_run and BENCH_r07 shipped
    # unparseable (VERDICT r7 item 1). Worst-case field widths: every
    # query also appears in the fat cold map.
    skew = {
        f"skew_{label}": 9999.999
        for label in ("plain", "aqe_split", "salted", "salted_partial")
    }
    cold = {n: 9999.999 for n in timings}
    return bench.build_payload(timings, skew, 1.0, cold)


def test_compact_line_carries_no_fat_fields():
    """Whitelist guard: the compact line must never carry per-query
    maps other than the pruned 'queries' — any future fat field added
    to build_payload() must stay in BENCH_DETAIL.json."""
    bench = _load_bench()
    timings = {f"q{i:03d}": 9999.999 for i in range(300)}
    line = bench.compact_line(_payload(bench, timings), timings)
    parsed = json.loads(line)
    allowed = set(bench._COMPACT_KEYS) | {
        "n_queries", "n_errors", "detail", "queries", "queries_shown"
    }
    assert set(parsed) <= allowed, set(parsed) - allowed
    assert "cold_first_run" not in parsed
    assert "excluded" not in parsed


def test_bench_line_fits_at_current_headline():
    """The real HEADLINE set with worst-case timing widths must emit
    one parseable line within the tail window."""
    bench = _load_bench()
    timings = {n: 9999.999 for n in bench.HEADLINE}
    line = bench.compact_line(_payload(bench, timings), timings)
    assert 0 < len(line) <= 1800
    parsed = json.loads(line)
    assert parsed["n_queries"] == len(bench.HEADLINE)
    assert "excluded" not in parsed  # detail lives in BENCH_DETAIL.json


def test_no_silent_bench_regression_vs_baseline():
    """VERDICT r6 item 6: no query slower than 0.5 s may regress more
    than 2.5x between the committed baseline snapshot (previous
    round's BENCH_DETAIL, frozen as BENCH_BASELINE.json at rotation)
    and the current BENCH_DETAIL.json. Sub-0.5 s queries live inside
    the shared-host noise band (frequent_pairs' 1.5x move in r6) and
    are exempt; anything bigger moving 2.5x is a plan change, not
    noise.

    Current times are divided by the detail's host_factor before the
    comparison (VERDICT r12 item 1: the r12 driver re-benched on a
    1.564x-slower host and the RAW comparison turned the suite red on
    three queries whose normalized times were all inside band — a
    guard that reddens on host speed trains everyone to ignore it).
    The factor is sane-bounded: a reading ≥3x means the session was
    too contended for ANY adjudication and the detail should not be
    committed at all.

    Cache-fronted queries (min-of-3 served by the CacheManager — see
    bench.build_payload) are compared on cold_first_run on BOTH sides:
    their min3 times a cache hit, not the operator (VERDICT r12 item
    7, the simjoin_prefix_summary 0.44 s-vs-9.94 s gap)."""
    root = os.path.join(os.path.dirname(__file__), "..")
    with open(os.path.join(root, "BENCH_BASELINE.json")) as fh:
        base_detail = json.load(fh)
    with open(os.path.join(root, "BENCH_DETAIL.json")) as fh:
        cur_detail = json.load(fh)
    offenders = _regression_offenders(base_detail, cur_detail)
    assert not offenders, f"bench regressions vs baseline: {offenders}"


def _regression_offenders(base_detail, cur_detail):
    """Shared contract core, also exercised by the synthetic red-case
    test below. Normalization is PER WORKLOAD CLASS (VERDICT r13 item
    2): host drift is class-shaped (scan ~1.0x vs expression ~2.1x
    across VM generations), so each query divides by ITS class's
    calibrator factor (host_factor_by_class + query_class in the
    detail, emitted by bench.build_payload); queries without a class
    assignment fall back to the scalar geomean host_factor."""
    hf = cur_detail.get("host_factor") or 1.0
    assert 0.3 < hf < 3.0, f"host_factor {hf} outside sane band"
    by_class = cur_detail.get("host_factor_by_class") or {}
    qclass = cur_detail.get("query_class") or {}
    for c, f in by_class.items():
        assert 0.3 < f < 3.0, f"class factor {c}={f} outside sane band"
    fronted = set(cur_detail.get("cache_fronted") or [])

    def eff(detail, name):
        if name in fronted:
            return detail.get("cold_first_run", {}).get(
                name, detail["queries"][name]
            )
        return detail["queries"][name]

    base_q, cur_q = base_detail["queries"], cur_detail["queries"]
    # Two tiers (VERDICT r7 item 2: 2.5x was too loose to see a 33%
    # move on a 2 s query): expensive queries get a tighter band —
    # their timings are stable enough that 1.6x is a plan change.
    offenders = {}
    for n in base_q.keys() & cur_q.keys():
        hf_n = by_class.get(qclass.get(n), hf)
        b, c = eff(base_detail, n), eff(cur_detail, n) / hf_n
        if (b > 0.5 and c > b * 2.5) or (b > 1.5 and c > b * 1.6):
            offenders[n] = (b, round(c, 3), cur_q[n], qclass.get(n))
    return offenders


def test_per_class_normalization_catches_masked_regression():
    """Synthetic red case (VERDICT r13 item 2): on a host whose
    expression class runs 2x slow, the scalar geomean factor (~1.26)
    would normalize a genuinely-2x-regressed scan query back to 1.6x
    and let the 2.5x tier pass it; the per-class factor (scan = 1.0)
    must flag it. Also asserts the healthy expression query does NOT
    flag under its own class factor (no false positive from the same
    detail)."""
    base = {"queries": {"scan_q": 1.0, "expr_q": 1.0}}
    cur = {
        "queries": {"scan_q": 2.6, "expr_q": 2.0},
        # geomean(1.0, 2.0) ~ 1.414 -> scan_q normalizes to 1.84x
        # (passes 2.5x) under the scalar; expr_q to 1.41x.
        "host_factor": 1.414,
        "host_factor_by_class": {"scan": 1.0, "expression": 2.0},
        "query_class": {"scan_q": "scan", "expr_q": "expression"},
    }
    # scalar-only view (strip the class fields): masked
    scalar_cur = {k: v for k, v in cur.items()
                  if k not in ("host_factor_by_class", "query_class")}
    assert _regression_offenders(base, scalar_cur) == {}
    # per-class view: the scan regression is caught, expr stays green
    offenders = _regression_offenders(base, cur)
    assert set(offenders) == {"scan_q"}, offenders


def test_bench_line_floor_keep_zero_fits():
    """Pathological query names force the pruning loop to its keep=0
    floor — the minimal line must still fit and parse (a silent
    oversized line at the floor would null the round's BENCH record).
    """
    bench = _load_bench()
    # ~450-char names: even keep=5 overflows 1800, forcing the floor
    timings = {f"query_with_a_very_long_name_{i:04d}" * 15: 9999.999 for i in range(300)}
    line = bench.compact_line(_payload(bench, timings), timings)
    assert 0 < len(line) <= 1800
    parsed = json.loads(line)
    assert parsed["queries_shown"] == 0
    assert parsed["queries"] == {}
    assert parsed["n_queries"] == 300


def test_bench_errors_surface_as_count_not_fat_map():
    """VERDICT r8 item 1c: a crash-isolated query failure must surface
    on the compact line as a COUNT (names live in BENCH_DETAIL.json),
    and the error map itself must never ride the line."""
    bench = _load_bench()
    timings = {f"q{i:03d}": 1.0 for i in range(20)}
    skew = {"skew_plain": 1.0}
    cold = dict(timings)
    errors = {"join_bucketed": "SparkRuntimeException: LOCATION_ALREADY_EXISTS " * 8}
    payload = bench.build_payload(timings, skew, 0.1, cold, errors)
    assert payload["errors"] == errors  # full detail persisted
    line = bench.compact_line(payload, timings)
    parsed = json.loads(line)
    assert parsed["n_errors"] == 1
    assert "errors" not in parsed
    assert "LOCATION_ALREADY_EXISTS" not in line


def test_bench_errors_default_zero():
    bench = _load_bench()
    timings = {"q1": 1.0}
    payload = bench.build_payload(timings, {}, 0.1, {"q1": 1.0})
    parsed = json.loads(bench.compact_line(payload, timings))
    assert parsed["n_errors"] == 0


def test_drift_band_from_start_mid_end_readings():
    """host_factor_band = [min, max] of the per-phase geomean factors
    — the width is the intra-session (and workload-class) spread the
    r12 verdict showed a single start-of-session factor cannot
    represent."""
    bench = _load_bench()
    pins = bench.CALIBRATORS
    drift = {
        "start": {n: v * 2.0 for n, v in pins.items()},  # factor 2.0
        "mid": {n: v * 1.0 for n, v in pins.items()},    # factor 1.0
        "end": {n: v * 1.5 for n, v in pins.items()},    # factor 1.5
    }
    payload = bench.build_payload(
        {"q1": 1.0}, {}, 0.1, {"q1": 1.0}, calibrator_drift=drift
    )
    assert payload["host_factor_band"] == [1.0, 2.0]
    # an incomplete phase reading contributes nothing (never a crash)
    drift["mid"] = {"q1_pricing_summary": 1.0}
    payload = bench.build_payload(
        {"q1": 1.0}, {}, 0.1, {"q1": 1.0}, calibrator_drift=drift
    )
    assert payload["host_factor_band"] == [1.5, 2.0]
    payload = bench.build_payload({"q1": 1.0}, {}, 0.1, {"q1": 1.0})
    assert payload["host_factor_band"] is None


def test_cache_fronted_rides_detail_not_line():
    """The cache-fronted list is a detail-file field (it can be 50+
    names); the compact line must not carry it."""
    bench = _load_bench()
    timings = {"q1": 1.0}
    payload = bench.build_payload(
        timings, {}, 0.1, {"q1": 9.0}, cache_fronted=["q1"]
    )
    assert payload["cache_fronted"] == ["q1"]
    line = bench.compact_line(payload, timings)
    assert "cache_fronted" not in json.loads(line)


def test_calibrators_pinned_to_frozen_baseline():
    """The calibrator trio's reference times must BE the frozen
    BENCH_BASELINE values (host_factor is measured/baseline — a
    silent drift of either side makes the ratio lie), and each pin
    must be a benched HEADLINE query so the per-mode methodology
    matches."""
    bench = _load_bench()
    root = os.path.join(os.path.dirname(__file__), "..")
    with open(os.path.join(root, "BENCH_BASELINE.json")) as fh:
        base = json.load(fh)["queries"]
    assert set(bench.CALIBRATORS) <= set(bench.HEADLINE)
    for name, pinned in bench.CALIBRATORS.items():
        assert base[name] == pinned, (name, pinned, base[name])
