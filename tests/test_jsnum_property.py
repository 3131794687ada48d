"""Property-based fidelity check for the js_num kernel.

The engine's output format contract is JS ``String(number)``
(SURVEY.md §4.4). Hypothesis generates arbitrary finite doubles and
the scalar formatter is compared against an actual JS engine
(``node -e``), plus a round-trip invariant (shortest round-trip means
``Number(String(x)) === x``).
"""

from __future__ import annotations

import json
import shutil
import subprocess

import pytest
from hypothesis import given, settings, strategies as st

from cgtcalc_data_transformer_spark.functions.jsnum import _js_format_scalar

HAS_NODE = shutil.which("node") is not None


@given(st.floats(allow_nan=False, allow_infinity=False))
@settings(max_examples=500, deadline=None)
def test_round_trip(x):
    s = _js_format_scalar(x)
    assert float(s) == x


@given(
    st.lists(
        st.one_of(
            st.floats(allow_nan=False, allow_infinity=False),
            # the domain the parsers live in: money-ish magnitudes
            st.floats(min_value=-1e9, max_value=1e9, allow_nan=False),
            st.integers(min_value=-(10**15), max_value=10**15).map(float),
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=60, deadline=None)
@pytest.mark.skipif(not HAS_NODE, reason="node not installed")
def test_matches_js_engine(xs):
    # ship exact doubles via their Python reprs (shortest round-trip →
    # Number() reconstructs bit-identical values in JS)
    payload = json.dumps([repr(x) for x in xs])
    out = subprocess.run(
        [
            "node",
            "-e",
            "const xs=JSON.parse(process.argv[1]);"
            "console.log(JSON.stringify(xs.map(r=>String(Number(r)))))",
            payload,
        ],
        capture_output=True,
        text=True,
        timeout=30,
        check=True,
    )
    want = json.loads(out.stdout)
    got = [_js_format_scalar(x) for x in xs]
    assert got == want
