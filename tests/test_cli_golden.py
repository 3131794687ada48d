"""Byte-identical end-to-end check against the reference (VERDICT r1 #4).

Replays the reference CLI's multi-invocation lifecycle — a
pre-existing ``data.txt``, then every case of the reference's own
jest corpus (`/root/reference/__tests__/data/*.json`) run through
each parser in sequence — and diffs the final file BYTE-FOR-BYTE
(trailing newline and tie order included) against what
``node index.js`` would produce on the same inputs.

The reference's merge/sort path (`/root/reference/index.js:108-122`)
is itself untested by its jest suite; the golden here is built by
executing the reference's OWN ``sortTransactionsChronologically``
(extracted verbatim from index.js at test time — never copied into
this repo) over the corpus ``expected`` arrays, which are the
reference parsers' committed outputs. The csv-parse dependency is
not installed in this container, so the parsers themselves cannot
run — the corpus goldens stand in for them, and OUR parsers are
exercised on the reference's raw inputs, closing the loop.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import tempfile

import pytest

from cgtcalc_data_transformer_spark.cli import run_pipeline

REF_DIR = "/root/reference"
CORPUS = ["freetrade", "ii", "fidelity", "bullionvault"]

HAS_NODE = shutil.which("node") is not None
HAS_REF = os.path.isdir(os.path.join(REF_DIR, "__tests__", "data"))

# Pre-existing data.txt: dates interleave with the corpus's, plus one
# line TYING a corpus date (16/06/2023, fidelity BUY) so the
# stable-sort contract (existing before new on equal dates) is pinned.
PRE_EXISTING = [
    "BUY 02/01/2023 SEED_A 1 2.5 0",
    "SELL 16/06/2023 SEED_TIE 3 4 0.5",
    "BUY 30/12/2025 SEED_Z 7 8 0",
]

# The reference CLI joins .eml files with '\nEOF\n' before parsing
# (`index.js:101`); each jest bullionvault input is one email.
GOLDEN_JS = r"""
const fs = require('fs');
const srcPath = process.argv[2];
const specPath = process.argv[3];
const src = fs.readFileSync(srcPath, 'utf8');
const m = src.match(/function sortTransactionsChronologically[\s\S]*?\n}/);
if (!m) throw new Error('cannot extract sortTransactionsChronologically');
eval(m[0]);
const spec = JSON.parse(fs.readFileSync(specPath, 'utf8'));
// replay index.js:108-122 per invocation: read-trim-filter existing,
// append the new batch, sort chronologically, rewrite with trailing \n
let file = spec.existing.join('\n') + '\n';
for (const batch of spec.batches) {
  const existingArr = file.split('\n').map(s => s && s.trim()).filter(Boolean);
  const merged = [...existingArr, ...batch];
  const sorted = sortTransactionsChronologically(merged);
  file = sorted.join('\n') + '\n';
}
process.stdout.write(file);
"""


def _load_corpus():
    out = []
    for name in CORPUS:
        with open(os.path.join(REF_DIR, "__tests__", "data", f"{name}.json")) as f:
            for case in json.load(f):
                out.append((name, case["input"], case["expected"]))
    return out


@pytest.mark.skipif(not HAS_NODE, reason="node not installed")
@pytest.mark.skipif(not HAS_REF, reason="reference corpus not present")
def test_e2e_bytes_match_reference(spark, tmp_path):
    cases = _load_corpus()

    # --- golden: the reference's own sort over its own parser outputs
    spec = {"existing": PRE_EXISTING, "batches": [exp for _, _, exp in cases]}
    spec_file = tmp_path / "spec.json"
    spec_file.write_text(json.dumps(spec))
    js_file = tmp_path / "golden.js"
    js_file.write_text(GOLDEN_JS)
    golden = subprocess.run(
        ["node", str(js_file), os.path.join(REF_DIR, "index.js"), str(spec_file)],
        capture_output=True,
        text=True,
        timeout=60,
        check=True,
    ).stdout

    # --- ours: same sequence through the real CLI pipeline
    out = tmp_path / "data.txt"
    out.write_text("\n".join(PRE_EXISTING) + "\n")
    for i, (ptype, raw_input, _) in enumerate(cases):
        if ptype == "bullionvault":
            in_path = tmp_path / f"in_{i}_eml"
            in_path.mkdir()
            (in_path / "msg.eml").write_text(raw_input)
        else:
            in_path = tmp_path / f"in_{i}.csv"
            in_path.write_text(raw_input)
        run_pipeline(spark, ptype, str(in_path), output=str(out))

    ours = out.read_bytes().decode("utf-8")
    assert ours == golden
