"""CLI end-to-end: the reference's `node index.js <type> <file>`
contract (S1 in SURVEY.md §2) through the Python entry point."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

from cgtcalc_data_transformer_spark import fixtures

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd):
    return subprocess.run(
        [sys.executable, "-m", "cgtcalc_data_transformer_spark", *args],
        cwd=cwd,
        env={**os.environ, "PYTHONPATH": REPO},
        capture_output=True,
        text=True,
        timeout=300,
    )


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    (d / "ii.csv").write_text(fixtures.II_CSV)
    eml = d / "eml"
    eml.mkdir()
    for i, email in enumerate(fixtures.BULLIONVAULT_EMAILS):
        (eml / f"advice{i}.eml").write_text(email)
    return d


def test_cli_ii_then_merge_bullionvault(workdir):
    out = workdir / "data.txt"
    r1 = _run(["ii", str(workdir / "ii.csv"), "--output", str(out)], cwd=workdir)
    assert r1.returncode == 0, r1.stderr[-2000:]
    assert sorted(out.read_text().splitlines()) == sorted(fixtures.EXPECTED_II)

    r2 = _run(["bullionvault", str(workdir / "eml"), "--output", str(out)], cwd=workdir)
    assert r2.returncode == 0, r2.stderr[-2000:]
    lines = out.read_text().splitlines()
    assert sorted(lines) == sorted(fixtures.EXPECTED_II + fixtures.EXPECTED_BULLIONVAULT)
    # chronological order across merged sources
    assert lines[0].split(" ")[1] == "04/01/2024"
    assert "Total transactions" in r2.stdout


def test_cli_rejects_missing_path(workdir):
    r = _run(["ii", str(workdir / "nope.csv")], cwd=workdir)
    assert r.returncode == 1
    assert "does not exist" in r.stderr


def test_cli_rejects_empty_eml_dir(workdir, tmp_path):
    r = _run(["bullionvault", str(tmp_path)], cwd=workdir)
    assert r.returncode == 1
    assert "no .eml files" in r.stderr
