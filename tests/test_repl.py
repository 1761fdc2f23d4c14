"""REPL smoke test — drives scripts/repl.py through its stdin surface."""

from __future__ import annotations

import subprocess

from conftest import SF_DIR


def test_repl_end_to_end():
    script = (
        "SELECT COUNT(*) AS n FROM region;\n"
        "SELECT bogus FROM nonexistent;\n"   # must not kill the shell
        "SELECT r_name FROM region WHERE r_regionkey = 2;\n"
        "EXIT;\n"
    )
    proc = subprocess.run(
        ["python", "scripts/repl.py", SF_DIR],
        input=script,
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    out = proc.stdout
    assert proc.returncode == 0
    assert "|  5|" in out                  # region count
    assert "error: AnalysisException" in out  # recovered from bad SQL
    assert "ASIA" in out                   # query after the error still ran
    assert "bye" in out
