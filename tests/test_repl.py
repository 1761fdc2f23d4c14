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


def test_repl_semicolon_in_string_literal_buffers():
    """A ';' inside a string literal must NOT flush the statement buffer
    (review finding, round 4): the two-line statement below executes as
    ONE query, and the literal's ';' survives into the result."""
    script = (
        "SELECT 'a;b' AS v\n"
        "FROM region WHERE r_regionkey = 0;\n"
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
    assert proc.returncode == 0
    assert "a;b" in proc.stdout
    assert "ERROR" not in proc.stdout
