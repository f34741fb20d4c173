"""Guard against driver-environment divergence: the full contract
query sweep must pass on a SparkSession built with NO engine conf.

See ``vanilla_gate.py`` for why this needs a subprocess. Round-1
regression: ``contract.table()`` relied on session-build-time conf for
the events fixture's TIMESTAMP(NANOS) column, which the driver's
vanilla session didn't have — six contract queries errored.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest
# full-suite-only: fuzz/property suite, excluded from the default
# fast gate (pytest.ini); run with -m slow
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_vanilla_session_parity():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tests", "vanilla_gate.py")],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    if proc.returncode != 0:
        tail = "\n".join(proc.stdout.splitlines()[-60:])
        raise AssertionError(f"vanilla gate failed:\n{tail}\n{proc.stderr[-2000:]}")
