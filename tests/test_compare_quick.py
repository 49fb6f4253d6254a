"""In-suite head-to-head vs the ACTUAL reference binary (--quick profile).

Runs scripts/compare_reference.py --quick as a subprocess: tiny datasets,
all four BASELINE configs + the sharded config-4 row, byte-equality
assertions inside the script (it exits nonzero on any mismatch).  The
reference `bft` binary is built on first use by scripts/refbuild/build.sh
(~1 min, cached in /tmp); skip cleanly if the toolchain is unavailable.

VERDICT r4 #9: the cheap equality profile keeps the correctness loop at
seconds per config; the full-size datasets remain round-boundary evidence.
"""

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_compare_reference_quick():
    if shutil.which("g++") is None:
        pytest.skip("no C++ toolchain for the reference build")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "compare_reference.py"), "--quick"],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=870)
    assert p.returncode == 0, (p.stdout[-2000:], p.stderr[-2000:])
    import json
    rows = [json.loads(l) for l in p.stdout.splitlines()
            if l.strip().startswith("{")]
    by = {(r["config"], r.get("engine", "single")): r for r in rows}
    assert by[(2, "single")]["query_csv_byte_equal"]
    assert by[(2, "single")]["kmer_set_equal"]
    assert by[(2, "single")]["branching_equal"]
    assert by[(3, "single")]["query_csv_byte_equal"]
    assert by[(4, "single")]["seq_csv_byte_equal"]
    assert by[(4, "sharded")]["seq_csv_byte_equal"]
    assert by[(1, "single")]["kmer_set_equal"]
