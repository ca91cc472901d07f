"""bench.py --quick: the structural smoke for the headline bench harness.

VERDICT r3 task 8 ("cheap insurance for the next kernel"): round 3 shipped a
BENCH_r03 crash because bench.py's exact program structure (jit ∘ vmap over
the fused Pallas frontend) was never executed off-TPU. --quick runs every
bench section — same jit/vmap/scan nesting, plus the pallas frontend in
interpret mode — on tiny CPU shapes, so structural breakage of the harness
itself can never again reach a snapshot unseen. This test runs it exactly
the way a developer (or CI) would.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_quick_runs_green():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    proc = subprocess.run(
        [sys.executable, "bench.py", "--quick"],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=1500,
    )
    assert proc.returncode == 0, (
        f"bench.py --quick crashed (rc={proc.returncode}):\n"
        f"{proc.stderr[-3000:]}"
    )
    line = proc.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["metric"] == "quick_structural_smoke"
    assert rec["value"] == 1.0
