"""Two-virtual-node crawl (ray.cluster_utils.Cluster): the plasma
frontier, det-mode plasma admission splits and hist-based part routing
must work when producer and consumer actors sit on DIFFERENT nodes
with separate object stores.  Runs as a subprocess because the script
owns its own Ray cluster (the suite's session fixture owns this
process's Ray)."""

import json
import os
import subprocess
import sys


def test_two_virtual_nodes_crawl_and_locality():
    script = os.path.join(os.path.dirname(__file__), "multinode_script.py")
    proc = subprocess.run(
        [sys.executable, script],
        capture_output=True,
        text=True,
        timeout=280,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(script))),
    )
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert proc.returncode == 0 and lines, f"script failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    out = json.loads(lines[-1])
    assert out["ok"] and out["nodes"] == 2
    assert out["stored"] > 0 and out["parts"] > 0
    # the locality routing must beat a uniform 2-node scatter (0.5
    # expected local) by a clear margin — measured 0.93 on this world
    assert out["local_frac"] is not None and out["local_frac"] >= 0.6, out
