"""Multi-process (2 OS processes x 4 virtual devices) sharded-path proof.

Shells out to tools/multiproc_check.py: jax.distributed.initialize
across real processes, global (data x index) mesh, production
align_winners_sharded step, winner equality vs the single-process run,
and the stats.reduce_across_hosts psum path."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_multiprocess_sharded_step_matches_single_process():
    env = dict(os.environ, PYTHONPATH=REPO)
    # the parent re-inits its own jax on 8 virtual devices; run clean
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multiproc_check.py")],
        capture_output=True, timeout=1500, env=env, text=True,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "MULTIPROC OK" in r.stdout
