"""SIGTERM must shut a training run down CLEANLY (exit code 143).

Supervisors (cluster/*.sh) stop runs with SIGTERM; main.py converts it to
SystemExit so the stack unwinds and the PJRT client closes its session —
on the tunneled TPU an abruptly-killed client leaves a stale session that
blocks the NEXT process's first device RPC for ~9-10 min (RESULTS.md
round 5).  This test pins the handler: the process must exit with 143
(not be killed by the default disposition, which reports signal death).
"""
import os
import signal
import subprocess
import sys
import tempfile
import time

import pytest


CONFIG = """
import ml_collections
from iddiff.configs.dimension_estimation.gaussian_bubbles import get_config as _g

def get_config():
    c = _g()
    c.model.hidden_nodes = 32
    c.model.hidden_layers = 1
    c.data.data_samples = 512
    c.training.batch_size = 64
    c.training.num_epochs = 10_000   # long enough to be interrupted
    c.logging.log_freq = 1
    return c
"""


@pytest.mark.slow
def test_sigterm_exits_cleanly_with_143():
    with tempfile.TemporaryDirectory() as td:
        cfg = os.path.join(td, "cfg.py")
        with open(cfg, "w") as f:
            f.write(CONFIG)
        wd = os.path.join(td, "wd")
        env = {k: v for k, v in os.environ.items()
               if not k.startswith("JAX_") and k != "XLA_FLAGS"}
        # the JAX_PLATFORMS env var is ignored when sitecustomize imports
        # jax first (verify-skill gotcha); IDDIFF_PLATFORM is applied by
        # main.py AFTER import, which sticks — and keeps this subprocess
        # off the TPU a live trainer may own
        env["IDDIFF_PLATFORM"] = "cpu"
        # output to a FILE, not a PIPE: with log_freq=1 the run floods a
        # never-drained 64 KB pipe buffer, blocking a logging thread (and
        # with it the main thread through shared locks) so the SIGTERM
        # handler can never run — which is a test artifact, not a product
        # behavior
        outpath = os.path.join(td, "out.log")
        outf = open(outpath, "w")
        proc = subprocess.Popen(
            [sys.executable, "main.py", "--config", cfg, "--mode", "train",
             "--workdir", wd],
            cwd=os.path.join(os.path.dirname(__file__), ".."),
            env=env, stdout=outf, stderr=subprocess.STDOUT,
        )
        metrics = os.path.join(wd, "metrics.jsonl")
        deadline = time.time() + 420
        try:
            while time.time() < deadline:
                if proc.poll() is not None:
                    with open(outpath) as f:
                        out = f.read()
                    raise AssertionError(
                        f"trainer exited early rc={proc.returncode}:\n{out[-2000:]}")
                if os.path.exists(metrics) and os.path.getsize(metrics) > 0:
                    break  # training is live
                time.sleep(2)
            else:
                raise AssertionError("trainer never wrote metrics in 420s")
            proc.send_signal(signal.SIGTERM)
            # CPython delivers the handler between bytecodes: if the main
            # thread is inside a multi-minute native XLA compile (common
            # right after the first metrics on CPU), exit is deferred
            # until the call returns — allow for one full compile.
            rc = proc.wait(timeout=420)
        finally:
            if proc.poll() is None:
                proc.kill()
        assert rc == 143, f"expected clean SystemExit(143), got {rc}"
