"""iddiff CLI — TPU-native rebuild of /root/reference/main.py:13-79.

Usage:
  python main.py --config iddiff/configs/dimension_estimation/ksphere.py \
      --mode train --workdir logs/ksphere10
  python main.py --config <path.py|.pkl> --mode manifold_dimension \
      --checkpoint_path <workdir>

Modes: train | manifold_dimension | conditional_manifold_dimension | test |
       multi_scale_test | compute_dataset_statistics
(The reference's inspect_VAE / scoreVAE modes are dead code, SURVEY.md §2.12.)
"""
from __future__ import annotations

from absl import app, flags

FLAGS = flags.FLAGS

flags.DEFINE_string("config", None, "Path to a config .py (get_config()) or .pkl")
flags.DEFINE_string(
    "mode", "train",
    "train | manifold_dimension | conditional_manifold_dimension | test | "
    "multi_scale_test | compute_dataset_statistics",
)
flags.DEFINE_string("workdir", None, "Working dir (default logging.log_path/log_name)")
flags.DEFINE_string("checkpoint_path", None, "Checkpoint dir override")
flags.DEFINE_string("config_variant", None, "Optional get_config(variant) argument")
flags.DEFINE_bool("debug", False, "Shrink batches/epochs for a quick smoke run")
flags.DEFINE_bool("resume", True, "Resume training from the last checkpoint")
flags.mark_flags_as_required(["config"])


def main(argv):
    del argv
    import os
    import signal
    import sys

    # Supervisors stop runs with SIGTERM (cluster/*.sh kill_wait).  Python's
    # default SIGTERM disposition kills the process without unwinding, which
    # leaves the tunneled-TPU session open server-side; the server garbage-
    # collects it only after ~9-10 min, during which the NEXT client's first
    # device RPC blocks (the "startup hang", RESULTS.md round 5).  Raising
    # SystemExit instead unwinds the stack and runs atexit/destructors —
    # including the PJRT client teardown — so the session closes immediately
    # and the next process starts clean.  (CPython runs the handler between
    # bytecodes: delivery is deferred while the main thread sits in a long
    # native call such as an XLA compile — supervisors allow a grace window
    # before escalating to SIGKILL.)
    signal.signal(signal.SIGTERM, lambda *_: sys.exit(143))

    # Force a jax platform.  On hosts whose sitecustomize imports jax and
    # registers a remote TPU backend before user code runs, the
    # JAX_PLATFORMS env var is silently ignored; only a post-import
    # config.update sticks.  IDDIFF_PLATFORM=cpu gives CPU smoke runs on
    # such hosts without touching the TPU (and without contending with a
    # training job that owns the chip).
    platform = os.environ.get("IDDIFF_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)

    from iddiff.configs.utils import read_config
    from iddiff import run_lib

    if FLAGS.config.endswith(".pkl"):
        config = read_config(FLAGS.config)
    else:
        import importlib.util

        spec = importlib.util.spec_from_file_location("exp_config", FLAGS.config)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        if FLAGS.config_variant:
            config = mod.get_config(FLAGS.config_variant)
        else:
            config = mod.get_config()

    if FLAGS.checkpoint_path:
        config.model.checkpoint_path = FLAGS.checkpoint_path
    if FLAGS.debug:  # main.py:45-56 parity
        config.training.batch_size = min(config.training.batch_size, 32)
        config.validation.batch_size = min(config.validation.batch_size, 32)
        config.training.num_epochs = 2
        config.training.n_iters = 50
        config.data.data_samples = min(config.data.get("data_samples", 1000), 1000)
        config.logging.svd_frequency = 1
        config.logging.svd_points = 2

    # multi-host init (the reference's num_nodes/DDP launch, run_lib.py:57-60)
    # — must run before any mesh construction; no-op single-process
    from iddiff.parallel import maybe_initialize_distributed
    from iddiff.utils import enable_compile_cache

    maybe_initialize_distributed(config)
    enable_compile_cache()

    mode = FLAGS.mode
    if mode == "train":
        run_lib.train(config, workdir=FLAGS.workdir, resume=FLAGS.resume)
    elif mode == "manifold_dimension":
        run_lib.get_manifold_dimension(config, workdir=FLAGS.workdir)
    elif mode == "conditional_manifold_dimension":
        run_lib.get_conditional_manifold_dimension(config, workdir=FLAGS.workdir)
    elif mode == "test":
        run_lib.test(config, workdir=FLAGS.workdir)
    elif mode == "multi_scale_test":
        from iddiff.multiscale import multi_scale_test

        multi_scale_test(config, workdir=FLAGS.workdir)
    elif mode == "compute_dataset_statistics":
        run_lib.compute_dataset_statistics(config, workdir=FLAGS.workdir)
    else:
        raise ValueError(f"Unknown mode '{mode}'")


if __name__ == "__main__":
    app.run(main)
