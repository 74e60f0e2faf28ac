"""Sampling smoke test: load a checkpoint, sample, save a grid
(rebuild of /root/reference/debug.py:17-54).

Usage: python scripts/debug_sample.py --config <cfg.py> --workdir <dir>
"""
from absl import app, flags

FLAGS = flags.FLAGS
flags.DEFINE_string("config", None, "Experiment config path")
flags.DEFINE_string("workdir", None, "Checkpoint dir")
flags.DEFINE_integer("num", 16, "Number of samples")
flags.DEFINE_string("out", "samples.png", "Output image")
flags.mark_flags_as_required(["config"])


def main(argv):
    del argv
    import jax
    import numpy as np

    from iddiff.configs.utils import read_config
    from iddiff.data import create_datamodule
    from iddiff.models import create_model
    from iddiff.run_lib import _restore_eval_params, _workdir
    from iddiff.sampling import get_sampling_fn
    from iddiff.sde import get_sde

    config = read_config(FLAGS.config)
    dm = create_datamodule(config)
    dm.setup()
    model = create_model(config)
    sde, eps = get_sde(config)
    params = _restore_eval_params(config, model, dm, _workdir(config, FLAGS.workdir))
    shape = (FLAGS.num,) + tuple(dm.train_data.shape[1:])
    sampler = get_sampling_fn(config, sde, model, shape, eps)
    out = sampler(jax.random.PRNGKey(0), params)
    samples = np.asarray(out[0] if isinstance(out, tuple) else out)
    print(f"samples: {samples.shape}, range [{samples.min():.3f}, {samples.max():.3f}]")
    if samples.ndim == 4:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from iddiff.analysis import image_grid

        grid = image_grid(samples)
        plt.imsave(FLAGS.out, grid.squeeze() if grid.shape[-1] == 1 else grid,
                   cmap="gray" if grid.shape[-1] == 1 else None)
        print(f"wrote {FLAGS.out}")


if __name__ == "__main__":
    app.run(main)
