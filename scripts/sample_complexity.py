"""ID estimate vs dataset size (rebuild of /root/reference/sample_complexity.py).

Runs the estimator over a sweep of data_samples values and prints the
median estimated dimension per size.
"""
from absl import app, flags

FLAGS = flags.FLAGS
flags.DEFINE_string("config", None, "Experiment config path")
flags.DEFINE_string("workdir", None, "Checkpoint dir")
flags.DEFINE_list("sizes", ["1000", "5000", "10000", "50000"], "Dataset sizes")
flags.mark_flags_as_required(["config"])


def main(argv):
    del argv
    import numpy as np

    from iddiff.configs.utils import read_config
    from iddiff import run_lib

    for size in FLAGS.sizes:
        config = read_config(FLAGS.config)
        config.data.data_samples = int(size)
        dims = run_lib.get_manifold_dimension(
            config, workdir=FLAGS.workdir, name=f"svd_n{size}"
        )
        print(f"n={size}: median dim = {np.median(dims)}")


if __name__ == "__main__":
    app.run(main)
