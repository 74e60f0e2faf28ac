"""Scripted ID estimation on a saved checkpoint (rebuild of /root/reference/get_dim.py).

Usage: python scripts/get_dim.py --config <cfg.py> --workdir <dir> [--name svd]
"""
from absl import app, flags

FLAGS = flags.FLAGS
flags.DEFINE_string("config", None, "Experiment config path")
flags.DEFINE_string("workdir", None, "Checkpoint/log dir")
flags.DEFINE_string("name", "svd", "Spectra pickle name")
flags.mark_flags_as_required(["config"])


def main(argv):
    del argv
    from iddiff.configs.utils import read_config
    from iddiff import run_lib

    config = read_config(FLAGS.config)
    dims = run_lib.get_manifold_dimension(config, workdir=FLAGS.workdir,
                                          name=FLAGS.name)
    print(list(dims))


if __name__ == "__main__":
    app.run(main)
