"""Plot saved singular-value spectra + dim histogram
(rebuild of /root/reference/plot_test.py using plot_utils.py:111-238).

Usage: python scripts/plot_spectra.py --pkl logs/.../svd/svd.pkl [--gt 10]
"""
from absl import app, flags

FLAGS = flags.FLAGS
flags.DEFINE_string("pkl", None, "Spectra pickle path")
flags.DEFINE_integer("gt", None, "Ground-truth dimension vline")
flags.DEFINE_string("out", "spectrum.png", "Output image")
flags.mark_flags_as_required(["pkl"])


def main(argv):
    del argv
    import numpy as np

    from iddiff.analysis import dims_histogram_figure, spectrum_figure
    from iddiff.id import dims_from_spectra, load_spectra

    spectra = np.asarray(load_spectra(FLAGS.pkl))
    dims = dims_from_spectra(spectra)
    print(f"dims: median={np.median(dims)}, all={list(dims)}")
    fig = spectrum_figure(spectra, ground_truth=FLAGS.gt)
    fig.savefig(FLAGS.out, dpi=120)
    hist = dims_histogram_figure(spectra)
    hist.savefig(FLAGS.out.replace(".png", "_dims.png"), dpi=120)
    print(f"wrote {FLAGS.out}")


if __name__ == "__main__":
    app.run(main)
