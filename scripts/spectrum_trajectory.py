"""Track the ID read-out and the cliff geometry across training.

Reads the in-training spectra pickles (logging.save_svd=True writes
<workdir>/svd/steps_<S>.pkl; pre-round-4 sessions wrote epoch_<E>.pkl)
and prints, per checkpoint:
  - per-point dims (softmax-gap rule, identical to plot_utils.py:173-183)
  - the "separating" singular value s_{d-k-1} vs the manifold cluster mean
    — the 11->10 crossing of the paper's image experiments is visible as
    this value leaving the cluster and joining the large (normal) group.

Usage: python scripts/spectrum_trajectory.py <workdir> [truth_k]
"""
import glob
import os
import pickle
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from iddiff.id import dims_from_spectra  # noqa: E402


def main():
    workdir = sys.argv[1]
    truth = int(sys.argv[2]) if len(sys.argv) > 2 else None
    files = glob.glob(os.path.join(workdir, "svd", "steps_*.pkl"))
    files += glob.glob(os.path.join(workdir, "svd", "epoch_*.pkl"))
    # legacy epoch_<E> keys count epochs, steps_<S> keys count global
    # steps — the numbers are not comparable, but all epoch-keyed pickles
    # predate the step-keyed ones (the key changed in round 4), so sort
    # epoch files first among themselves, then step files
    files.sort(key=lambda p: (
        0 if "epoch_" in os.path.basename(p) else 1,
        int(re.search(r"(?:steps|epoch)_(\d+)", p).group(1)),
    ))
    if not files:
        print(f"no spectra under {workdir}/svd")
        return
    for f in files:
        with open(f, "rb") as fh:
            svd = pickle.load(fh)
        s = np.asarray(svd["singular_values"])
        dims = dims_from_spectra(s)
        d = s.shape[1]
        k = truth if truth is not None else int(np.median(dims))
        if not 0 < k <= d - 2:
            print(f"{os.path.basename(f)}: dims={[int(v) for v in dims]} "
                  f"(k={k} leaves no cliff room in d={d})")
            continue
        sep = s[:, d - k - 1]            # the candidate (k+1)-th direction
        cluster = s[:, d - k:].mean(1)   # mean of the k manifold values
        big = s[:, d - k - 2]            # smallest of the 'large' group
        m = re.search(r"(steps|epoch)_(\d+)", f)
        print(
            f"{m.group(1)} {m.group(2):>6}: dims={[int(v) for v in dims]} "
            f"median={np.median(dims):.0f}"
            f"  sep/cluster={float((sep / cluster).mean()):6.2f}"
            f"  sep/next-large={float((sep / big).mean()):5.2f}"
        )


if __name__ == "__main__":
    main()
