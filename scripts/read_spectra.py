"""Print dimension read-outs for archived spectra pickles.

Replays RESULTS.md round-5 tables from any svd pickle(s) produced by the
estimator (reference-compatible schema {'singular_values': (P, d)}):

  python scripts/read_spectra.py artifacts/squares10_trajectory/*.pkl
  python scripts/read_spectra.py --rule log_gap --tail 64 <pickle...>

Shows the reference rule (plot_utils.py:173-183) and the scale-invariant
log_gap rule side by side unless --rule narrows it.
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from iddiff.id.readout import dims_from_spectra


def describe(path: str, rules, tail):
    with open(path, "rb") as f:
        d = pickle.load(f)
    sv = np.asarray(d["singular_values"] if isinstance(d, dict) else d)
    if sv.ndim == 1:
        sv = sv[None]
    cols = []
    for rule in rules:
        dims = dims_from_spectra(sv, rule=rule, tail=tail)
        vals, counts = np.unique(dims, return_counts=True)
        dist = dict(zip(vals.tolist(), counts.tolist()))
        cols.append(f"{rule}: median={np.median(dims):.0f} dist={dist}")
    print(f"{path}  (n={sv.shape[0]}, d={sv.shape[1]})\n  " + "\n  ".join(cols))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("pickles", nargs="+")
    ap.add_argument("--rule", choices=["reference", "log_gap"], default=None)
    ap.add_argument("--tail", type=int, default=None)
    args = ap.parse_args()
    rules = [args.rule] if args.rule else ["reference", "log_gap"]
    for p in args.pickles:
        describe(p, rules, args.tail)


if __name__ == "__main__":
    main()
