"""Reference-path alias: .../extra_experiments/mammoth/vesde.py"""
from iddiff.configs.dimension_estimation.mammoth import get_config  # noqa: F401
