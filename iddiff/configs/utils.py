"""Config loading: importable .py modules or pickled ConfigDicts.

Stable importable paths (unlike the reference's machine-specific shims,
configs/utils.py:13-44): a config file is loaded directly from its file path.
"""
from __future__ import annotations

import importlib.util
import pickle


def read_config(path: str):
    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            return pickle.load(f)
    spec = importlib.util.spec_from_file_location("exp_config", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.get_config()
