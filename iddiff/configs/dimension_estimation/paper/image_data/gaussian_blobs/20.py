"""Reference-path alias, full paper budget (gaussian_blobs/20; see squares/10.py)."""
import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "squares10_paper",
    os.path.join(os.path.dirname(__file__), "..", "squares", "10.py"),
)
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)

from iddiff.configs.dimension_estimation.squares import squares_config


def get_config():
    return _mod.paper_budget(squares_config(20, kind="blobs"))
