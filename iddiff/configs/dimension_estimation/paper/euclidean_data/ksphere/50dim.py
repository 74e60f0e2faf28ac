"""Reference-path alias: .../ksphere/50dim.py"""
from iddiff.configs.dimension_estimation.ksphere import ksphere_config


def get_config():
    return ksphere_config(manifold_dim=50, ambient_dim=100)
