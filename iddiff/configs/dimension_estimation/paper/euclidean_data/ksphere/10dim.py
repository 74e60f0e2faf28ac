"""Reference-path alias: configs/dimension_estimation/paper/euclidean_data/ksphere/10dim.py"""
from iddiff.configs.dimension_estimation.ksphere import ksphere_config


def get_config():
    return ksphere_config(manifold_dim=10, ambient_dim=100)
