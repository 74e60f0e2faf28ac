"""Reference-path alias: .../image_data/squares/10.py (also 20.py, 100.py)"""
from iddiff.configs.dimension_estimation.squares import squares_config


def get_config():
    return squares_config(10, kind="squares")
