"""Reference-path alias: .../image_data/gaussian_blobs/10.py"""
from iddiff.configs.dimension_estimation.squares import squares_config


def get_config():
    return squares_config(10, kind="blobs")
