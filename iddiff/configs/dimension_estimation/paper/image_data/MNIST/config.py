"""Reference-path alias: .../image_data/MNIST/config.py"""
from iddiff.configs.dimension_estimation.mnist import get_config  # noqa: F401
