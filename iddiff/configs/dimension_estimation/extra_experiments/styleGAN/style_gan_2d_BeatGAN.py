"""Reference-path alias: .../styleGAN/style_gan_2d_BeatGAN.py"""
from iddiff.configs.dimension_estimation.stylegan import get_config  # noqa: F401
