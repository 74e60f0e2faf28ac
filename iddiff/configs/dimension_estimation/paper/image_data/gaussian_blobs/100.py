"""Reference-path alias at FULL paper budget (gaussian_blobs/100;
parity: /root/reference/configs/dimension_estimation/paper/image_data/
gaussian_blobs/100.py)."""
from iddiff.configs.dimension_estimation.squares import (
    paper_budget,
    squares_config,
)


def get_config():
    return paper_budget(squares_config(100, kind="blobs"))
