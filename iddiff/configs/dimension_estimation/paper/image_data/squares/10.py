"""Reference-path alias with FULL paper-budget hyperparameters.

Parity target: /root/reference/configs/dimension_estimation/paper/
image_data/squares/10.py — nf=128, ch_mult (1,2,2,2), 4 res-blocks,
dropout 0.1, VESDE sigma in [0.01, 50], 500k samples, batch 128,
svd_points 5 (:29-157).  The sibling 20.py/100.py vary num_squares only.
"""
from iddiff.configs.dimension_estimation.squares import squares_config


def paper_budget(config):
    """Overrides that take the quick-run config to the paper's budget."""
    config.data.data_samples = 500_000
    config.model.ch_mult = [1, 2, 2, 2]
    config.model.num_res_blocks = 4
    config.model.dropout = 0.1
    config.model.sigma_max = 50.0
    config.model.ema_rate = 0.999
    config.training.n_iters = 2_500_000
    config.training.num_epochs = 10_000
    config.optim.warmup = 5_000
    config.optim.grad_clip = 1.0
    config.logging.svd_points = 5
    config.logging.svd_frequency = 50
    return config


def get_config():
    return paper_budget(squares_config(10, kind="squares"))
