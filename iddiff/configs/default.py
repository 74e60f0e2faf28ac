"""Shared default config (schema-compatible with /root/reference/configs/default.py:5-83).

Device fields are gone — JAX owns device placement; parallelism is set via
training.mesh_* knobs instead of gpus/num_nodes.
"""
from datetime import timedelta

import ml_collections


def get_default_configs():
    config = ml_collections.ConfigDict()

    config.logging = logging = ml_collections.ConfigDict()
    logging.log_path = "logs/"
    logging.log_name = "run"
    logging.top_k = 3
    logging.every_n_epochs = None
    logging.envery_timedelta = None  # (sic) name kept for config parity
    logging.svd_frequency = 0
    logging.save_svd = False
    logging.svd_points = 5
    logging.viz_frequency = 100

    config.training = training = ml_collections.ConfigDict()
    training.mode = "train"
    training.lightning_module = "base"  # kept for config parity; selects trainer flavor
    training.mesh_data = -1  # -1: all devices on the data axis
    training.mesh_model = 1
    training.accumulate_grad_batches = 1
    training.workers = 0
    training.batch_size = 128
    training.num_epochs = 10_000
    training.n_iters = 500_000
    training.log_freq = 50
    training.eval_freq = 2500
    training.likelihood_weighting = True
    training.continuous = True
    training.reduce_mean = False
    training.sde = "vesde"
    training.conditional = False
    training.visualization_callback = None
    training.show_evolution = False

    config.validation = validation = ml_collections.ConfigDict()
    validation.batch_size = 128
    validation.workers = 0

    config.sampling = sampling = ml_collections.ConfigDict()
    sampling.method = "pc"
    sampling.predictor = "reverse_diffusion"
    sampling.corrector = "none"
    sampling.n_steps_each = 1
    sampling.noise_removal = True
    sampling.probability_flow = False
    sampling.snr = 0.15

    config.eval = evaluate = ml_collections.ConfigDict()
    evaluate.workers = 0
    evaluate.batch_size = 256
    evaluate.enable_sampling = True
    evaluate.num_samples = 1000
    evaluate.enable_loss = True

    config.optim = optim = ml_collections.ConfigDict()
    optim.weight_decay = 0.0
    optim.optimizer = "Adam"
    optim.lr = 2e-4
    optim.beta1 = 0.9
    optim.eps = 1e-8
    optim.warmup = 5000
    optim.grad_clip = 1.0

    config.seed = 42
    config.dim_estimation = ml_collections.ConfigDict()
    return config
