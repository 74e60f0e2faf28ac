"""MNIST ID-estimation config — the paper's image flagship.

Mirrors /root/reference/configs/dimension_estimation/paper/image_data/MNIST/
config.py: DDPM U-Net (nf=128, ch_mult (1,2,2), 4 res blocks, attn@16),
VESDE σ∈[0.01, 10], B=128, svd_points=50, images padded 28→32 (NHWC here).
"""
import ml_collections

from iddiff.configs.default import get_default_configs


def get_config():
    config = get_default_configs()

    config.logging.log_path = "logs/mnist/"
    config.logging.log_name = "mnist"
    config.logging.top_k = 3
    config.logging.svd_frequency = 10
    config.logging.svd_points = 50

    training = config.training
    training.batch_size = 128
    training.num_epochs = 10_000
    training.n_iters = 500_000
    training.likelihood_weighting = True
    training.continuous = True
    training.sde = "vesde"
    training.visualization_callback = ["ScoreSpectrumVisualization", "base"]

    config.validation.batch_size = 128

    config.data = data = ml_collections.ConfigDict()
    data.datamodule = "image"
    data.dataset = "mnist"
    data.base_dir = "datasets/"
    data.split = [0.9, 0.05, 0.05]
    data.image_size = 32
    data.effective_image_size = 32
    data.num_channels = 1
    data.centered = False
    data.use_data_mean = False
    data.return_labels = False
    data.shape = [32, 32, 1]

    config.model = model = ml_collections.ConfigDict()
    model.checkpoint_path = None
    model.sigma_max = 10.0
    model.sigma_min = 1e-2
    model.name = "ddpm"
    model.nf = 128
    model.ch_mult = [1, 2, 2]
    model.num_res_blocks = 4
    model.attn_resolutions = [16]
    model.dropout = 0.0
    model.resamp_with_conv = True
    model.conditional = True
    model.nonlinearity = "swish"
    model.input_channels = 1
    model.output_channels = 1
    model.num_scales = 1000
    model.ema_rate = 0.9999

    config.optim.lr = 2e-4
    config.optim.warmup = 5000

    config.dim_estimation = ml_collections.ConfigDict()
    config.dim_estimation.num_datapoints = 50
    return config
