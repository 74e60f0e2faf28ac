"""Synthetic squares / gaussian-blob image manifolds of known ID.

Mirrors /root/reference/configs/dimension_estimation/paper/image_data/
squares/{10,20,100}.py and gaussian_blobs/*: FixedSquaresManifold (ID =
num_squares) / FixedGaussiansManifold (ID = num_gaussians), 32×32, DDPM
U-Net, VESDE.  get_config("10"), get_config("blobs_20"), etc.
"""
import ml_collections

from iddiff.configs.default import get_default_configs


def squares_config(num_components: int = 10, kind: str = "squares"):
    config = get_default_configs()

    name = f"{kind}_{num_components}"
    config.logging.log_path = f"logs/{kind}/"
    config.logging.log_name = name
    config.logging.svd_frequency = 20
    config.logging.svd_points = 50

    training = config.training
    training.batch_size = 128
    training.sde = "vesde"
    training.visualization_callback = ["ScoreSpectrumVisualization", "base"]

    config.data = data = ml_collections.ConfigDict()
    data.datamodule = "Synthetic"
    data.split = [0.8, 0.1, 0.1]
    data.data_samples = 50_000
    data.image_size = 32
    data.effective_image_size = 32
    data.num_channels = 1
    data.centered = False
    data.use_data_mean = False
    data.return_labels = False
    data.shape = [32, 32, 1]
    if kind == "squares":
        data.dataset_type = "FixedSquaresManifold"
        data.num_squares = num_components
        data.square_range = [3, 5]
    else:
        data.dataset_type = "FixedGaussiansManifold"
        data.num_gaussians = num_components
        data.std_range = [1, 5]

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
    config.dim_estimation = ml_collections.ConfigDict()
    config.dim_estimation.num_datapoints = 50
    return config


def get_config(variant: str = "10"):
    if variant.startswith("blobs_"):
        return squares_config(int(variant.split("_")[1]), kind="blobs")
    return squares_config(int(variant), kind="squares")


def paper_budget(config):
    """Full paper-budget overrides (reference configs/dimension_estimation/
    paper/image_data/squares/10.py:29-157): nf=128, ch_mult (1,2,2,2),
    4 res blocks, dropout 0.1, VESDE sigma_max 50, 500k samples."""
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
