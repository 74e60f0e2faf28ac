"""CelebA NCSN++ config with Pallas/XLA FIR resampling + sharded SVD.

Mirrors the reference's celebA setup (ImageDatasets.py:31-61 crop pipeline +
NCSN++ with model.fir=True): center-crop 108, bicubic-resize 64, [-1,1]
normalization, full NCSN++ (biggan blocks, progressive output_skip /
input_skip, FIR kernel (1,3,3,1)).
"""
import ml_collections

from iddiff.configs.default import get_default_configs


def get_config():
    config = get_default_configs()

    config.logging.log_path = "logs/celeba/"
    config.logging.log_name = "celeba64"
    config.logging.svd_frequency = 20
    config.logging.svd_points = 50

    config.training.batch_size = 64
    config.training.sde = "vesde"
    config.training.visualization_callback = [
        "ScoreSpectrumVisualization", "base",
    ]

    config.data = data = ml_collections.ConfigDict()
    data.datamodule = "image"
    data.dataset = "celeba"
    data.base_dir = "datasets/"
    data.crop = True
    data.split = [0.9, 0.05, 0.05]
    data.image_size = 64
    data.effective_image_size = 64
    data.num_channels = 3
    data.centered = True
    data.use_data_mean = False
    data.return_labels = False
    data.shape = [64, 64, 3]

    config.model = model = ml_collections.ConfigDict()
    model.checkpoint_path = None
    model.sigma_max = 90.0
    model.sigma_min = 1e-2
    model.name = "ncsnpp"
    model.nf = 128
    model.ch_mult = [1, 2, 2, 2]
    model.num_res_blocks = 4
    model.attn_resolutions = [16]
    model.dropout = 0.0
    model.resamp_with_conv = True
    model.conditional = True
    model.fir = True
    model.fir_kernel = [1, 3, 3, 1]
    model.skip_rescale = True
    model.resblock_type = "biggan"
    model.progressive = "output_skip"
    model.progressive_input = "input_skip"
    model.progressive_combine = "sum"
    model.embedding_type = "fourier"
    model.fourier_scale = 16.0
    model.init_scale = 0.0
    model.nonlinearity = "swish"
    model.output_channels = 3
    model.num_scales = 1000
    model.ema_rate = 0.999

    config.optim.lr = 2e-4
    config.dim_estimation = ml_collections.ConfigDict()
    config.dim_estimation.num_datapoints = 50
    return config
