"""StyleGAN image-manifold ID configs (known latent dim).

Mirrors /root/reference/configs/dimension_estimation/extra_experiments/
styleGAN/style_gan_2d_BeatGAN.py: pre-generated GAN manifolds (GanDataset)
with latent_dim ∈ {2, 10, 50, 64, 100}, BeatGANs U-Net score model.
Usage: get_config("10") etc.; set data.data_path to the manifold files.
"""
import ml_collections

from iddiff.configs.default import get_default_configs


def get_config(variant: str = "2"):
    latent_dim = int(variant)
    config = get_default_configs()

    config.logging.log_path = "logs/stylegan/"
    config.logging.log_name = f"stylegan_{latent_dim}d"
    config.logging.svd_frequency = 20
    config.logging.svd_points = 50

    config.training.batch_size = 64
    config.training.sde = "vesde"
    config.training.visualization_callback = [
        "ScoreSpectrumVisualization", "base",
    ]

    config.data = data = ml_collections.ConfigDict()
    data.datamodule = "Gan"
    data.data_path = "datasets/gan_manifolds/"
    data.style_gan = True
    data.latent_dim = latent_dim
    data.split = [0.8, 0.1, 0.1]
    data.image_size = 64
    data.effective_image_size = 64
    data.num_channels = 3
    data.centered = False
    data.use_data_mean = False
    data.return_labels = False
    data.shape = [64, 64, 3]

    config.model = model = ml_collections.ConfigDict()
    model.checkpoint_path = None
    model.sigma_max = 25.0
    model.sigma_min = 1e-2
    model.name = "BeatGANsUNetModel"
    model.model_channels = 64
    model.channel_mult = [1, 2, 2, 4]
    model.num_res_blocks = 2
    model.attention_resolutions = [16]
    model.num_heads = 4
    model.resblock_updown = True
    model.dropout = 0.0
    model.image_size = 64
    model.out_channels = 3
    model.num_scales = 1000
    model.ema_rate = 0.9999
    model.nonlinearity = "swish"

    config.optim.lr = 1e-4
    config.dim_estimation = ml_collections.ConfigDict()
    config.dim_estimation.num_datapoints = 50
    return config
