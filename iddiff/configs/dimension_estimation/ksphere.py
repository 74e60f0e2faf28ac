"""k-sphere ID-estimation configs, parameterized by manifold_dim.

Mirrors the paper configs
/root/reference/configs/dimension_estimation/paper/euclidean_data/ksphere/
{10dim,50dim}.py — VESDE (σ_max=4, σ_min=1e-2), fcn 5×2048, B=500,
reverse_diffusion + none, svd_points=5.

Usage: get_config("10") / get_config("50"), or programmatically
ksphere_config(manifold_dim=10).
"""
import ml_collections

from iddiff.configs.default import get_default_configs


def ksphere_config(manifold_dim: int = 10, ambient_dim: int = 100):
    config = get_default_configs()

    config.logging.log_path = "logs/ksphere/"
    config.logging.log_name = f"{manifold_dim}-sphere"
    config.logging.top_k = 5
    config.logging.svd_frequency = 50
    config.logging.save_svd = False
    config.logging.svd_points = 5

    training = config.training
    training.batch_size = 500
    training.num_epochs = 1_000_000
    training.n_iters = 1_000_000
    training.likelihood_weighting = True
    training.continuous = True
    training.sde = "vesde"
    training.visualization_callback = [
        "ScoreSpectrumVisualization",
        "KSphereEvaluation",
    ]

    config.validation.batch_size = 500

    sampling = config.sampling
    sampling.method = "pc"
    sampling.predictor = "reverse_diffusion"
    sampling.corrector = "none"
    sampling.snr = 0.15

    config.data = data = ml_collections.ConfigDict()
    data.datamodule = "KSphere"
    data.split = [0.8, 0.1, 0.1]
    data.data_samples = 50_000
    data.use_data_mean = False
    data.n_spheres = 1
    data.ambient_dim = ambient_dim
    data.manifold_dim = manifold_dim
    data.noise_std = 0.0
    data.embedding_type = "random_isometry"
    data.dim = ambient_dim
    data.num_channels = 0
    data.shape = [ambient_dim]

    config.model = model = ml_collections.ConfigDict()
    model.checkpoint_path = None
    model.sigma_max = 4.0
    model.sigma_min = 1e-2
    model.name = "fcn"
    model.state_size = ambient_dim
    model.hidden_layers = 5
    model.hidden_nodes = 2048
    model.dropout = 0.0
    model.num_scales = 1000
    model.ema_rate = 0.9999

    optim = config.optim
    optim.lr = 2e-5
    optim.warmup = 5000
    optim.grad_clip = 1.0

    config.seed = 42
    return config


def get_config(variant: str = "10"):
    return ksphere_config(manifold_dim=int(variant))
