"""2-D GaussianBubbles with analytic ground-truth score — the Fisher-divergence
oracle config (reference: SyntheticDataset GaussianBubbles + FisherDivergence
callback, lightning_callbacks/callbacks.py:373-390)."""
import ml_collections

from iddiff.configs.default import get_default_configs


def get_config():
    config = get_default_configs()
    config.logging.log_path = "logs/gaussian_bubbles/"
    config.logging.log_name = "bubbles"
    config.logging.viz_frequency = 10

    config.training.batch_size = 512
    config.training.sde = "vesde"
    config.training.visualization_callback = [
        "FisherDivergence",
        "2DSamplesVisualization",
        "2DVectorFieldVisualization",
    ]

    config.data = data = ml_collections.ConfigDict()
    data.datamodule = "Synthetic"
    data.dataset_type = "GaussianBubbles"
    data.split = [0.8, 0.1, 0.1]
    data.data_samples = 20_000
    data.mixtures = 4
    data.std = 0.1
    data.return_labels = False
    data.use_data_mean = False
    data.shape = [2]

    config.model = model = ml_collections.ConfigDict()
    model.checkpoint_path = None
    model.sigma_max = 2.0
    model.sigma_min = 1e-2
    model.name = "fcn"
    model.state_size = 2
    model.hidden_layers = 3
    model.hidden_nodes = 256
    model.dropout = 0.0
    model.num_scales = 1000
    model.ema_rate = 0.999

    config.optim.lr = 1e-3
    config.optim.warmup = 500
    return config
