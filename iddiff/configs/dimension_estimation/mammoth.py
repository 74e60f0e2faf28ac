"""Mammoth point cloud (ID=2) embedded in R^100 — mirrors
/root/reference/configs/dimension_estimation/extra_experiments/mammoth/vesde.py."""

from iddiff.configs.dimension_estimation.ksphere import ksphere_config


def get_config():
    config = ksphere_config(manifold_dim=2, ambient_dim=100)
    config.logging.log_path = "logs/mammoth/"
    config.logging.log_name = "mammoth"
    config.data.datamodule = "Mammoth"
    config.data.embedding_type = "random_isometry"
    config.data.mammoth_path = None  # set to mammoth.json if available
    config.training.visualization_callback = ["ScoreSpectrumVisualization"]
    return config
