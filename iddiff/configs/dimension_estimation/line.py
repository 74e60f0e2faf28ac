"""Line dataset (ID=1 curve in R^100) — mirrors the reference's line setup
(/root/reference/lightning_data_modules/LineDataset.py:24-38 with fcn + VESDE)."""

from iddiff.configs.dimension_estimation.ksphere import ksphere_config


def get_config():
    config = ksphere_config(manifold_dim=1, ambient_dim=100)
    config.logging.log_path = "logs/line/"
    config.logging.log_name = "line"
    config.data.datamodule = "Line"
    config.data.data_samples = 10_000
    config.training.visualization_callback = ["ScoreSpectrumVisualization"]
    return config
