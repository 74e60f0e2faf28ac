"""Score-model registry (mirrors /root/reference/models/utils.py:24-47,114-120)."""
from iddiff.utils import Registry

MODELS = Registry("model")

register_model = MODELS.register
get_model = MODELS.get


def create_model(config):
    """Instantiate the Flax module named by `config.model.name`."""
    return get_model(config.model.name)(config)
