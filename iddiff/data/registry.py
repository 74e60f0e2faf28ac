"""Datamodule registry (mirrors /root/reference/lightning_data_modules/utils.py:6-30)."""
from iddiff.utils import Registry

DATAMODULES = Registry("datamodule")

register_datamodule = DATAMODULES.register
get_datamodule = DATAMODULES.get


def create_datamodule(config):
    return get_datamodule(config.data.datamodule)(config)
