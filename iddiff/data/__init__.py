from .registry import register_datamodule, get_datamodule, create_datamodule, DATAMODULES
from .datamodule import ArrayDataModule

# Register built-in datamodules.
from . import ksphere  # noqa: F401
from . import line  # noqa: F401
from . import mammoth  # noqa: F401
from . import synthetic  # noqa: F401
from . import gan  # noqa: F401
from . import image  # noqa: F401
from . import paired  # noqa: F401
from . import haar  # noqa: F401
from . import timeseries  # noqa: F401

__all__ = [
    "register_datamodule",
    "get_datamodule",
    "create_datamodule",
    "DATAMODULES",
    "ArrayDataModule",
]
