from v3d_tpu.core.registry import register, resolve, instantiate
from v3d_tpu.core.config import ConfigDict, load_config, make_config

__all__ = [
    "register",
    "resolve",
    "instantiate",
    "ConfigDict",
    "load_config",
    "make_config",
]
