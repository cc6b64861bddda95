from v3d_tpu.utils.misc import append_dims, default, count_params

__all__ = ["append_dims", "default", "count_params"]
