from v3d_tpu.gs.losses import psnr, ssim  # shared implementations

__all__ = ["psnr", "ssim"]
