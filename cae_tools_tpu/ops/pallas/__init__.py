from .msssim_kernel import ssim_pallas, msssim_pallas  # noqa: F401
