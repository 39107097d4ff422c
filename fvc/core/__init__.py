from fvc.core.config import CodecConfig, PSNR_LAMBDAS, MSSSIM_LAMBDAS, I_LEVELS
from fvc.core.policy import bf16_compute, compute_in, compute_dtype, pallas_gdn
