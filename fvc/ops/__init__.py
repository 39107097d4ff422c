from fvc.ops.math import (
    lower_bound, upper_bound, quantize, quantize_ste, quantize_noise,
    laplace_interval_likelihood, gaussian_interval_likelihood,
    bits_from_likelihood, bits_from_log_likelihood, psnr, psnr_per_frame, mse,
)
from fvc.ops.conv import Conv, Deconv, conv2d, deconv2d_x2
from fvc.ops.resize import avg_pool2, bilinear_resize, upsample2x
from fvc.ops.warp import flow_warp, gaussian_volume, scale_space_warp, gaussian_blur
from fvc.ops.gdn import GDN
from fvc.ops.convlstm import ConvLSTM
from fvc.ops.blocks import ResBlock, WarpNet, motion_compensation
from fvc.ops.spynet import SpyNet, MEBasic, load_npy_weights
from fvc.ops.ms_ssim import ms_ssim, ms_ssim_db
