from fvc.entropy.bitparm import BitEstimator, Bitparm
from fvc.entropy.bottleneck import EntropyBottleneck
from fvc.entropy.gaussian import (
    gaussian_conditional, laplace_conditional_bits, build_indexes,
    scale_table, gaussian_cdf_tables,
)
from fvc.entropy.rpm import RPM, rpm_scale
from fvc.entropy.hyperprior import MeanScaleHyperprior, SSFHyperprior, SPnet
from fvc.entropy.coder import (
    RansCoder, pmf_to_quantized_cdf,
    encode_factorized, decode_factorized, encode_gaussian, decode_gaussian,
)
