from fvc.models.registry import get_codec_model
from fvc.models.bitstream import LSVCBitstreamCodec, pack_streams, unpack_streams
from fvc.models.bitstream_dvc import DVCBitstreamCodec
from fvc.models.bitstream_rlvc import RLVCBitstreamCodec
from fvc.models.bitstream_ssf import SSFBitstreamCodec
from fvc.models.bitstream_elfvc import ELFVCBitstreamCodec
from fvc.models.bitstream_mcvc import MCVCBitstreamCodec
