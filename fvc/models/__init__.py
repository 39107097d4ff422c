from fvc.models.registry import get_codec_model
