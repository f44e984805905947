from . import codecs  # noqa: F401
from . import jpeg  # noqa: F401
from .binary_ops import (  # noqa: F401
    MEDIA_SCHEMA,
    audio_features,
    decode_audio,
    decode_image,
    extract_features,
    frame_sample,
    resize_image,
    synth_media_table,
)
