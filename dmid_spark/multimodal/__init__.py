from .binary_ops import (  # noqa: F401
    MEDIA_SCHEMA,
    decode_image,
    extract_features,
    frame_sample,
    resize_image,
    synth_media_table,
)
