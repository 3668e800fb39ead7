from shmr_spark.multimodal.binary import (
    MEDIA_SCHEMA,
    IMAGE_FEATURE_SCHEMA,
    AUDIO_FEATURE_SCHEMA,
    attach_media_metadata,
    decode_and_featurize,
    featurize_audio,
    sample_frames,
)
from shmr_spark.multimodal.resize import resize_images

__all__ = [
    "MEDIA_SCHEMA",
    "IMAGE_FEATURE_SCHEMA",
    "AUDIO_FEATURE_SCHEMA",
    "attach_media_metadata",
    "decode_and_featurize",
    "featurize_audio",
    "resize_images",
    "sample_frames",
]
