from .containers import (  # noqa: F401
    mp3_metadata,
    mp4_metadata,
    probe_media,
)
from .media import (  # noqa: F401
    MEDIA_META_SCHEMA,
    MEDIA_SCHEMA,
    audio_features,
    byte_histogram_features,
    decode_media,
    frame_sample,
    resize_images,
    synthesize_media,
)
