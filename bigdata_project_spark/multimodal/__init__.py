from bigdata_project_spark.multimodal.binary_ops import (
    decode_image_stub,
    extract_features_fake,
    frame_sample_fake,
    query_binary_meta,
    with_binary_payload,
    ORACLE_BINARY_META,
)

__all__ = [
    "decode_image_stub",
    "extract_features_fake",
    "frame_sample_fake",
    "query_binary_meta",
    "with_binary_payload",
    "ORACLE_BINARY_META",
]
