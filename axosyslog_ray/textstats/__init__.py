"""Text analysis stages for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting."""

from .analysis import (  # noqa: F401
    LangId,
    fingerprint_fast,
    fingerprint_md5,
    normalize_text,
    quality_features,
    rolling_fingerprints,
    token_counts,
)
