from vedb_gaze_spark.functions.core import (
    cents,
    cosine_similarity,
    portable_hash60,
    tsec,
)

__all__ = ["cents", "cosine_similarity", "portable_hash60", "tsec"]
