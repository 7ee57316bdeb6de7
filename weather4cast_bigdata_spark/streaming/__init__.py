from weather4cast_bigdata_spark.streaming.pipeline import (
    dedup_within_watermark,
    frame_stream,
    running_gram_stats,
    session_windows,
    sliding_sequence_windows,
    stateful_sequence_assembly,
)

__all__ = [
    "dedup_within_watermark",
    "frame_stream",
    "running_gram_stats",
    "session_windows",
    "sliding_sequence_windows",
    "stateful_sequence_assembly",
]
