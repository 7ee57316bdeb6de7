from weather4cast_bigdata_spark.streaming.pipeline import (
    frame_stream,
    running_gram_stats,
    sliding_sequence_windows,
    stateful_sequence_assembly,
)

__all__ = [
    "frame_stream",
    "running_gram_stats",
    "sliding_sequence_windows",
    "stateful_sequence_assembly",
]
