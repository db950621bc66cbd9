from adhesive_spark.streaming.ops import (
    sessionized_counts,
    stream_dedup,
    tumbling_counts,
)

__all__ = ["tumbling_counts", "sessionized_counts", "stream_dedup"]
