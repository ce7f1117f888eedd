from lakehouse_adventureworks2022_spark.streaming.dedup import (  # noqa: F401
    dedup_batch,
    stream_dedup,
)
from lakehouse_adventureworks2022_spark.streaming.events import (  # noqa: F401
    session_windows_batch,
    sliding_windows_batch,
    stream_events_source,
    stream_tumbling_counts,
)
