from mars_spark.streaming.core import (
    read_stream,
    tumbling_agg,
    sliding_agg,
    session_agg,
    stream_dedup,
    stream_static_join,
    stream_stream_join,
    write_stream,
)

__all__ = ["read_stream", "tumbling_agg", "sliding_agg", "session_agg",
           "stream_dedup", "stream_static_join", "stream_stream_join",
           "write_stream"]
