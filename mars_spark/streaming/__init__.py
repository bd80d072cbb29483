from mars_spark.streaming.core import (
    read_stream,
    stage_chunked_delivery,
    tumbling_agg,
    sliding_agg,
    session_agg,
    stream_dedup,
    stream_incremental_dedup,
    stream_minhash_dedup,
    stream_semantic_dedup,
    stream_static_join,
    stream_stream_join,
    write_stream,
)
from mars_spark.streaming.stateful import (
    emit_on_close_totals,
    heavy_hitters,
    running_totals,
    streaming_quantile,
)

__all__ = ["read_stream", "stage_chunked_delivery",
           "tumbling_agg", "sliding_agg", "session_agg",
           "stream_dedup", "stream_incremental_dedup",
           "stream_minhash_dedup", "stream_semantic_dedup",
           "stream_static_join", "stream_stream_join",
           "write_stream", "running_totals", "emit_on_close_totals",
           "heavy_hitters", "streaming_quantile"]
