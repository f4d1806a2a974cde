from addressit_spark.streaming.incremental import (  # noqa: F401
    incremental_er,
    running_block_counts,
    stream_documents,
    streaming_block_stats,
    streaming_exact_dedup,
    streaming_parse,
    streaming_session_stats,
)
