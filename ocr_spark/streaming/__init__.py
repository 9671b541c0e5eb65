from ocr_spark.streaming.extract_stream import (  # noqa: F401
    stream_event_counts,
    stream_extract,
)
