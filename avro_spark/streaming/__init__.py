"""avro_spark.streaming — Structured Streaming extensions (see pipeline)."""

from ..sources.avro_ocf import read_avro_stream  # noqa: F401
from .pipeline import (  # noqa: F401
    run_to_memory,
    running_totals,
    sessionized_counts,
    stream_dedup,
    stream_source,
    stream_transform,
    windowed_counts,
)
