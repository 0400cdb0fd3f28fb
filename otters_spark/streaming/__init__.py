from .events import (
    run_windowed_stream,
    sessionize,
    stream_events,
    windowed_agg,
)
from .ingest import streaming_ingest_gate

__all__ = [
    "windowed_agg",
    "sessionize",
    "stream_events",
    "run_windowed_stream",
    "streaming_ingest_gate",
]
