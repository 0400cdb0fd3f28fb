from .events import (
    run_windowed_stream,
    sessionize,
    stream_events,
    windowed_agg,
)
from .drift import (
    run_windowed_drift_stream,
    windowed_bin_counts,
    windowed_psi,
)
from .ingest import (
    maintained_join_view,
    streaming_component_maintenance,
    streaming_ingest_gate,
    streaming_maintained_aggregate,
    streaming_maintained_join,
)
from .lag import lag_report, streaming_lag_monitor
from .sketch import (
    run_windowed_distinct_stream,
    windowed_distinct_counts,
    windowed_distinct_registers,
)

__all__ = [
    "windowed_agg",
    "sessionize",
    "stream_events",
    "run_windowed_stream",
    "lag_report",
    "maintained_join_view",
    "streaming_component_maintenance",
    "streaming_ingest_gate",
    "streaming_lag_monitor",
    "streaming_maintained_aggregate",
    "streaming_maintained_join",
    "windowed_distinct_registers",
    "windowed_distinct_counts",
    "run_windowed_distinct_stream",
    "windowed_bin_counts",
    "windowed_psi",
    "run_windowed_drift_stream",
]
