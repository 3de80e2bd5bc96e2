from .events import (
    read_events_stream,
    run_available_now,
    sessionize_stateful,
    windowed_rollup,
)

__all__ = [
    "read_events_stream",
    "run_available_now",
    "sessionize_stateful",
    "windowed_rollup",
]
