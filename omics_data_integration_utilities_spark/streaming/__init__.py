from .events import windowed_event_counts_stream, tumbling_event_agg  # noqa: F401
