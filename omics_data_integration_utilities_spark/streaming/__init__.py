from .events import windowed_event_counts_stream, tumbling_event_agg  # noqa: F401
from .profile import (  # noqa: F401
    drift_flags,
    windowed_profile_agg,
    windowed_profile_stream,
)
