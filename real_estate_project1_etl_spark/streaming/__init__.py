from .file_pipeline import start_file_pipeline  # noqa: F401
from .windows import (  # noqa: F401
    hourly_event_counts,
    sessionized_events,
    stateful_dedup,
)
