from .dedup import (  # noqa: F401
    dedup_batch_twin,
    dedup_stream,
)
from .windows import (  # noqa: F401
    stream_events,
    sessionize_stream,
    tumbling_counts_stream,
    run_stream_to_memory,
)
from .sketch import (  # noqa: F401
    windowed_distinct_stream,
    windowed_heavy_hitters_stream,
)
