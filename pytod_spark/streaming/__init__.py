from .constraints import streaming_constraint_split  # noqa: F401
from .cusum import cusum_drift_stream  # noqa: F401
from .dedup import (  # noqa: F401
    neardup_ingest_batch,
    streaming_exact_dedup,
    streaming_neardup_candidates,
    streaming_neardup_ingest,
    streaming_seen_filter,
)
from .drift_monitor import (  # noqa: F401
    drift_alerts,
    fit_reference_model,
    load_reference_model,
    save_reference_model,
    score_stream,
)
