from .constraints import streaming_constraint_split  # noqa: F401
from .cusum import cusum_drift_stream  # noqa: F401
from .dedup import streaming_exact_dedup, streaming_seen_filter  # noqa: F401
from .drift_monitor import drift_alerts, fit_reference_model, score_stream  # noqa: F401
