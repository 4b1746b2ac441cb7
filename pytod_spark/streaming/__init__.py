from .cusum import cusum_drift_stream  # noqa: F401
from .drift_monitor import drift_alerts, fit_reference_model, score_stream  # noqa: F401
