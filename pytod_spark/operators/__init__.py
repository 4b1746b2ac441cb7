from .block_knn import knn_join, knn_scores_df  # noqa: F401
from .range_join import neighbor_within_range  # noqa: F401
from .thresholds import add_threshold_labels  # noqa: F401
