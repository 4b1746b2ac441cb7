"""Pure-numpy parity oracle.

Transliterates the *behavior* of the reference's tensor operators and
detectors (file:line citations inline) so the Spark engine can be
tested for score parity without torch/pyod (absent in this sandbox).
This package is test infrastructure AND the kernel library: the Spark
detectors call these same functions inside Arrow-vectorized UDFs, and
the independent SQL/DataFrame implementations are asserted against
them.
"""

from .operators import (  # noqa: F401
    bottomk,
    cdist,
    ecdf_multiple,
    get_batch_index,
    histt,
    intersec1d,
    intersecmulti,
    knn_full,
    standardizer,
    topk,
)
from .detectors import (  # noqa: F401
    abod_scores,
    ecod_scores,
    hbos_scores,
    knn_scores,
    lof_scores,
    pca_scores,
    process_decision_scores,
)
from .data import generate_data  # noqa: F401
