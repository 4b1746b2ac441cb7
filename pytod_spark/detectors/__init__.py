from .base import SparkDetector  # noqa: F401
from .knn import KNN  # noqa: F401
from .lof import LOF  # noqa: F401
from .ecod import ECOD  # noqa: F401
from .copod import COPOD  # noqa: F401
from .hbos import HBOS  # noqa: F401
from .pca import PCA  # noqa: F401
from .abod import ABOD  # noqa: F401

ALL_DETECTORS = {
    "knn": KNN,
    "lof": LOF,
    "ecod": ECOD,
    "copod": COPOD,
    "hbos": HBOS,
    "pca": PCA,
    "abod": ABOD,
}
