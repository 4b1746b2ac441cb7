from .engine import ValidationSuite  # noqa: F401
from .features import derive_features  # noqa: F401
