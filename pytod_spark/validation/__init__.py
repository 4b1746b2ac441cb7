from .engine import ValidationSuite, partition_fingerprints  # noqa: F401
from .features import derive_features  # noqa: F401
from .schema import (  # noqa: F401
    CORPUS_CONTRACT,
    SchemaContractError,
    schema_violations,
)
