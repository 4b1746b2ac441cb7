from .engine import ValidationSuite, partition_fingerprints  # noqa: F401
from .constraints import (  # noqa: F401
    RowConstraint,
    row_constraint_summary,
    row_constraint_violations,
)
from .snapshot import (  # noqa: F401
    changed_partitions_between,
    snapshot_listing,
)
from .features import derive_features  # noqa: F401
from .report import run_report  # noqa: F401
from .schema import (  # noqa: F401
    CORPUS_CONTRACT,
    SchemaContractError,
    schema_violations,
)
