"""dsci_524_g26_data_validation_spark — a from-scratch PySpark-native
data-contract validation engine with the capabilities of
UBC-MDS/DSCI_524_G26_Data_Validation (``pyos_data_validation``), rebuilt
Spark-first for Iceberg tables of pre-tokenized sequences at 10^12-row
scale (BASELINE.json north rule).

Public API mirrors the reference's four entry points plus the engine-level
checks; see SURVEY.md §2 for the operator inventory.
"""

from .types import (
    ColumnRule,
    Contract,
    ContractViolationError,
    DriftReport,
    ForeignKeyRule,
    Histogram,
    Issue,
    Summary,
    TableContract,
    ValidationResult,
    contract_from_dict,
    contract_from_json,
    contract_to_dict,
    contract_to_json,
    dtypes_equivalent,
    normalize_dtype,
)
from .operators.infer import infer_contract
from .operators.validate import (
    partition_verdicts,
    validate_and_fail,
    validate_contract,
    violation_rows,
)
from .operators.compare import compare_contracts
from .operators.summarize import summarize_violations, summarize_violations_df

__version__ = "0.1.0"

__all__ = [
    "ColumnRule",
    "Contract",
    "ContractViolationError",
    "DriftReport",
    "ForeignKeyRule",
    "Histogram",
    "Issue",
    "Summary",
    "TableContract",
    "ValidationResult",
    "contract_from_dict",
    "contract_from_json",
    "contract_to_dict",
    "contract_to_json",
    "dtypes_equivalent",
    "normalize_dtype",
    "infer_contract",
    "validate_contract",
    "validate_and_fail",
    "violation_rows",
    "partition_verdicts",
    "compare_contracts",
    "summarize_violations",
    "summarize_violations_df",
]
