"""Plan layer: value mappers and harmonization-plan construction."""

from biomedical_data_integration_spark.plans.mappers import (
    DictionaryMapper,
    ExpressionValueMapper,
    FunctionValueMapper,
    IdentityValueMapper,
    ValueMapper,
)
from biomedical_data_integration_spark.plans.spec import (
    ColumnMappingSpec,
    create_mapper,
    materialize_mapping,
    merge_mappings,
)

__all__ = [
    "ColumnMappingSpec",
    "DictionaryMapper",
    "ExpressionValueMapper",
    "FunctionValueMapper",
    "IdentityValueMapper",
    "ValueMapper",
    "create_mapper",
    "materialize_mapping",
    "merge_mappings",
]
