"""biomedical_data_integration_spark — a PySpark-native data-harmonization
and pipeline-processing engine.

A from-scratch, Spark-first engine with the query/data-processing
capabilities of VIDA-NYU/biomedical-data-integration (bdi-kit; reference
at /root/reference, surveyed in SURVEY.md): schema matching, value
matching, mapper-based materialization, standard vocabularies — plus the
large-scale training-data pipeline operators (deduplication, similarity
search, text analysis, multimodal plumbing) every operator designed for
100 TB inputs on a real cluster.
"""

from biomedical_data_integration_spark.api import (
    match_schema,
    match_values,
    materialize_mapping,
    merge_mappings,
    create_mapper,
    preview_domain,
    split_value_matches,
    top_matches,
    top_value_matches,
    ValueMatchEditor,
    view_value_matches,
)
from biomedical_data_integration_spark.plans.mappers import (
    DictionaryMapper,
    ExpressionValueMapper,
    FunctionValueMapper,
    IdentityValueMapper,
    ValueMapper,
)
from biomedical_data_integration_spark.plans.inspect import (
    assert_scalable,
    plan_summary,
)
from biomedical_data_integration_spark.plans.persist import (
    load_plan,
    plan_from_json,
    plan_to_json,
    save_plan,
)
from biomedical_data_integration_spark.session import get_spark
from biomedical_data_integration_spark.sources.standards import (
    DataFrameStandard,
    DictStandard,
    JsonStandard,
    Standard,
    get_standard,
    register_standard,
)

__version__ = "0.1.0"

__all__ = [
    "DataFrameStandard",
    "DictStandard",
    "DictionaryMapper",
    "ExpressionValueMapper",
    "FunctionValueMapper",
    "IdentityValueMapper",
    "JsonStandard",
    "Standard",
    "ValueMapper",
    "create_mapper",
    "get_spark",
    "get_standard",
    "match_schema",
    "match_values",
    "materialize_mapping",
    "merge_mappings",
    "preview_domain",
    "register_standard",
    "split_value_matches",
    "top_matches",
    "top_value_matches",
    "ValueMatchEditor",
    "view_value_matches",
]
