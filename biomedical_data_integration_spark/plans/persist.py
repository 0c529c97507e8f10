"""Harmonization-plan persistence: save/load a normalized mapping spec as
JSON so a reviewed plan can be versioned, diffed, and replayed on later
data drops without re-running the matchers.

The reference keeps its plan (``List[ColumnMappingSpec]``,
``bdikit/api.py:555-558``) purely in memory; persistence is an engine
extension the production workflow needs (plans are the REVIEWED artifact —
schema/value matching proposes, a human approves, materialization replays).

Serializable mappers: Identity, Dictionary, Expression. FunctionValueMapper
wraps an arbitrary Python callable and is rejected with a clear error —
closures don't round-trip through JSON; use ExpressionValueMapper for
portable logic.
"""

from __future__ import annotations

import json
from typing import List

from biomedical_data_integration_spark.plans.mappers import (
    DictionaryMapper,
    ExpressionValueMapper,
    FunctionValueMapper,
    IdentityValueMapper,
    ValueMapper,
)
from biomedical_data_integration_spark.plans.spec import (
    ColumnMappingSpec,
    MappingSpecLike,
    _normalize_mapping_spec,
)

PLAN_FORMAT_VERSION = 1


def plan_to_json(spec: MappingSpecLike) -> str:
    """Serialize a mapping spec (any `MappingSpecLike` accepted by
    materialize_mapping) to a stable, diff-friendly JSON string."""
    entries = []
    for e in _normalize_mapping_spec(spec):
        mapper = e.get("mapper") or IdentityValueMapper()
        if isinstance(mapper, IdentityValueMapper):
            m = {"type": "identity"}
        elif isinstance(mapper, DictionaryMapper):
            m = {
                "type": "dictionary",
                # JSON objects key on strings; values kept as-is
                "entries": {str(k): v for k, v in mapper.dictionary.items()},
            }
        elif isinstance(mapper, ExpressionValueMapper):
            m = {"type": "expression", "expression": mapper.expression}
        elif isinstance(mapper, FunctionValueMapper):
            raise ValueError(
                "FunctionValueMapper wraps an arbitrary Python callable and "
                "cannot be serialized; use ExpressionValueMapper instead"
            )
        else:
            raise ValueError(f"Unserializable mapper type: {type(mapper).__name__}")
        entries.append({"source": e["source"], "target": e["target"], "mapper": m})
    return json.dumps(
        {"version": PLAN_FORMAT_VERSION, "mappings": entries},
        indent=2,
        sort_keys=True,
    )


def plan_from_json(text: str) -> List[ColumnMappingSpec]:
    """Inverse of :func:`plan_to_json`; the result feeds
    ``materialize_mapping`` / ``merge_mappings`` directly."""
    doc = json.loads(text)
    version = doc.get("version")
    if version != PLAN_FORMAT_VERSION:
        raise ValueError(
            f"Unsupported plan format version: {version!r} "
            f"(expected {PLAN_FORMAT_VERSION})"
        )
    out: List[ColumnMappingSpec] = []
    for e in doc["mappings"]:
        m = e["mapper"]
        kind = m.get("type")
        mapper: ValueMapper
        if kind == "identity":
            mapper = IdentityValueMapper()
        elif kind == "dictionary":
            mapper = DictionaryMapper(dict(m["entries"]))
        elif kind == "expression":
            mapper = ExpressionValueMapper(m["expression"])
        else:
            raise ValueError(f"Unknown mapper type in plan: {kind!r}")
        out.append({"source": e["source"], "target": e["target"], "mapper": mapper})
    return out


def save_plan(spec: MappingSpecLike, path: str) -> None:
    """Write the plan JSON to a local path (driver-side artifact — plans
    are kilobytes; ship them with the code, not the data)."""
    with open(path, "w", encoding="utf-8") as f:
        f.write(plan_to_json(spec))


def load_plan(path: str) -> List[ColumnMappingSpec]:
    with open(path, "r", encoding="utf-8") as f:
        return plan_from_json(f.read())
