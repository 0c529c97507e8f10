"""Standard vocabularies (target schemas for harmonization).

The reference's ``BaseStandard`` contract (``bdikit/standards/base.py:5-20``)
exposes per-column metadata and enumerated value domains; its only
implementation is GDC, a 2.6 MB JSON loaded eagerly and pivoted into a
736-column-wide padded DataFrame (``bdikit/standards/gdc.py:16-69``).

The Spark-native model keeps the vocabulary LONG-FORM —
``(column_name, column_description, value, value_description)`` — because
joins and explodes beat a wide padded table, and the long table broadcasts
(driver-sized). The wide form is synthesized only at matcher boundaries
(some schema matchers want a table-shaped target).

Registry mirrors ``standards/standard_factory.py:7-28``: resolve by name,
helpful error listing valid names. A built-in demo vocabulary covering the
reference's test surface (ethnicity/race/figo_stage/...) ships in-code;
arbitrary GDC-format JSON files load via ``JsonStandard``.
"""

from __future__ import annotations

import json
import os
import weakref
from typing import Dict, List, Mapping, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

LONG_FORM_SCHEMA = StructType(
    [
        StructField("column_name", StringType()),
        StructField("column_description", StringType()),
        StructField("value", StringType()),
        StructField("value_description", StringType()),
    ]
)


class Standard:
    """A target vocabulary: column metadata + enumerated value domains."""

    def get_columns(self) -> List[str]:
        raise NotImplementedError

    def get_column_metadata(self, column_names: List[str]) -> Dict[str, Dict]:
        raise NotImplementedError

    def get_column_values(self, column_names: List[str]) -> Dict[str, List[str]]:
        meta = self.get_column_metadata(column_names)
        return {name: m.get("value_names", []) for name, m in meta.items()}

    def to_long_df(self, spark: SparkSession) -> DataFrame:
        """Long-form vocabulary table; broadcast-sized by construction."""
        rows = []
        meta = self.get_column_metadata(self.get_columns())
        for col in self.get_columns():
            m = meta[col]
            desc = m.get("description", "")
            values = m.get("value_names", [])
            value_descs = m.get("value_descriptions", [""] * len(values))
            if not values:
                rows.append((col, desc, None, None))
            else:
                for v, vd in zip(values, value_descs):
                    rows.append((col, desc, v, vd))
        return spark.createDataFrame(rows, LONG_FORM_SCHEMA)

    def to_wide_df(self, spark: SparkSession) -> DataFrame:
        """Wide table: one column per vocabulary attribute, rows = values
        padded with nulls (``standards/gdc.py:58-69`` shape). Only for
        matcher boundaries that require a table-shaped target — domains are
        vocabulary-sized, so this stays driver-safe.

        The DataFrame is memoized per (standard, session) so repeated
        resolutions skip the pandas->Arrow conversion. It is deliberately
        NOT ``persist()``-ed: Spark's columnar cache allocates per-COLUMN
        builder buffers per task, and at 736 columns x n_tasks that
        overruns a default-sized executor heap (measured OOM); matchers
        that need repeated scans persist their own NARROW long form
        instead."""
        import pandas as pd

        # Keyed on a weakref to the session, not id(): after a stopped
        # session is garbage-collected CPython can reuse the same id for a
        # new session, which would return a DataFrame bound to the dead one.
        cache = getattr(self, "_wide_cache", None)
        if cache is not None and cache[0]() is spark:
            return cache[1]

        values = self.get_column_values(self.get_columns())
        max_len = max((len(v) for v in values.values()), default=0) or 1
        # Column-oriented pandas + Arrow beats a list of row tuples by ~100×
        # at real vocabulary size (GDC: 736 cols × 4,478 padded rows).
        pdf = pd.DataFrame(
            {
                c: pd.Series(list(v) + [None] * (max_len - len(v)), dtype="object")
                for c, v in values.items()
            }
        )
        schema = StructType([StructField(c, StringType()) for c in values])
        wide = spark.createDataFrame(pdf, schema)
        # Tag the frame with its backing standard: matchers that only need
        # the (column, value) long form can then read it straight from the
        # vocabulary (a narrow driver-built table) instead of unpivoting a
        # 736-column local relation — measured 25x cheaper on GDC. The tag
        # rides only this exact object (projections drop it), which is safe:
        # consumers fall back to the generic unpivot.
        wide._bdi_standard = self
        self._wide_cache = (weakref.ref(spark), wide)
        return wide


def standard_of(df: DataFrame) -> Optional["Standard"]:
    """The Standard backing ``df`` if it came from :meth:`Standard.to_wide_df`
    (see the tag set there), else None."""
    std = getattr(df, "_bdi_standard", None)
    return std if isinstance(std, Standard) else None


def long_values_of(df: DataFrame) -> Optional[DataFrame]:
    """Fast (column_name, value) long form for a standard-backed wide frame:
    reads the vocabulary directly (narrow, driver-built) instead of
    unpivoting the wide local relation. Returns None when ``df`` has no
    backing standard. Row multiset is identical to
    ``unpivot(wide) WHERE value IS NOT NULL`` — one row per domain entry,
    no-domain columns absent."""
    std = standard_of(df)
    if std is None:
        return None
    return (
        std.to_long_df(df.sparkSession)
        .where(F.col("value").isNotNull())
        .select("column_name", "value")
    )


class DictStandard(Standard):
    """Standard backed by an in-memory dict:
    ``{column: {"description": str, "values": {value: value_desc}}}``."""

    def __init__(self, spec: Mapping[str, Mapping]):
        self._spec = {k: dict(v) for k, v in spec.items()}

    def get_columns(self) -> List[str]:
        return list(self._spec.keys())

    def get_column_metadata(self, column_names: List[str]) -> Dict[str, Dict]:
        out: Dict[str, Dict] = {}
        for name in column_names:
            entry = self._spec.get(name)
            if entry is None:
                continue
            values = entry.get("values", {}) or {}
            out[name] = {
                "description": entry.get("description", ""),
                "value_names": list(values.keys()),
                "value_descriptions": list(values.values()),
            }
        return out


class JsonStandard(DictStandard):
    """GDC-format JSON file:
    ``{column: {column_description, value_data: {value: description}}}``
    (shape produced by ``scripts/format_schema/format_gdc.py:14-31``)."""

    def __init__(self, path: str):
        with open(path) as f:
            raw = json.load(f)
        spec = {
            col: {
                "description": entry.get("column_description", ""),
                "values": entry.get("value_data", {}) or {},
            }
            for col, entry in raw.items()
        }
        super().__init__(spec)


class DataFrameStandard(Standard):
    """Standard backed by a long-form DataFrame (column_name,
    column_description, value, value_description)."""

    def __init__(self, df: DataFrame):
        self._df = df
        self._cache: Optional[Dict[str, Dict]] = None

    def _load(self) -> Dict[str, Dict]:
        if self._cache is None:
            rows = self._df.collect()  # vocabulary tables are driver-sized
            spec: Dict[str, Dict] = {}
            for r in rows:
                entry = spec.setdefault(
                    r["column_name"],
                    {"description": r["column_description"] or "", "values": {}},
                )
                if r["value"] is not None:
                    entry["values"][r["value"]] = r["value_description"] or ""
            self._cache = spec
        return self._cache

    def get_columns(self) -> List[str]:
        return list(self._load().keys())

    def get_column_metadata(self, column_names: List[str]) -> Dict[str, Dict]:
        spec = self._load()
        out: Dict[str, Dict] = {}
        for name in column_names:
            if name not in spec:
                continue
            values = spec[name]["values"]
            out[name] = {
                "description": spec[name]["description"],
                "value_names": list(values.keys()),
                "value_descriptions": list(values.values()),
            }
        return out


# A hand-written demo vocabulary with the GDC shape and the attribute names
# exercised by the reference's tests (``tests/test_api.py:31-64``:
# Ethnicity->ethnicity, FIGO_stage->figo_stage). Values are the public GDC
# permissible values for these fields. Includes the FIXTURES.md F5
# requirements: a column with values+description, one with description but
# no domain, one with neither.
_BIOMEDICAL_DEMO = {
    "ethnicity": {
        "description": "An individual's self-described social and cultural "
        "grouping related to Hispanic or Latino origin.",
        "values": {
            "hispanic or latino": "A person of Cuban, Mexican, Puerto Rican, "
            "South or Central American, or other Spanish culture or origin.",
            "not hispanic or latino": "A person not of Hispanic or Latino origin.",
            "not reported": "Not provided or available.",
            "unknown": "Could not be determined.",
            "not allowed to collect": "Collection prohibited by regulation.",
        },
    },
    "race": {
        "description": "An arbitrary classification of a taxonomic group "
        "that is a division of a species.",
        "values": {
            "white": "",
            "black or african american": "",
            "asian": "",
            "american indian or alaska native": "",
            "native hawaiian or other pacific islander": "",
            "other": "",
            "not reported": "",
            "unknown": "",
        },
    },
    "gender": {
        "description": "Text designations that identify gender.",
        "values": {
            "female": "",
            "male": "",
            "unspecified": "",
            "unknown": "",
            "not reported": "",
        },
    },
    "figo_stage": {
        "description": "The FIGO stage of the cancer.",
        "values": {
            "Stage 0": "",
            "Stage I": "",
            "Stage IA": "",
            "Stage IA1": "",
            "Stage IA2": "",
            "Stage IB": "",
            "Stage IB1": "",
            "Stage IB2": "",
            "Stage IC": "",
            "Stage II": "",
            "Stage IIA": "",
            "Stage IIB": "",
            "Stage III": "",
            "Stage IIIA": "",
            "Stage IIIB": "",
            "Stage IIIC": "",
            "Stage IV": "",
            "Stage IVA": "",
            "Stage IVB": "",
            "Unknown": "",
            "Not Reported": "",
        },
    },
    "tumor_grade": {
        "description": "Numeric value to express the degree of abnormality "
        "of cancer cells.",
        "values": {
            "G1": "",
            "G2": "",
            "G3": "",
            "G4": "",
            "GX": "",
            "GB": "",
            "High Grade": "",
            "Low Grade": "",
            "Unknown": "",
            "Not Reported": "",
        },
    },
    # description but empty domain (like GDC age_at_diagnosis,
    # tests/test_api.py:420-428)
    "age_at_diagnosis": {
        "description": "Age at the time of diagnosis expressed in number of "
        "days since birth.",
        "values": {},
    },
    # neither description nor domain
    "sample_id": {"description": "", "values": {}},
}

_REGISTRY: Dict[str, object] = {}  # name -> Standard | zero-arg factory


def register_standard(name: str, standard) -> None:
    """Register a Standard instance OR a zero-arg factory returning one.

    Factories defer expensive loads (the bundled GDC vocabulary is a
    2.3 MB JSON) until a standard is actually requested; the built
    instance replaces the factory on first resolution.
    """
    _REGISTRY[name.lower()] = standard


def get_standard(name: str) -> Standard:
    """Resolve a standard by name (``standards/standard_factory.py:14-28``)."""
    key = name.lower()
    if key not in _REGISTRY:
        raise ValueError(
            f"The {name!r} standard is not supported. "
            f"Supported standards are: {sorted(_REGISTRY)}"
        )
    entry = _REGISTRY[key]
    if not isinstance(entry, Standard):
        entry = entry()
        _REGISTRY[key] = entry
    return entry


# Path of the bundled GDC vocabulary: the public NCI Genomic Data Commons
# data dictionary (U.S. government public-domain data), flattened to the
# GDC-format shape consumed by ``JsonStandard`` (same format the reference
# produces via ``scripts/format_schema/format_gdc.py:14-31``) and rebuilt
# by ``tools/build_gdc_vocab.py``. 736 columns, 353 enumerated domains,
# largest domain 4,478 values.
GDC_RESOURCE_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "resources",
    "gdc_schema.json",
)


def _load_gdc() -> Standard:
    if os.path.exists(GDC_RESOURCE_PATH):
        return JsonStandard(GDC_RESOURCE_PATH)
    # Resource missing (stripped checkout): degrade to the demo vocabulary
    # so ``match_schema(df)`` still resolves its default target.
    return DictStandard(_BIOMEDICAL_DEMO)


register_standard("biomedical_demo", DictStandard(_BIOMEDICAL_DEMO))
# The reference defaults to "gdc" (``bdikit/api.py:45``); resolve it to the
# bundled full vocabulary, lazily (first use pays the JSON parse once).
register_standard("gdc", _load_gdc)
