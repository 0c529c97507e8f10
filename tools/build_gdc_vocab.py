"""Build the bundled GDC vocabulary resource.

The Genomic Data Commons (GDC) data dictionary is public U.S. National
Cancer Institute data (https://gdc.cancer.gov/ — the dictionary is served
by the public GDC API and is in the public domain as a U.S. government
work). The reference distributes a flattened snapshot of it
(``bdikit/resource/gdc_schema.json``, produced from the raw dictionary by
``scripts/format_schema/format_gdc.py:14-31``): a JSON object mapping each
clinical attribute to ``{"column_description": str, "value_data":
{value: description}}``.

This script ingests any GDC-format snapshot, validates its shape, and
re-serializes a normalized copy (sorted keys, compact separators, NFC
strings) into the package's ``resources/`` directory so the ``"gdc"``
standard resolves to the real 700+-column vocabulary instead of a demo.

Usage::

    python tools/build_gdc_vocab.py [SRC_JSON] [DST_JSON]

Defaults: SRC = the public snapshot bundled with the reference checkout
(if present), DST = biomedical_data_integration_spark/resources/gdc_schema.json.
"""

from __future__ import annotations

import json
import os
import sys
import unicodedata

DEFAULT_SRC = "/root/reference/bdikit/resource/gdc_schema.json"
DEFAULT_DST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "biomedical_data_integration_spark",
    "resources",
    "gdc_schema.json",
)


def normalize(raw: dict) -> dict:
    """Validate + normalize a GDC-format vocabulary snapshot."""
    out = {}
    for col in sorted(raw):
        entry = raw[col]
        if not isinstance(entry, dict):
            raise ValueError(f"column {col!r}: expected object, got {type(entry)}")
        desc = entry.get("column_description", "") or ""
        values = entry.get("value_data", {}) or {}
        if not isinstance(values, dict):
            raise ValueError(f"column {col!r}: value_data must be an object")
        out[unicodedata.normalize("NFC", col)] = {
            "column_description": unicodedata.normalize("NFC", str(desc)),
            "value_data": {
                unicodedata.normalize("NFC", str(v)): unicodedata.normalize(
                    "NFC", str(d) if d is not None else ""
                )
                for v, d in values.items()
            },
        }
    return out


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SRC
    dst = sys.argv[2] if len(sys.argv) > 2 else DEFAULT_DST
    if not os.path.exists(src):
        print(f"source snapshot not found: {src}", file=sys.stderr)
        return 1
    with open(src) as f:
        raw = json.load(f)
    vocab = normalize(raw)
    n_cols = len(vocab)
    n_domains = sum(1 for v in vocab.values() if v["value_data"])
    largest = max((len(v["value_data"]) for v in vocab.values()), default=0)
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    with open(dst, "w") as f:
        json.dump(vocab, f, sort_keys=True, separators=(",", ":"), ensure_ascii=True)
    print(
        f"wrote {dst}: {n_cols} columns, {n_domains} enumerated domains, "
        f"largest domain {largest} values"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
