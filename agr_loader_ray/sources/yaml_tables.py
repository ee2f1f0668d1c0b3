"""YAML lookup-table source — SURVEY S12.

The reference ingests ``species.yaml`` — a list of stanzas with nested
``primaryDataProvider`` dicts and ``commonNames`` lists — flattening it
into a species table and an exploded synonyms table
(``/root/reference/src/etl/species_etl.py:70-94``).  YAML files are
configuration-sized (driver-side parse, broadcast downstream); the
Ray-side surface is ``ray.data.from_arrow`` over the flattened tables.
"""

from __future__ import annotations

import pyarrow as pa

try:
    import yaml
except ImportError:  # pragma: no cover - container ships PyYAML
    yaml = None


def load_yaml_stanzas(path: str) -> list[dict]:
    if yaml is None:  # pragma: no cover
        raise NotImplementedError("PyYAML unavailable in this environment")
    with open(path, encoding="utf-8") as fh:
        return yaml.load(fh, Loader=yaml.SafeLoader) or []


def species_tables(path: str) -> tuple[pa.Table, pa.Table]:
    """(species, synonyms) — the reference's two generator outputs
    (species_etl.py:72-93): nested provider dict flattened, commonNames
    exploded one synonym row per name."""
    stanzas = load_yaml_stanzas(path)
    species_rows, synonym_rows = [], []
    for st in stanzas:
        provider = st.get("primaryDataProvider") or {}
        names = st.get("commonNames") or []
        species_rows.append({
            "taxonId": st.get("taxonId"),
            "name": st.get("fullName"),
            "shortName": st.get("shortName"),
            "commonNames": list(names),
            "dataProviderFullName": provider.get("dataProviderFullName"),
            "dataProviderShortName": provider.get("dataProviderShortName"),
            "phylogeneticOrder": st.get("phylogenicOrder"),
        })
        synonym_rows.extend(
            {"taxonId": st.get("taxonId"), "synonym": n} for n in names
        )
    species = pa.Table.from_pylist(species_rows) if species_rows else pa.table({})
    synonyms = pa.Table.from_pylist(synonym_rows) if synonym_rows else pa.table({})
    return species, synonyms
