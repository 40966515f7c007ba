"""Catalog parity with the reference (its test_install.py asserts the
24-entry catalog loads; config/ontologies.py:8-46)."""

from ontology_mapper_spark.config import DOMAIN_COMBINATIONS, ONTOLOGY_CATALOG
from ontology_mapper_spark.oracle.semantics import (
    BP_TO_OLS,
    SEARCH_STRATEGIES,
    convert_ontologies,
    search_strategy,
)


def test_catalog_size_and_core_entries():
    assert len(ONTOLOGY_CATALOG) == 24
    for acr in ("MONDO", "HP", "NCIT", "GO", "DOID", "CHEBI", "SYMP", "PRO"):
        assert acr in ONTOLOGY_CATALOG


def test_domain_combinations():
    assert len(DOMAIN_COMBINATIONS) == 7
    assert DOMAIN_COMBINATIONS["Disease Research"] == "MONDO,HP,DOID,NCIT,ORDO"
    # every acronym in a combination exists in the catalog
    for combo in DOMAIN_COMBINATIONS.values():
        for acr in combo.split(","):
            assert acr in ONTOLOGY_CATALOG, acr


def test_strategies_and_bp_ols_map():
    assert set(SEARCH_STRATEGIES) == {
        "Disease", "Symptom", "BiologicalProcess", "MolecularEntity",
        "Treatment", "long_covid", "fatigue", "immune_dysfunction",
    }
    assert search_strategy("nope", "My Label") == {
        "variants": ["My Label", "my label"], "ontologies": "MONDO,HP,NCIT"
    }
    assert len(BP_TO_OLS) == 8
    assert convert_ontologies("MONDO,HP,FOO") == "mondo,hp"
    assert convert_ontologies("go , chebi") == "go,chebi"
    assert convert_ontologies("UNKNOWN") == ""
