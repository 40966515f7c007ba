"""Golden tests for the pure-Python oracle — these encode the reference's
observable behavior (style mirrors /root/reference/test_cache.py)."""

from ontology_mapper_spark.oracle import semantics as S


class TestCleanDescription:
    def test_empty(self):
        assert S.clean_description("") == ""
        assert S.clean_description(None) == ""

    def test_whitespace_squeeze(self):
        assert S.clean_description("  a   b\t\nc  ") == "A b c"

    def test_single_prefix_strip_with_break(self):
        # Only the FIRST matching prefix is stripped (helpers.py:26 break)
        assert S.clean_description("The A cat") == "A cat"
        assert S.clean_description("A The cat") == "The cat"
        assert S.clean_description("An apple") == "Apple"
        assert S.clean_description("This is an apple") == "Apple"
        assert S.clean_description("Definition: a term") == "A term"

    def test_capitalize(self):
        assert S.clean_description("cardiac disease") == "Cardiac disease"

    def test_truncation(self):
        long = "x" * 300
        out = S.clean_description(long)
        assert len(out) == 200 and out.endswith("...")
        assert out[:197] == "X" + "x" * 196

    def test_exactly_200_not_truncated(self):
        assert S.clean_description("x" * 200) == "X" + "x" * 199


class TestDedupeSynonyms:
    def test_empty(self):
        assert S.dedupe_synonyms(None, set()) == []
        assert S.dedupe_synonyms([], set()) == []

    def test_first_occurrence_wins_then_sorted(self):
        syns = ["Fatigue", "fatigue ", "tiredness", "exhaustion", "  "]
        out = S.dedupe_synonyms(syns, set())
        # 'Fatigue' kept (first form), sorted by (len, lower)
        assert out == ["Fatigue", "tiredness", "exhaustion"]

    def test_existing_labels_excluded(self):
        assert S.dedupe_synonyms(["Fatigue", "tiredness"], {"fatigue"}) == ["tiredness"]

    def test_short_dropped(self):
        assert S.dedupe_synonyms(["ab", "abc"], set()) == ["abc"]

    def test_sort_key(self):
        assert S.dedupe_synonyms(["bbb", "AAA", "cc "], set()) == ["AAA", "bbb"]


class TestAlignmentType:
    def test_exact_label(self):
        assert S.alignment_type("Long Covid", [], "long_covid") == "exact"

    def test_exact_synonym(self):
        assert S.alignment_type("PASC", ["Long COVID"], "long_covid") == "exact"

    def test_close_substring_both_ways(self):
        assert S.alignment_type("chronic fatigue", [], "fatigue") == "close"
        assert S.alignment_type("fat", [], "fatigue") == "close"

    def test_empty_label_is_close(self):
        # '' in concept_label is True in Python -> 'close'
        assert S.alignment_type("", [], "fatigue") == "close"
        assert S.alignment_type(None, [], "fatigue") == "close"

    def test_broader(self):
        assert S.alignment_type("rare disease", [], "Symptom") == "broader"
        assert S.alignment_type("heart condition", [], "sign") == "broader"

    def test_narrower(self):
        assert S.alignment_type("clinical manifestation", [], "Disease") == "narrower"

    def test_related_default(self):
        assert S.alignment_type("zebrafish", [], "fatigue") == "related"

    def test_predicates(self):
        assert S.alignment_predicate("Long Covid", [], "long_covid") == "skos:exactMatch"
        assert S.alignment_predicate("zebrafish", [], "fatigue") == "skos:relatedMatch"


class TestCombineAndCompare:
    BP = [
        {"uri": "u1", "label": "Fatigue", "ontology": "HP", "source": "bioportal"},
        {"uri": "u2", "label": "Tiredness", "ontology": "SYMP", "source": "bioportal"},
    ]
    OLS = [
        {"uri": "u1", "label": "fatigue", "ontology": "HP", "source": "ols"},
        {"uri": "u3", "label": "Exhaustion", "ontology": "HP", "source": "ols"},
    ]

    def test_combine_priority(self):
        out = S.combine_results(self.BP, self.OLS)
        assert [r["uri"] for r in out] == ["u1", "u2", "u3"]
        assert out[0].get("ols_only") is None  # BP wins u1
        assert out[2]["ols_only"] is True

    def test_compare(self):
        cmp = S.compare_results(self.BP, self.OLS, "fatigue")
        assert cmp["bioportal_count"] == 2 and cmp["ols_count"] == 2
        assert len(cmp["common_terms"]) == 1
        assert cmp["common_terms"][0]["uri_match"] is True
        assert [r["label"] for r in cmp["bioportal_only"]] == ["Tiredness"]
        assert [r["label"] for r in cmp["ols_only"]] == ["Exhaustion"]
        assert cmp["discrepancies"] == [
            "BioPortal has 1 unique term(s)",
            "OLS has 1 unique term(s)",
        ]


class TestKeysAndConfig:
    def test_cache_key_normalization(self):
        # case/whitespace-insensitive hits (test_cache.py:65-85 behavior)
        assert S.cache_key(" Fatigue ", "hp,ncit", "BioPortal") == S.cache_key(
            "fatigue", "HP,NCIT", "bioportal"
        )
        assert len(S.cache_key("a", "b", "c")) == 64

    def test_curie_expansion(self):
        assert S.curie_to_iri("MONDO:0005015") == (
            "http://purl.obolibrary.org/obo/MONDO_0005015"
        )
        assert S.curie_to_iri("FOO:123") == "http://purl.obolibrary.org/obo/FOO_123"
        assert S.curie_to_iri("nocolon") == "nocolon"
        assert S.curie_to_iri("SIO:000123") == "http://semanticscience.org/resource/SIO_000123"

    def test_convert_ontologies_drops_unknown(self):
        assert S.convert_ontologies("MONDO, hp ,ICD10") == "mondo,hp"
        assert S.convert_ontologies("PRO") == "pr"

    def test_strategy_default(self):
        st = S.search_strategy("unknown_key", "My Label")
        assert st["variants"] == ["My Label", "my label"]
        assert st["ontologies"] == "MONDO,HP,NCIT"
        assert S.search_strategy("fatigue", "x")["variants"][0] == "fatigue"

    def test_golden_mappings(self):
        sels = {
            "fatigue": [
                {"uri": "http://purl.obolibrary.org/obo/HP_0012378",
                 "label": "Fatigue", "synonyms": ["tired"]},
                {"uri": "u2", "label": "zebrafish", "synonyms": []},
            ]
        }
        got = S.golden_mappings(sels)
        assert ("http://example.org/ontology#fatigue", "skos:exactMatch",
                "http://purl.obolibrary.org/obo/HP_0012378") in got
        assert ("http://example.org/ontology#fatigue", "skos:relatedMatch", "u2") in got
