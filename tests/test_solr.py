"""Solr-subset → SQL predicate translation (SURVEY §7.3.5)."""

from __future__ import annotations

import pytest

from cassandra_extractor_spark.functions.solr import SolrTranslationError, solr_to_sql
from cassandra_extractor_spark.plans.spec import ExtractionSpec


def test_term_and_phrase():
    assert solr_to_sql("event_type:click") == "event_type = 'click'"
    assert solr_to_sql('event_type:"page view"') == "event_type = 'page view'"


def test_numeric_and_range():
    assert solr_to_sql("user_id:42") == "user_id = 42"
    assert (
        solr_to_sql("value:[10 TO 20]") == "(value >= 10 AND value <= 20)"
    )
    assert solr_to_sql("value:{10 TO *}") == "(value > 10)"


def test_wildcards():
    assert solr_to_sql("event_type:cli*") == "event_type LIKE 'cli%'"
    assert solr_to_sql("event_type:?lick") == "event_type LIKE '_lick'"


def test_boolean_composition():
    sql = solr_to_sql("event_type:click AND (value:[100 TO *] OR NOT user_id:7)")
    assert sql == "event_type = 'click' AND ( (value >= 100) OR NOT user_id = 7 )"


def test_match_all():
    assert solr_to_sql("*:*") == "TRUE"


def test_prohibit_and_require_prefixes():
    # Lucene unary operators: '-' prohibits (NOT), '+' requires (no-op
    # under explicit AND/OR)
    assert solr_to_sql("-event_type:click") == "NOT event_type = 'click'"
    assert (
        solr_to_sql("+event_type:click AND -user_id:7")
        == "event_type = 'click' AND NOT user_id = 7"
    )
    assert solr_to_sql("-value:[1 TO 5]") == "NOT (value >= 1 AND value <= 5)"
    assert solr_to_sql('-name:"a b"') == "NOT name = 'a b'"


@pytest.mark.parametrize(
    "bad",
    [
        "name:rob~2",
        "title:spark^4",
        "bare_fulltext",
        "a:1 b:2",
        "(a:1",
        "value:[1 TO 2",
        "a:1 NOT b:2",  # implicit operator before NOT is ambiguous
        "a:1 (b:2 OR c:3)",  # operand adjacent to a group
        "a:1 AND",  # trailing operator
        "()",
    ],
)
def test_rejects_unsupported(bad):
    with pytest.raises(SolrTranslationError):
        solr_to_sql(bad)


def test_escaping():
    assert solr_to_sql("name:o'brien") == "name = 'o''brien'"


def test_translated_filter_runs_in_spark(spark, sf_dir):
    spec = ExtractionSpec(
        table="events",
        filter=solr_to_sql("event_type:click AND value:[100 TO *]"),
    )
    df = spec.build(spark, sf_dir)
    rows = df.collect()
    assert rows and all(r["event_type"] == "click" and r["value"] >= 100 for r in rows)


def test_bare_terms_with_default_field(spark, sf_dir):
    """Reference README.md:280-283 pushes bare full-text q strings into
    the default search field; with default_field they become
    case-insensitive CONTAINS predicates."""
    assert (
        solr_to_sql("spark", default_field="text")
        == "(INSTR(LOWER(text), 'spark') > 0)"
    )
    assert (
        solr_to_sql('"machine learning" AND spark', default_field="text")
        == "(INSTR(LOWER(text), 'machine learning') > 0) AND (INSTR(LOWER(text), 'spark') > 0)"
    )
    assert solr_to_sql("-Spam", default_field="text") == "NOT (INSTR(LOWER(text), 'spam') > 0)"
    # mixes with fielded clauses
    sql = solr_to_sql("lang:en AND pizza", default_field="text")
    assert sql == "lang = 'en' AND (INSTR(LOWER(text), 'pizza') > 0)"
    # actually executes against the documents table
    from cassandra_extractor_spark.sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    n = docs.where(solr_to_sql("the", default_field="text")).count()
    assert 0 < n <= docs.count()


def test_bare_terms_rejected_without_default_field():
    with pytest.raises(SolrTranslationError, match="default_field"):
        solr_to_sql("spark")


def test_bare_term_hard_syntax_still_rejected():
    for q in ("spark~2", "spark^3", "spar*", 'spar?', '"big data"~5'):
        with pytest.raises(SolrTranslationError):
            solr_to_sql(q, default_field="text")


def test_malformed_field_query_rejected_not_half_translated():
    """A token that LOOKS like a field query but misses the field
    grammar (field not starting with a letter) must be rejected — never
    silently become full-text containment of the literal colon text."""
    with pytest.raises(SolrTranslationError, match="malformed field query"):
        solr_to_sql("9field:value", default_field="text")
