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
        "name:rob~5",  # fuzzy beyond Lucene's max distance
        "title:spa^rk4",  # boost not at end of token: malformed
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
    # bare fuzzy now translates (token-level levenshtein, see
    # test_bare_fulltext_fuzzy_token_level); degenerate all-wildcard
    # terms stay rejected, and fuzzy-on-wildcard is untranslatable
    for q in ("*", "?*", "spar*~1"):
        with pytest.raises(SolrTranslationError):
            solr_to_sql(q, default_field="text")


def test_bare_wildcard_terms_token_regex(spark):
    """Bare ``spar*`` matches any TOKEN starting with spar — a
    word-bounded regex on the default field, not substring LIKE."""
    assert (
        solr_to_sql("spar*", default_field="text")
        == "(text RLIKE '(?i)\\\\bspar\\\\w*\\\\b')"
    )
    assert (
        solr_to_sql("h?t", default_field="text")
        == "(text RLIKE '(?i)\\\\bh\\\\wt\\\\b')"
    )
    with pytest.raises(SolrTranslationError, match="default_field"):
        solr_to_sql("spar*")
    df = spark.createDataFrame(
        [(0, "sparkling water"), (1, "spar fights"), (2, "no match"), (3, "spartan")],
        "id long, text string",
    )
    ids = {r["id"] for r in df.where(solr_to_sql("spar*", default_field="text")).collect()}
    assert ids == {0, 1, 3}
    ids_q = {r["id"] for r in df.where(solr_to_sql("spa?", default_field="text")).collect()}
    assert ids_q == {1}  # exactly one extra word char: 'spar' only


def test_boosts_stripped_exactly():
    """``^N`` reorders ranked results but never changes the match set;
    with no ranking in a predicate translation, stripping is exact."""
    assert solr_to_sql("title:spark^4") == "title = 'spark'"
    assert solr_to_sql("title:spark^0.5") == "title = 'spark'"
    assert solr_to_sql('t:"big data"^2') == "t = 'big data'"
    assert solr_to_sql("name:rob~1^3") == "levenshtein(name, 'rob') <= 1"
    assert solr_to_sql("pizza^2", default_field="text") == "(INSTR(LOWER(text), 'pizza') > 0)"
    assert (
        solr_to_sql('"big data"~1^2', default_field="text")
        == solr_to_sql('"big data"~1', default_field="text")
    )


def test_fuzzy_term_translation_and_semantics(spark):
    """``field:term~N`` → levenshtein predicate; bare ``~`` = 2
    (Lucene's default); executed semantics over real rows."""
    assert solr_to_sql("name:rob~1") == "levenshtein(name, 'rob') <= 1"
    assert solr_to_sql("name:rob~") == "levenshtein(name, 'rob') <= 2"
    assert (
        solr_to_sql("lang:en AND name:rob~1")
        == "lang = 'en' AND levenshtein(name, 'rob') <= 1"
    )
    df = spark.createDataFrame(
        [(0, "rob"), (1, "rab"), (2, "robb"), (3, "bert"), (4, "orb")],
        "id long, name string",
    )
    ids = {r["id"] for r in df.where(solr_to_sql("name:rob~1")).collect()}
    assert ids == {0, 1, 2}  # edit distance <= 1 ('orb' is a transposition: 2 here)
    # bare full-text fuzzy now maps to token-level edit distance
    assert "levenshtein" in solr_to_sql("rob~1", default_field="text")


def test_proximity_translation_shape():
    """``"a b"~N`` → ordered-token RLIKE with a {0,N} word gap; bare
    form needs default_field, fielded form does not."""
    sql = solr_to_sql('"big data"~2', default_field="text")
    assert sql == "(text RLIKE '(?i)\\\\bbig\\\\b(?:\\\\W+\\\\w+){0,2}\\\\W+data\\\\b')"
    assert (
        solr_to_sql('title:"big data"~1')
        == "(title RLIKE '(?i)\\\\bbig\\\\b(?:\\\\W+\\\\w+){0,1}\\\\W+data\\\\b')"
    )
    with pytest.raises(SolrTranslationError, match="default_field"):
        solr_to_sql('"big data"~2')
    # composes with booleans and the prohibit prefix
    sql = solr_to_sql('lang:en AND -"big data"~1', default_field="text")
    assert sql.startswith("lang = 'en' AND NOT (text RLIKE")


def test_proximity_semantics_in_spark(spark):
    """Executed semantics: ordered, at most N intervening words."""
    rows = [
        (0, "big data wins"),            # adjacent
        (1, "big shiny data"),           # 1 intervening
        (2, "big very shiny data"),      # 2 intervening
        (3, "data big"),                 # wrong order
        (4, "Big ugly DATA"),            # case-insensitive, 1 gap
        (5, "bigger data"),              # word boundary: 'bigger' != 'big'
    ]
    df = spark.createDataFrame(rows, "id long, text string")

    def ids(q):
        return {r["id"] for r in df.where(solr_to_sql(q, default_field="text")).collect()}

    assert ids('"big data"~0') == {0}
    assert ids('"big data"~1') == {0, 1, 4}
    assert ids('"big data"~2') == {0, 1, 2, 4}


def test_proximity_gap_property():
    """Property: for text 'tok1 f1 .. fk tok2', the translated
    predicate matches iff k <= slop (ordered-gap semantics).  Validated
    with Python re on the emitted pattern — \\b/\\W/\\w/(?i) agree
    between Java and Python regex for ASCII, which is what RLIKE
    compiles."""
    import re as _re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        gap=st.integers(min_value=0, max_value=6),
        slop=st.integers(min_value=0, max_value=6),
        fill=st.sampled_from(["pad", "zz", "q9"]),
    )
    def check(gap, slop, fill):
        sql = solr_to_sql(f'"alpha omega"~{slop}', default_field="text")
        m = _re.search(r"RLIKE '(.*)'\)$", sql)
        pattern = m.group(1).replace("\\\\", "\\").replace("''", "'")
        text = "alpha " + " ".join([fill] * gap) + (" " if gap else "") + "omega"
        assert bool(_re.search(pattern, text)) == (gap <= slop), (text, pattern)

    check()


def test_malformed_field_query_rejected_not_half_translated():
    """A token that LOOKS like a field query but misses the field
    grammar (field not starting with a letter) must be rejected — never
    silently become full-text containment of the literal colon text."""
    with pytest.raises(SolrTranslationError, match="malformed field query"):
        solr_to_sql("9field:value", default_field="text")


def test_bare_fulltext_fuzzy_token_level(spark):
    """Bare ``term~N`` with a default_field: matches documents whose
    TOKEN is within N edits — behavioral check through a real frame."""
    from pyspark.sql import functions as F

    from cassandra_extractor_spark.functions.solr import solr_to_sql

    df = spark.createDataFrame(
        [
            (1, "apache spark streaming"),
            (2, "sparkling water is unrelated"),
            (3, "nothing relevant here"),
        ],
        "id long, text string",
    )
    sql = solr_to_sql("sprak~1", default_field="text")
    got = {r["id"] for r in df.where(F.expr(sql)).collect()}
    # 'spark' is 1 transposition = 2 plain-Levenshtein? no: sprak->spark
    # swaps 'a'/'k' adjacent = distance 2 plain; but 'sprak'~1 edits:
    # delete/insert => spark is distance 2. So ~1 matches nothing here.
    assert got == set()
    sql2 = solr_to_sql("sprak~2", default_field="text")
    got2 = {r["id"] for r in df.where(F.expr(sql2)).collect()}
    assert 1 in got2 and 3 not in got2


def test_bare_fuzzy_rejections():
    import pytest

    from cassandra_extractor_spark.functions.solr import (
        SolrTranslationError,
        solr_to_sql,
    )

    with pytest.raises(SolrTranslationError, match="default_field"):
        solr_to_sql("sprak~1")
    with pytest.raises(SolrTranslationError, match="Lucene max"):
        solr_to_sql("sprak~3", default_field="text")
