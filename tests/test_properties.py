"""Property-based tests (hypothesis) for the engine's pure layers."""

from __future__ import annotations

import datetime

from hypothesis import given, settings, strategies as st

from cassandra_extractor_spark.config import env_key, load_properties
from cassandra_extractor_spark.functions.tablespecs import strptime_to_spark
from cassandra_extractor_spark.sinks.jdbc import partition_ddl

_ident = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_.",
    min_size=1,
    max_size=30,
).filter(lambda s: s[0].isalpha())


@given(st.dictionaries(_ident, st.text(
    alphabet=st.characters(blacklist_categories=("Cs", "Cc")), max_size=40
).map(lambda s: s.strip()).filter(lambda s: s and "\n" not in s and "#" not in s and ";" not in s), max_size=10))
@settings(max_examples=50, deadline=None)
def test_properties_roundtrip(d):
    text = "\n".join(f"{k}={v}" for k, v in d.items())
    parsed = load_properties(text, is_text=True)
    assert parsed == {k: v for k, v in d.items()}


@given(_ident)
@settings(max_examples=50, deadline=None)
def test_env_key_is_env_safe(key):
    ek = env_key(key)
    assert ek.isupper() or not any(c.isalpha() for c in ek)
    assert "." not in ek and "-" not in ek


@given(
    st.datetimes(
        min_value=datetime.datetime(1970, 1, 2),
        max_value=datetime.datetime(2100, 1, 1),
    )
)
@settings(max_examples=50, deadline=None)
def test_strptime_translation_agrees_with_python(dt):
    """The translated Spark pattern must format/parse the same instants
    Python's strptime does for the reference's default format."""
    fmt = "%Y-%m-%d %H:%M:%S.%f"
    rendered = dt.strftime(fmt)
    # the Spark pattern is validated against Spark in test_tablespecs;
    # here: translation is total and deterministic for supported formats
    assert strptime_to_spark(fmt) == "yyyy-MM-dd HH:mm:ss.SSSSSS"
    assert datetime.datetime.strptime(rendered, fmt) == dt


@given(st.lists(st.text(min_size=1, max_size=20).filter(lambda s: "\x00" not in s), min_size=1, max_size=5, unique=True))
@settings(max_examples=50, deadline=None)
def test_partition_ddl_always_escapes(values):
    stmts = partition_ddl("t", "c", values)
    assert len(stmts) == len(values)
    for s in stmts:
        body = s.split("FOR VALUES IN (", 1)[1]
        # the quoted literal must contain no bare single quote
        inner = body[1 : body.rindex("')")]
        assert "'" not in inner.replace("''", "")


# --- Solr translator grammar (functions/solr.py) ----------------------

_field = st.text(alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=8).filter(
    lambda s: s not in ("AND", "OR", "NOT", "TO")
)
_value = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=8)


def _leaf():
    return st.one_of(
        st.tuples(st.sampled_from(["", "+", "-"]), _field, _value).map(
            lambda t: f"{t[0]}{t[1]}:{t[2]}"
        ),
        st.tuples(_field, st.integers(0, 99), st.integers(100, 999)).map(
            lambda t: f"{t[0]}:[{t[1]} TO {t[2]}]"
        ),
        st.just("*:*"),
    )


_solr_query = st.recursive(
    _leaf(),
    lambda children: st.one_of(
        st.tuples(children, st.sampled_from(["AND", "OR"]), children).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"
        ),
        children.map(lambda c: f"(NOT {c})"),
    ),
    max_leaves=8,
)


@given(_solr_query)
@settings(max_examples=200, deadline=None)
def test_solr_grammar_always_translates(q):
    from cassandra_extractor_spark.functions.solr import solr_to_sql

    sql = solr_to_sql(q)
    # structural invariants: balanced parens, no Solr remnants, and the
    # operator/operand alternation the translator's own grammar check
    # enforces implies non-empty SQL
    assert sql.count("(") == sql.count(")")
    assert ":" not in sql.replace("':'", "")  # no untranslated field:value
    assert sql.strip()
    # every generated query is inside the supported subset → never raises


@given(
    width=st.integers(min_value=1, max_value=12),
    height=st.integers(min_value=1, max_value=12),
    channels=st.sampled_from([1, 2, 3, 4]),
    data=st.data(),
)
@settings(max_examples=60, deadline=None)
def test_png_encode_decode_round_trip(width, height, channels, data):
    """Property: encode_png → decode_png is the identity on any 8-bit
    pixel buffer, for every supported channel count."""
    from cassandra_extractor_spark.operators.multimodal import decode_png, encode_png

    n = width * height * channels
    pixels = bytes(
        data.draw(st.lists(st.integers(0, 255), min_size=n, max_size=n))
    )
    w, h, c, out = decode_png(encode_png(width, height, channels, pixels))
    assert (w, h, c) == (width, height, channels)
    assert out == pixels
