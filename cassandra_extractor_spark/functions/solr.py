"""Solr/Lucene query-syntax translation (reference P2).

The reference pushes a Solr query JSON into DSE Search
(``datacrawler.py:138-151``; examples in ``README.md:280-283``).  We
have no Solr, so SURVEY §7.3.5 calls for translating the *documented
subset* to SQL predicates (Catalyst then pushes them to the source)
and rejecting anything outside it loudly — no half-translation.

Supported subset:

- ``field:value`` (bare term, quoted phrase)
- ``field:[a TO b]`` / ``{a TO b}`` inclusive/exclusive ranges, ``*``
  as an open end
- ``field:pre*`` / ``field:*suf`` / ``field:*mid*`` wildcards → LIKE
- ``AND`` / ``OR`` / ``NOT`` with parentheses
- unary ``+clause`` (required — no-op under explicit operators) and
  ``-clause`` (prohibited → ``NOT``)
- ``*:*`` (match all)

Bare full-text terms and phrases (no ``field:`` prefix) — the
reference's most common usage (README.md:280-283 pushes arbitrary
``q`` strings into the default search field) — translate to a
case-insensitive CONTAINS on a caller-designated ``default_field``:
``solr_to_sql("spark AND streaming", default_field="text")``.  Without
a ``default_field`` they are rejected, as before.  The mapping is
substring containment, not analyzer-tokenized scoring — exact parity
with Solr's text analysis is impossible without Solr; containment is
the documented approximation.

Proximity phrases ``"a b"~N`` (bare with a ``default_field``, or
field-qualified) translate to an ordered-token regex: each adjacent
token pair may be separated by at most N intervening words
(``RLIKE '(?i)\\btok1\\b(?:\\W+\\w+){0,N}\\W+tok2\\b'``).  This is the
documented approximation of Lucene slop: ordered matching with a
per-adjacent-pair gap budget, not Lucene's total-edit-distance slop
(which also permits transpositions at cost 2) and not
analyzer-tokenized — same caveat as the CONTAINS mapping.

Fielded fuzzy terms ``field:term~N`` (N ≤ 2, Lucene's maximum; bare
``~`` = 2) translate to ``levenshtein(field, term) <= N`` — plain edit
distance, not Lucene's Damerau-Levenshtein (a transposition costs 2
here, 1 there), documented as the approximation.  Bare full-text fuzzy
``term~N`` with a ``default_field`` maps to token-level edit distance
(``exists(split(lower(field), '\\s+'), t -> levenshtein(t, term) <= N)``)
— Lucene fuzzes the analyzed token, so token granularity is the right
unit; the lambda runs interpreted (no codegen), acceptable for the
filter position it occupies.

Boosts ``^N`` are STRIPPED exactly: they reorder Solr's ranked
results but never change which documents match, and a predicate
translation has no ranking — so ``title:spark^4`` filters identically
to ``title:spark``.

Bare wildcard terms (``spar*``, ``h?t``) translate with a
``default_field`` to a word-bounded token regex (``*`` → ``\\w*``,
``?`` → ``\\w``) — Lucene wildcards match within a token, so the
substring-LIKE spelling used for fielded wildcards would be wrong
here.

Everything else (fuzzy distance > 2 — Lucene's own cap — and
fuzzy-on-wildcard combinations) raises ``SolrTranslationError``.
"""

from __future__ import annotations

import re


class SolrTranslationError(ValueError):
    pass


_TOKEN = re.compile(
    r"""\s*(?:
        (?P<lparen>\() |
        (?P<rparen>\)) |
        (?P<op>AND\b|OR\b|NOT\b) |
        (?P<range>[+-]?[A-Za-z_][\w.]*:[\[{][^\]}]*\s+TO\s+[^\]}]*[\]}]) |
        (?P<phrase>[+-]?[A-Za-z_][\w.]*:"[^"]*"(?:~\d+)?(?:\^[\d.]+)?) |
        (?P<term>[+-]?[A-Za-z_][\w.]*:[^\s()]+) |
        (?P<star>\*:\*) |
        (?P<bare_phrase>[+-]?"[^"]*"(?:~\d+)?(?:\^[\d.]+)?) |
        (?P<other>[^\s()]+)
    )""",
    re.VERBOSE,
)

_RANGE = re.compile(
    r"(?P<field>[A-Za-z_][\w.]*):(?P<lb>[\[{])(?P<lo>[^\]}]*?)\s+TO\s+(?P<hi>[^\]}]*?)(?P<rb>[\]}])"
)


_BOOST = re.compile(r"\^\d+(\.\d+)?$")


def _strip_boost(clause: str) -> str:
    """Drop a trailing ``^boost``.  Boosts reorder Solr's ranked
    results but never change WHICH documents match — and a predicate
    translation has no ranking — so stripping is exact, not a
    half-translation."""
    return _BOOST.sub("", clause)


def _strip_prefix(clause: str) -> tuple[bool, str]:
    """Handle Lucene's unary ``+`` (required — a no-op under explicit
    AND/OR) and ``-`` (prohibited → SQL NOT) clause prefixes."""
    if clause.startswith("-"):
        return True, clause[1:]
    if clause.startswith("+"):
        return False, clause[1:]
    return False, clause


def _sql_literal(value: str) -> str:
    if re.fullmatch(r"-?\d+(\.\d+)?", value):
        return value
    return _sql_string(value)


def _sql_string(value: str) -> str:
    # the predicate is consumed by Spark SQL, whose string literals
    # treat backslash as an escape — double it, then double quotes
    return "'" + value.replace("\\", "\\\\").replace("'", "''") + "'"


def _proximity(field: str, text: str, slop: int) -> str:
    """``"a b"~N`` → ordered-token regex: tokens in phrase order, at
    most ``slop`` intervening words between each adjacent pair.  Case
    folds via ``(?i)``; tokens are regex-escaped (RLIKE compiles Java
    regex, which accepts escaped punctuation)."""
    toks = text.split()
    if not toks:
        raise SolrTranslationError("empty proximity phrase")
    pat = r"(?i)\b" + re.escape(toks[0])
    for t in toks[1:]:
        pat += r"\b(?:\W+\w+){0,%d}\W+" % slop + re.escape(t)
    pat += r"\b"
    return f"{field} RLIKE {_sql_string(pat)}"


def _token_wildcard(default_field: str | None, text: str) -> str:
    """Bare wildcard term → token-level regex on the default field:
    Lucene's ``spar*`` matches any TOKEN starting with ``spar``, so the
    containment analog is a word-bounded regex (``*`` → ``\\w*``,
    ``?`` → ``\\w``), not a substring LIKE."""
    if default_field is None:
        raise SolrTranslationError(
            f"bare wildcard term {text!r} has no field: pass default_field="
        )
    if set(text) <= {"*", "?"}:
        raise SolrTranslationError(f"wildcard-only term is not translatable: {text!r}")
    pat = "".join(
        r"\w*" if p == "*" else (r"\w" if p == "?" else re.escape(p))
        for p in re.split(r"([*?])", text)
        if p
    )
    full = "(?i)\\b" + pat + "\\b"
    return f"{default_field} RLIKE {_sql_string(full)}"


def _contains(default_field: str | None, text: str) -> str:
    """Bare full-text term/phrase → case-insensitive containment on the
    designated default text field."""
    if default_field is None:
        raise SolrTranslationError(
            f"bare full-text term {text!r} has no field: pass default_field= "
            "to map it to a CONTAINS on a text column, or qualify it"
        )
    if not text:
        raise SolrTranslationError("empty full-text term")
    return f"INSTR(LOWER({default_field}), {_sql_string(text.lower())}) > 0"


def _translate_range(m: re.Match) -> str:
    field, lo, hi = m.group("field"), m.group("lo").strip(), m.group("hi").strip()
    lo_op = ">=" if m.group("lb") == "[" else ">"
    hi_op = "<=" if m.group("rb") == "]" else "<"
    parts = []
    if lo != "*":
        parts.append(f"{field} {lo_op} {_sql_literal(lo)}")
    if hi != "*":
        parts.append(f"{field} {hi_op} {_sql_literal(hi)}")
    return "(" + " AND ".join(parts) + ")" if parts else "TRUE"


def _translate_term(field: str, value: str) -> str:
    value = _strip_boost(value)
    fuzzy = re.fullmatch(r"(?P<term>[^~^]+)~(?P<dist>\d*)", value)
    if fuzzy:
        # field:term~N → edit-distance predicate on the whole field
        # value (consistent with the exact mapping field:term →
        # equality).  Approximation caveat: Lucene fuzzy is
        # Damerau-Levenshtein (transposition costs 1); SQL levenshtein
        # is plain edit distance (transposition costs 2), so a~N may
        # miss transposed matches Lucene would accept.  Lucene's
        # default (bare ~) and maximum distance is 2.
        dist = int(fuzzy.group("dist") or 2)
        if dist > 2:
            raise SolrTranslationError(
                f"fuzzy distance > 2 not supported (Lucene max): {field}:{value}"
            )
        return f"levenshtein({field}, {_sql_string(fuzzy.group('term'))}) <= {dist}"
    if "~" in value or "^" in value:
        raise SolrTranslationError(
            f"{'boost' if '^' in value else 'fuzzy'} syntax not supported: {field}:{value}"
        )
    if "*" in value or "?" in value:
        like = value.replace("%", r"\%").replace("_", r"\_").replace("*", "%").replace("?", "_")
        return f"{field} LIKE {_sql_literal(like)}"
    return f"{field} = {_sql_literal(value)}"


def solr_to_sql(query: str, default_field: str | None = None) -> str:
    """Translate a Solr query string to an equivalent SQL predicate.

    ``default_field`` enables bare full-text terms/phrases (no
    ``field:`` prefix) as case-insensitive containment on that column.

    Raises ``SolrTranslationError`` for syntax outside the documented
    subset (SURVEY §7.3.5: reject, never half-translate).
    """
    out: list[str] = []
    pos = 0
    depth = 0
    for m in _TOKEN.finditer(query):
        if m.start() != pos and query[pos : m.start()].strip():
            raise SolrTranslationError(f"unparsable at {query[pos:m.start()]!r}")
        pos = m.end()
        if m.group("lparen"):
            out.append("(")
            depth += 1
        elif m.group("rparen"):
            depth -= 1
            if depth < 0:
                raise SolrTranslationError("unbalanced parentheses")
            out.append(")")
        elif m.group("op"):
            out.append(m.group("op"))
        elif m.group("range"):
            neg, clause = _strip_prefix(m.group("range"))
            if neg:
                out.append("NOT")
            out.append(_translate_range(_RANGE.fullmatch(clause)))
        elif m.group("phrase"):
            neg, clause = _strip_prefix(m.group("phrase"))
            if neg:
                out.append("NOT")
            field, value = clause.split(":", 1)
            value = _strip_boost(value)
            prox = re.fullmatch(r'"(?P<text>[^"]*)"~(?P<slop>\d+)', value)
            if prox:
                out.append(
                    "(" + _proximity(field, prox.group("text"), int(prox.group("slop"))) + ")"
                )
            else:
                out.append(f"{field} = {_sql_literal(value[1:-1])}")
        elif m.group("term"):
            neg, clause = _strip_prefix(m.group("term"))
            if neg:
                out.append("NOT")
            field, value = clause.split(":", 1)
            out.append(_translate_term(field, value))
        elif m.group("star"):
            out.append("TRUE")
        elif m.group("bare_phrase"):
            neg, clause = _strip_prefix(m.group("bare_phrase"))
            if neg:
                out.append("NOT")
            clause = _strip_boost(clause)
            prox = re.fullmatch(r'"(?P<text>[^"]*)"~(?P<slop>\d+)', clause)
            if prox:
                if default_field is None:
                    raise SolrTranslationError(
                        f"bare proximity phrase {clause!r} has no field: pass "
                        "default_field= to map it to a regex on a text column"
                    )
                out.append(
                    "("
                    + _proximity(default_field, prox.group("text"), int(prox.group("slop")))
                    + ")"
                )
            else:
                out.append("(" + _contains(default_field, clause[1:-1]) + ")")
        else:
            neg, clause = _strip_prefix(m.group("other"))
            clause = _strip_boost(clause)
            fuzzy = re.fullmatch(r"(?P<term>[^~^*?]+)~(?P<dist>\d*)", clause)
            if fuzzy:
                # bare full-text fuzzy: token-level edit distance — a
                # document matches when ANY whitespace token of the
                # default field is within N edits (Lucene fuzzes the
                # analyzed token, so token-level is the right unit;
                # same plain-Levenshtein caveat as fielded fuzzy)
                if default_field is None:
                    raise SolrTranslationError(
                        f"bare fuzzy term {clause!r} has no field: pass "
                        "default_field= to map it to token-level edit distance"
                    )
                dist = int(fuzzy.group("dist") or 2)
                if dist > 2:
                    raise SolrTranslationError(
                        f"fuzzy distance > 2 not supported (Lucene max): {clause}"
                    )
                term = _sql_string(fuzzy.group("term").lower())
                if neg:
                    out.append("NOT")
                out.append(
                    f"(exists(split(lower({default_field}), '\\\\s+'), "
                    f"t -> levenshtein(t, {term}) <= {dist}))"
                )
                continue
            for bad, what in (("~", "fuzzy"), ("^", "boost")):
                if bad in clause:
                    raise SolrTranslationError(
                        f"{what} syntax on a bare term is not translatable: {clause}"
                    )
            if ":" in clause:
                # a malformed field query (e.g. field not starting with
                # a letter: '9field:value') misses the term pattern and
                # lands here; reject, never half-translate it as
                # full-text containment of the literal colon
                raise SolrTranslationError(
                    f"malformed field query (not a bare term): {clause}"
                )
            if neg:
                out.append("NOT")
            if "*" in clause or "?" in clause:
                out.append("(" + _token_wildcard(default_field, clause) + ")")
            else:
                out.append("(" + _contains(default_field, clause) + ")")
    if depth != 0:
        raise SolrTranslationError("unbalanced parentheses")
    if not out:
        raise SolrTranslationError("empty query")
    # grammar check (Solr's implicit operator is dialect-dependent —
    # require explicit AND/OR): expect-operand → operand/NOT/'(',
    # after-operand → AND/OR/')'; must end after an operand
    expect_operand = True
    for tok in out:
        if tok == "(" or tok == "NOT":
            if not expect_operand:
                raise SolrTranslationError(f"{tok!r} must follow AND/OR/( or start")
        elif tok in ("AND", "OR"):
            if expect_operand:
                raise SolrTranslationError(f"{tok} needs a left-hand clause")
            expect_operand = True
        elif tok == ")":
            if expect_operand:
                raise SolrTranslationError("')' after operator or empty group")
        else:  # operand
            if not expect_operand:
                raise SolrTranslationError("adjacent clauses need an explicit AND/OR")
            expect_operand = False
    if expect_operand:
        raise SolrTranslationError("query ends with an operator")
    return " ".join(out)
