"""Classic query-string parser — the Lucene ``QueryParser`` surface.

Parses the standard Lucene query syntax into this engine's typed query
objects (``classic/QueryParserBase.java`` semantics for the supported
subset), so a search box can drive ``FullTextIndex.query`` directly:

====================  =================================================
``foo``               ``TermQuery`` (single token after analysis)
``"foo bar"``         ``PhraseQuery`` (multi-token text is a phrase)
``"foo bar"~3``       sloppy ``PhraseQuery(slop=3)``
``foo~`` / ``foo~1``  ``FuzzyQuery`` (default maxEdits 2)
``foo*``              ``PrefixQuery`` (trailing-``*``-only pattern)
``f*o?``              ``WildcardQuery``
``/rege.p/``          ``RegexpQuery`` (anchored, Lucene semantics)
``[a TO b]``          ``TermRangeQuery`` inclusive (``{ }`` exclusive,
                      ``*`` for an open bound)
``clause^2.5``        boost (``BoostQuery`` semantics on the clause)
``+a -b c``           ``BooleanQuery``: MUST / MUST_NOT / SHOULD
``a AND b``, ``OR``,  boolean operators — ``AND`` promotes BOTH
``NOT b``             neighbors to MUST (classic retroactive rule);
                      bare terms take ``default_operator``
``\\*`` etc.          backslash escapes any special character
====================  =================================================

Multi-term queries compose inside booleans with Lucene's in-boolean
rewrites (``+content* -tmp`` works: constant-score for prefix/wildcard/
range/regexp clauses, top-terms scoring for fuzzy), sloppy phrases
compose via the scan path (``+"a b"~2 c``), and parenthesized
sub-groups nest (``+(a b) -c``, ``title:(x y)^2`` — a group becomes a
nested ``BooleanQuery`` clause whose whole score is the clause score).
Without ``allow_fields=True``, ``field:`` prefixes are rejected with a
clear error.

Terms and phrase words are analyzed with the index's tokenizer at query
time (by the engine), so the parser leaves text verbatim; wildcard /
prefix / regexp / range / fuzzy patterns are NOT analyzed (Lucene
multi-term semantics) — lowercase them to match a ``standard`` index.
"""

from __future__ import annotations

import re

from pim_lucene_spark.plans.boolean import BooleanQuery
from pim_lucene_spark.plans.multiterm import (FuzzyQuery, MultiTermQueryT,
                                              PrefixQuery, RegexpQuery,
                                              TermRangeQuery, WildcardQuery)
from pim_lucene_spark.plans.query import PhraseQuery, TermQuery

_SPECIAL = set('+-!(){}[]^"~*?:\\/')

_TOKEN_RE = re.compile(r"""
    (?P<ws>\s+)
  | (?P<and>AND\b|&&)
  | (?P<or>OR\b|\|\|)
  | (?P<not>NOT\b|!)
  | (?P<plus>\+)
  | (?P<minus>-)
  | (?P<phrase>"(?:[^"\\]|\\.)*")
  | (?P<regexp>/(?:[^/\\]|\\.)+/)
  | (?P<range>[\[{](?:[^\]}]*?)\sTO\s(?:[^\]}]*?)[\]}])
  | (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<colon>:)
  | (?P<term>(?:[^\s+\-!(){}\[\]^"~:\\/]|\\.)+)
  | (?P<tilde>~(?P<edits>\d+(?:\.\d+)?)?)
  | (?P<boost>\^(?P<bval>\d+(?:\.\d+)?))
""", re.VERBOSE)


def _unescape(s: str) -> str:
    return re.sub(r"\\(.)", r"\1", s)


def _is_wild(term: str) -> bool:
    """True if the raw (still-escaped) term has an unescaped * or ?."""
    i = 0
    while i < len(term):
        if term[i] == "\\":
            i += 2
            continue
        if term[i] in "*?":
            return True
        i += 1
    return False


def _lex(s: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if m is None:
            raise ValueError(f"query syntax error at {pos}: {s[pos:]!r}")
        pos = m.end()
        kind = next(k for k in ("ws", "and", "or", "not", "plus", "minus",
                                "phrase", "regexp", "range", "lparen",
                                "rparen", "colon", "term", "tilde", "boost")
                    if m.group(k) is not None)
        if kind == "ws":
            continue
        out.append((kind, m.group(0)))
    return out


def _parse_range(raw: str) -> TermRangeQuery:
    inc_lo, inc_hi = raw[0] == "[", raw[-1] == "]"
    body = raw[1:-1]
    lo, hi = re.split(r"\sTO\s", body, maxsplit=1)
    lo, hi = lo.strip(), hi.strip()
    return TermRangeQuery(
        lower=None if lo in ("*", "") else _unescape(lo),
        upper=None if hi in ("*", "") else _unescape(hi),
        include_lower=inc_lo, include_upper=inc_hi)


def _with_boost(q, boost: float):
    if boost == 1.0:
        return q
    cls = type(q)
    kwargs = {f: getattr(q, f) for f in q.__dataclass_fields__}
    kwargs["boost"] = float(q.boost) * boost
    return cls(**kwargs)


def parse_query(s: str, default_operator: str = "or",
                allow_fields: bool = False):
    """Parse a classic query string → a typed query object.

    Returns a single ``TermQuery`` / ``PhraseQuery`` / multi-term query
    when the string is one clause, else a ``BooleanQuery``.
    ``default_operator`` ("or" | "and") sets the occur of unmarked
    clauses, as in Lucene's ``QueryParser.setDefaultOperator``.

    ``allow_fields=True`` accepts ``field:clause`` bindings (one clause
    per binding, Lucene semantics) and wraps the bound clause in
    :class:`~pim_lucene_spark.plans.query.FieldedQuery` — the
    ``MultiFieldIndex.parse_and_query`` mode; the single-field facade
    keeps the default and rejects fields with a clear error.
    """
    if default_operator not in ("or", "and"):
        raise ValueError("default_operator must be 'or' or 'and'")
    toks = _lex(s)
    if not toks:
        raise ValueError("empty query")
    q, i = _parse_group(toks, 0, 0, default_operator, allow_fields)
    if i != len(toks):
        raise ValueError("unbalanced ')'")
    return q


def _finalize(clauses):
    """clauses ``[occur, query]`` → a single typed query or BooleanQuery."""
    if len(clauses) == 1 and clauses[0][0] in ("should", "must"):
        return clauses[0][1]
    if all(occur == "must_not" for occur, _ in clauses):
        raise ValueError(
            "purely negative query matches nothing — add at least one "
            "positive clause (e.g. '*:* -foo')")
    occur_map = {"must": [], "should": [], "must_not": []}
    for occur, q in clauses:
        occur_map[occur].append(q)
    # TermQuery/PhraseQuery go in as typed clauses (search_boolean reads
    # .text/.boost; sloppy phrases route through the scan path there)
    return BooleanQuery(must=occur_map["must"], should=occur_map["should"],
                        must_not=occur_map["must_not"])


def _parse_group(toks, i: int, depth: int, default_operator: str,
                 allow_fields: bool):
    """Recursive-descent clause-list parser; consumes until the matching
    ')' (``depth > 0``) or end of input.  Returns ``(query, next_i)``."""
    from pim_lucene_spark.plans.query import FieldedQuery

    # clauses: list of [occur, query]; occur in {"must","must_not","should"}
    clauses: list[list] = []
    n = len(toks)
    pending = None   # explicit +/-/NOT modifier for the next clause
    conj = None      # AND/OR seen since the previous clause
    field = None     # field: binding for the next clause

    def push(q) -> None:
        nonlocal pending, conj, field
        if field is not None:
            q = FieldedQuery(field, q)
            field = None
        # classic retroactive rules (QueryParserBase.java:377-385): AND
        # promotes the previous SHOULD clause to MUST — even when THIS
        # clause carries its own +/-/NOT modifier ('a AND NOT b'
        # requires a); under default_operator='and', OR demotes the
        # previous non-prohibited clause to SHOULD ('a OR b' → 'a b',
        # and '+a OR b' → 'a OR b' per the reference's own comment)
        if conj == "and" and clauses and clauses[-1][0] == "should":
            clauses[-1][0] = "must"
        if conj == "or" and default_operator == "and" and clauses \
                and clauses[-1][0] == "must":
            clauses[-1][0] = "should"
        if pending is not None:
            occur = pending
        elif conj == "or":
            occur = "should"
        elif conj == "and":
            occur = "must"
        else:
            occur = "must" if default_operator == "and" else "should"
        clauses.append([occur, q])
        pending, conj = None, None

    def _dangling() -> bool:
        return pending is not None or conj is not None or field is not None

    while i < n:
        kind, raw = toks[i]
        if kind in ("plus", "not"):
            pending = "must" if kind == "plus" else "must_not"
            i += 1
            continue
        if kind == "minus":
            pending = "must_not"
            i += 1
            continue
        if kind == "and":
            conj = "and"
            i += 1
            continue
        if kind == "or":
            conj = "or"
            i += 1
            continue
        if kind == "lparen":
            # sub-group: parse recursively; the finalized inner query
            # becomes ONE clause (a nested BooleanQuery evaluates as a
            # single scoring clause downstream)
            sub_q, i = _parse_group(toks, i + 1, depth + 1,
                                    default_operator, allow_fields)
            if i < n and toks[i][0] == "boost":
                sub_q = _with_boost(sub_q, float(toks[i][1][1:]))
                i += 1
            push(sub_q)
            continue
        if kind == "rparen":
            if depth == 0:
                raise ValueError("unbalanced ')'")
            if _dangling():
                raise ValueError("dangling operator before ')'")
            if not clauses:
                raise ValueError("empty group '()'")
            return _finalize(clauses), i + 1
        if kind == "colon":
            raise ValueError(f"dangling ':' at position {i}")
        if kind in ("tilde", "boost"):
            raise ValueError(f"dangling {raw!r} at clause start")

        # --- *:* = MatchAllDocsQuery (classic parser special case) --------
        if (kind == "term" and raw == "*" and i + 2 < n
                and toks[i + 1][0] == "colon"
                and toks[i + 2] == ("term", "*")):
            from pim_lucene_spark.plans.query import MatchAllDocsQuery
            q = MatchAllDocsQuery()
            if i + 3 < n and toks[i + 3][0] == "boost":
                q = MatchAllDocsQuery(boost=float(toks[i + 3][1][1:]))
                i += 1
            push(q)
            i += 3
            continue

        # --- field binding: term ':' clause -------------------------------
        if (kind == "term" and i + 1 < n and toks[i + 1][0] == "colon"):
            if not allow_fields:
                raise ValueError(
                    "field: syntax is not supported here — the pim index "
                    "is single-field; use MultiFieldIndex.parse_and_query "
                    "(or .search(field=...)) to target a field")
            if field is not None:
                raise ValueError("chained field: bindings")
            field = _unescape(raw)
            i += 2
            continue

        # --- a clause body ------------------------------------------------
        if kind == "phrase":
            text = _unescape(raw[1:-1])
            slop = 0
            if i + 1 < n and toks[i + 1][0] == "tilde":
                traw = toks[i + 1][1]
                slop = int(float(traw[1:])) if len(traw) > 1 else 0
                i += 1
            q = PhraseQuery(text, slop=slop)
        elif kind == "regexp":
            q = RegexpQuery(_unescape(raw[1:-1]))
        elif kind == "range":
            q = _parse_range(raw)
        elif kind == "term":
            if i + 1 < n and toks[i + 1][0] == "tilde":
                traw = toks[i + 1][1]
                if len(traw) > 1:
                    val = float(traw[1:])
                    if val != int(val):
                        # FuzzyQuery.java / classic QueryParser reject
                        # the legacy similarity form
                        raise ValueError(
                            "Fractional edit distances are not allowed "
                            f"({raw}{traw})")
                    edits = int(val)
                else:
                    edits = 2
                q = FuzzyQuery(_unescape(raw), max_edits=edits)
                i += 1
            elif _is_wild(raw):
                body = raw
                # trailing-*-only with no other wildcard → PrefixQuery
                if (body.endswith("*") and not body.endswith("\\*")
                        and not _is_wild(body[:-1])):
                    q = PrefixQuery(_unescape(body[:-1]))
                else:
                    q = WildcardQuery(body)  # pattern keeps its escapes
            else:
                q = TermQuery(_unescape(raw))
        else:  # pragma: no cover — lexer covers every kind
            raise ValueError(f"unexpected token {raw!r}")

        if i + 1 < n and toks[i + 1][0] == "boost":
            q = _with_boost(q, float(toks[i + 1][1][1:]))
            i += 1
        push(q)
        i += 1

    if depth > 0:
        raise ValueError("unbalanced '('")
    if _dangling():
        raise ValueError("dangling operator at end of query")
    return _finalize(clauses), i


def apply_synonyms(query, synonyms: dict, tokenizer: str = "whitespace"):
    """Query-time synonym expansion — the ``SynonymGraphFilter``
    use-case at the query layer: every single-term scoring leaf whose
    ANALYZED term has an entry in ``synonyms`` becomes a
    :class:`~pim_lucene_spark.plans.query.SynonymQuery` over
    ``(term, *synonyms[term])``, preserving the leaf's boost (merged
    pseudo-term stats, freq = Σ boost·tf — ``SynonymQuery.java``).

    ``synonyms`` maps ``term -> [syn, ...]`` or ``[(syn, boost), ...]``
    (per-synonym boosts in (0, 1]).  Map keys, map values, and leaf
    texts are all analyzed with ``tokenizer`` (pass the INDEX's
    tokenizer — ``manifest.tokenizer``) before matching, because
    ``SynonymQuery.terms`` are post-analysis index terms; an entry that
    analyzes to anything but one token is rejected.  Multi-token
    phrases are left untouched (graph-position phrase synonyms are out
    of scope — term-level expansion is the common analyzer
    configuration).  Recurses through Boolean/DisMax/Fielded/
    ConstantScore structure; multiterm, fuzzy, sloppy-phrase and
    matchall leaves pass through.
    """
    from dataclasses import replace

    from pim_lucene_spark.functions.tokenize import tokenize_one
    from pim_lucene_spark.plans.dismax import DisMaxQuery
    from pim_lucene_spark.plans.query import (ConstantScoreQuery,
                                              FieldedQuery, SynonymQuery)

    def one_token(text, what):
        toks = tokenize_one(str(text), tokenizer)
        if len(toks) != 1:
            raise ValueError(
                f"synonym map {what} {text!r} analyzes to {len(toks)} "
                f"tokens under the {tokenizer!r} tokenizer; entries "
                "must be single terms")
        return toks[0]

    norm_map = {}
    for key, syns in synonyms.items():
        entries = []
        for s in syns:
            term, tb = (s, 1.0) if isinstance(s, str) else s
            entries.append((one_token(term, "synonym"), float(tb)))
        norm_map[one_token(key, "key")] = entries

    def leaf(text: str, boost: float):
        toks = tokenize_one(text, tokenizer)
        if len(toks) != 1:
            return None
        syns = norm_map.get(toks[0])
        if not syns:
            return None
        return SynonymQuery(tuple([(toks[0], 1.0)] + syns), boost=boost)

    def walk(q):
        if isinstance(q, str):
            if len(q.split()) == 1:
                return leaf(q, 1.0) or q
            return q
        if isinstance(q, TermQuery):
            return leaf(q.term, float(q.boost)) or q
        if isinstance(q, PhraseQuery):
            if len(q.text.split()) == 1 and int(q.slop) == 0:
                return leaf(q.text, float(q.boost)) or q
            return q
        if isinstance(q, BooleanQuery):
            return replace(q, **{role: tuple(walk(c) for c in
                                             getattr(q, role))
                                 for role in ("must", "should",
                                              "must_not", "filter")})
        if isinstance(q, DisMaxQuery):
            return replace(q, clauses=tuple(walk(c) for c in q.clauses))
        if isinstance(q, FieldedQuery):
            return FieldedQuery(q.field, walk(q.query))
        if isinstance(q, ConstantScoreQuery):
            return ConstantScoreQuery(walk(q.query), boost=q.boost)
        return q

    return walk(query)
