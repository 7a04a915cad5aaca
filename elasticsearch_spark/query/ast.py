"""query_string parser → query AST → engine plan (SURVEY.md §2.3, §7.3).

Reference: index/query/QueryStringQueryParser.java (reg. IndicesQueriesModule
:78) parses the Lucene syntax into a BooleanQuery tree. We support the
practically-used subset over the transcript/document schema:

    error timeout                      # default OR of terms
    +error -timeout                    # required / prohibited
    error AND timeout, a OR b, NOT c   # boolean operators
    (error OR timeout) AND retry       # one nesting level of OR groups
    "exact phrase"  "sloppy phrase"~2  # phrases (positional index)
    role:assistant tool:bash           # keyword-field filters (non-scoring)
    ts:[2025-01-01 TO 2025-02-01]      # range filter (open ends with *)
    n_chars:[100 TO *]                 # numeric range filter

Semantics (documented, mirrored by PyRefEngine.bool_query and the tests):
BooleanQuery scoring — score = Σ BM25 contributions of every matching term
of every positive clause + phrase scores; must clauses are required, must_not
exclude, keyword/range clauses are filter context (never scored). A
parenthesized OR group under AND is one must clause satisfied by any member.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass
class Clause:
    """One boolean clause: a set of alternative terms OR one phrase."""

    occur: str  # "must" | "should" | "must_not"
    terms: list[str] = field(default_factory=list)
    phrase: list[str] | None = None
    slop: int = 0


@dataclass
class ParsedQuery:
    clauses: list[Clause] = field(default_factory=list)
    filters: list[tuple[str, str, object]] = field(default_factory=list)
    # (field, op, value) with op in {"eq", "gte", "lte"}

    def filter_cond(self) -> Column | None:
        cond = None
        for fld, op, val in self.filters:
            c = {
                "eq": F.col(fld) == val,
                "gte": F.col(fld) >= val,
                "lte": F.col(fld) <= val,
            }[op]
            cond = c if cond is None else (cond & c)
        return cond


_TOKEN_RX = re.compile(
    r"""\s*(?:
        (?P<lpar>\() | (?P<rpar>\)) |
        (?P<and>AND\b) | (?P<or>OR\b) | (?P<not>NOT\b) |
        (?P<plus>\+) | (?P<minus>-) |
        (?P<phrase>"(?P<ph>[^"]*)"(?:~(?P<slop>\d+))?) |
        (?P<range>(?P<rfield>[A-Za-z_][\w.]*):\[(?P<lo>[^\]\s]+)\s+TO\s+(?P<hi>[^\]\s]+)\]) |
        (?P<fterm>(?P<ffield>[A-Za-z_][\w.]*):(?P<fval>[^\s()]+)) |
        (?P<term>[^\s()]+)
    )""",
    re.VERBOSE,
)

# fields that are filter context (keyword / numeric / time columns); anything
# else after ':' is treated as a text sub-field query on the analyzed column
TEXT_FIELD = "text"


def tokenize_query(q: str) -> list[tuple[str, dict]]:
    out, i = [], 0
    while i < len(q):
        m = _TOKEN_RX.match(q, i)
        if not m or m.end() == i:
            break
        i = m.end()
        kind = m.lastgroup if m.lastgroup else "term"
        for k in ("lpar", "rpar", "and", "or", "not", "plus", "minus",
                  "phrase", "range", "fterm", "term"):
            if m.group(k):
                out.append((k, m.groupdict()))
                break
    return out


def _coerce(val: str):
    if val == "*":
        return None
    try:
        return int(val)
    except ValueError:
        pass
    try:
        return float(val)
    except ValueError:
        return val


def parse_query_string(
    q: str,
    analyzer_tokenize,
    filter_fields: set[str] = frozenset({"role", "tool", "conv_id", "ts"}),
) -> ParsedQuery:
    """Parse the syntax subset into clauses + filters.

    ``analyzer_tokenize(text) -> list[str]`` is the same analysis chain used
    at index time (terms must agree with the index).
    Grammar is flat with one nesting level: a parenthesized group becomes a
    single clause whose terms are the group members (any-of). Explicit AND
    promotes both neighbours to must; OR keeps should; NOT/-/+ mark the next
    clause. Default operator between bare clauses is OR (MatchQuery default).
    """
    toks = tokenize_query(q)
    pq = ParsedQuery()
    pending_occur: str | None = None
    promote_next = False  # after AND: next clause is must
    i = 0

    def add_clause(c: Clause):
        nonlocal pending_occur, promote_next
        if pending_occur:
            c.occur = pending_occur
        elif promote_next:
            c.occur = "must"
        pq.clauses.append(c)
        pending_occur = None
        promote_next = False

    while i < len(toks):
        kind, g = toks[i]
        if kind == "plus":
            pending_occur = "must"
        elif kind in ("minus", "not"):
            pending_occur = "must_not"
        elif kind == "and":
            # promote the nearest preceding SHOULD clause and the next one;
            # skip over must_not clauses ('a -b AND c' promotes 'a', matching
            # Lucene) and stop early at an already-promoted must clause
            for prev in reversed(pq.clauses):
                if prev.occur == "should":
                    prev.occur = "must"
                    break
                if prev.occur == "must":
                    break
            promote_next = True
        elif kind == "or":
            pass  # should is the default
        elif kind == "lpar":
            group_terms: list[str] = []
            i += 1
            while i < len(toks) and toks[i][0] != "rpar":
                tk, tg = toks[i]
                if tk == "term":
                    group_terms.extend(analyzer_tokenize(tg["term"]))
                i += 1
            add_clause(Clause("should", terms=group_terms))
        elif kind == "phrase":
            words = analyzer_tokenize(g["ph"])
            add_clause(
                Clause("should", phrase=words, slop=int(g["slop"] or 0))
            )
        elif kind == "range":
            fld = g["rfield"]
            lo, hi = _coerce(g["lo"]), _coerce(g["hi"])
            if lo is not None:
                pq.filters.append((fld, "gte", lo))
            if hi is not None:
                pq.filters.append((fld, "lte", hi))
            pending_occur = None
        elif kind == "fterm":
            fld, val = g["ffield"], g["fval"]
            if fld in filter_fields:
                pq.filters.append((fld, "eq", val))
                pending_occur = None
            else:  # text sub-field query
                add_clause(Clause("should", terms=analyzer_tokenize(val)))
        elif kind == "term":
            terms = analyzer_tokenize(g["term"])
            if terms:
                add_clause(Clause("should", terms=terms))
            else:
                pending_occur = None
        i += 1
    return pq
