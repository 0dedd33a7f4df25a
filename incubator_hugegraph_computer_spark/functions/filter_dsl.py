"""SpreadFilter expression DSL — config-string parity for the filtered
path algorithms.

The reference's ``RingsDetectionWithFilter`` takes a JSON config
(``rings.property_filter``) of shape::

    {"vertex_filter": [{"label": "person",
                        "property_filter": "$element.age > 20"}],
     "edge_filter":   [{"label": "*",
                        "property_filter": "$element.weight > 0.5
                                            && $message.weight <= $element.weight"}]}

parsed by ``rings/filter/FilterDescribe.java`` and compiled per-item
with MVEL by ``rings/filter/SpreadFilter.java:54-76``. ``$element``
binds the vertex/edge being tested, ``$message`` the walk edge's
properties carried in ``RingsDetectionMessage.walkEdgeProp``. Dispatch
rules (``SpreadFilter.expressions``, ``:126-140``):

* empty filter list -> everything passes;
* an item applies only to elements of its ``label`` (``"*"`` -> all);
* when both a ``"*"`` item and a label item apply, BOTH must pass
  (``allMatch``); duplicate labels keep the last item (HashMap ``put``);
* the no-message edge filter (used by ``compute0``,
  ``SpreadFilter.java:56-59``) keeps only items whose expression does
  not mention ``$message`` (the reference also admits ``"*"`` items
  that DO mention it — flagged TODO in-source since executing one
  without a message binding faults; this port takes the sane reading
  and excludes them).

This module compiles the practical MVEL subset those configs use —
comparisons, arithmetic, ``&&``/``||``/``!``, parentheses,
string/number/bool/null literals, ``$element.prop``/``$message.prop``
references — into pyspark ``Column`` expressions, so the whole
predicate evaluates JVM-side inside the frontier join (no Python in the
hot path).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, functions as F

Resolver = Callable[[str], Column]

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<num>\d+\.\d+|\d+)
      | (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
      | (?P<ref>\$(?:element|message)\.[A-Za-z_][A-Za-z0-9_]*)
      | (?P<word>true|false|null|[A-Za-z_][A-Za-z0-9_]*)
      | (?P<op>&&|\|\||==|!=|<=|>=|[!<>+\-*/%()])
    )""",
    re.VERBOSE,
)


def _tokenize(expr: str) -> list[tuple[str, str]]:
    toks, pos = [], 0
    while pos < len(expr):
        m = _TOKEN_RE.match(expr, pos)
        if not m or m.end() == pos:
            if expr[pos:].strip():
                raise ValueError(f"unparseable MVEL at {expr[pos:]!r}")
            break
        pos = m.end()
        for kind in ("num", "str", "ref", "word", "op"):
            v = m.group(kind)
            if v is not None:
                toks.append((kind, v))
                break
    return toks


class _Parser:
    """Recursive-descent over the token list; every production returns a
    pyspark Column, so precedence is fixed at compile time (MVEL/Java
    order: unary ! > * / % > + - > comparisons > && > ||)."""

    def __init__(self, toks: list[tuple[str, str]], element: Resolver,
                 message: Resolver | None):
        self.toks = toks
        self.i = 0
        self.element = element
        self.message = message

    def peek(self) -> tuple[str, str] | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self, want: str | None = None):
        tok = self.peek()
        if tok is None or (want is not None and tok[1] != want):
            raise ValueError(f"expected {want!r}, got {tok!r}")
        self.i += 1
        return tok

    def parse(self) -> Column:
        col = self.or_expr()
        if self.peek() is not None:
            raise ValueError(f"trailing tokens from {self.peek()!r}")
        return col

    def or_expr(self) -> Column:
        col = self.and_expr()
        while self.peek() == ("op", "||"):
            self.take()
            col = col | self.and_expr()
        return col

    def and_expr(self) -> Column:
        col = self.cmp_expr()
        while self.peek() == ("op", "&&"):
            self.take()
            col = col & self.cmp_expr()
        return col

    def cmp_expr(self) -> Column:
        col = self.add_expr()
        tok = self.peek()
        if tok and tok[0] == "op" and tok[1] in ("==", "!=", "<", "<=", ">", ">="):
            self.take()
            rhs = self.add_expr()
            op = tok[1]
            if op == "==":
                return col == rhs
            if op == "!=":
                return col != rhs
            if op == "<":
                return col < rhs
            if op == "<=":
                return col <= rhs
            if op == ">":
                return col > rhs
            return col >= rhs
        return col

    def add_expr(self) -> Column:
        col = self.mul_expr()
        while True:
            tok = self.peek()
            if tok and tok[0] == "op" and tok[1] in ("+", "-"):
                self.take()
                rhs = self.mul_expr()
                col = col + rhs if tok[1] == "+" else col - rhs
            else:
                return col

    def mul_expr(self) -> Column:
        col = self.unary()
        while True:
            tok = self.peek()
            if tok and tok[0] == "op" and tok[1] in ("*", "/", "%"):
                self.take()
                rhs = self.unary()
                col = (col * rhs if tok[1] == "*"
                       else col / rhs if tok[1] == "/" else col % rhs)
            else:
                return col

    def unary(self) -> Column:
        tok = self.peek()
        if tok == ("op", "!"):
            self.take()
            return ~self.unary()
        if tok == ("op", "-"):
            self.take()
            return -self.unary()
        return self.primary()

    def primary(self) -> Column:
        kind, val = self.take()
        if kind == "num":
            return F.lit(float(val) if "." in val else int(val))
        if kind == "str":
            body = val[1:-1]
            return F.lit(re.sub(r"\\(.)", r"\1", body))
        if kind == "ref":
            ns, prop = val[1:].split(".", 1)
            if ns == "element":
                return self.element(prop)
            if self.message is None:
                raise ValueError(
                    "$message is not bound in this context "
                    "(vertex / first-hop edge filter)"
                )
            return self.message(prop)
        if kind == "word":
            if val == "true":
                return F.lit(True)
            if val == "false":
                return F.lit(False)
            if val == "null":
                return F.lit(None)
            raise ValueError(f"unsupported identifier {val!r}")
        if val == "(":
            col = self.or_expr()
            self.take(")")
            return col
        raise ValueError(f"unexpected token {val!r}")


def compile_mvel(expr: str, element: Resolver,
                 message: Resolver | None = None) -> Column:
    """Compile one MVEL property-filter expression to a Column.
    ``element``/``message`` map a property name to the Column holding it
    in the frame the predicate will run against."""
    return _Parser(_tokenize(expr), element, message).parse()


def mentions_message(expr: str) -> bool:
    """The reference's literal rule: ``expression.contains("$message")``
    (SpreadFilter.java:57-59)."""
    return "$message" in expr


@dataclass
class FilterItem:
    label: str
    expr: str


class SpreadFilterSpec:
    """Parsed FilterDescribe (vertex_filter + edge_filter item lists)."""

    def __init__(self, describe: str | dict):
        des = json.loads(describe) if isinstance(describe, str) else (describe or {})
        self.vertex_items = self._items(des.get("vertex_filter"))
        self.edge_items = self._items(des.get("edge_filter"))

    @staticmethod
    def _items(raw) -> list[FilterItem]:
        items: dict[str, FilterItem] = {}
        for d in raw or []:
            # label/property_filter are both @JsonProperty(required=true)
            items[d["label"]] = FilterItem(d["label"], d["property_filter"])
        return list(items.values())  # last-wins per label, like HashMap.put

    @staticmethod
    def _combine(items: list[FilterItem], element: Resolver,
                 message: Resolver | None, label_col: Column | None) -> Column:
        if not items:
            return F.lit(True)
        col = F.lit(True)
        for item in items:
            pred = compile_mvel(item.expr, element, message)
            if item.label != "*":
                if label_col is None:
                    raise ValueError(
                        f"filter targets label {item.label!r} but the frame "
                        "has no label column"
                    )
                pred = F.when(label_col == F.lit(item.label), pred).otherwise(
                    F.lit(True)
                )
            col = col & pred
        return col

    def vertex_filter(self, element: Resolver,
                      label_col: Column | None = None) -> Column:
        return self._combine(self.vertex_items, element, None, label_col)

    def edge_filter(self, element: Resolver,
                    label_col: Column | None = None) -> Column:
        """compute0 / no-message context: only items whose expression
        never mentions $message (see module docstring on the reference's
        '*' TODO quirk)."""
        items = [i for i in self.edge_items if not mentions_message(i.expr)]
        return self._combine(items, element, None, label_col)

    def edge_spread_filter(self, element: Resolver, message: Resolver,
                           label_col: Column | None = None) -> Column:
        return self._combine(self.edge_items, element, message, label_col)

    def message_props(self) -> list[str]:
        """Property names the spread expressions read from $message —
        exactly what the frontier must carry between hops."""
        props = set()
        for item in self.edge_items:
            for m in re.finditer(r"\$message\.([A-Za-z_][A-Za-z0-9_]*)", item.expr):
                props.add(m.group(1))
        return sorted(props)

    def edge_element_props(self) -> list[str]:
        """Property names the edge expressions read from $element —
        exactly what the edge frame must project (lets callers prune a
        properties map down to the referenced scalars)."""
        props = set()
        for item in self.edge_items:
            for m in re.finditer(r"\$element\.([A-Za-z_][A-Za-z0-9_]*)", item.expr):
                props.add(m.group(1))
        return sorted(props)
