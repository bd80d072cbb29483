"""Module-level expression eval (``pd.eval`` parity).

Reference: ``mars/dataframe/base/eval.py:417`` (``mars_eval``) — Mars
parses the expression string with a Python AST visitor
(``CollectionVisitor``, ``base/eval.py:230``), resolves names against
the caller's scope (or ``local_dict``/``global_dict``), and REBUILDS
the expression over Mars objects so the ordinary operator overloads
produce the lazy graph. Same design here: names resolve to engine
DataFrames/Series (or plain scalars), and each AST node applies the
engine's own operator overloads — which already perform index
alignment for cross-frame arithmetic (``operators/align.py``) — so
the whole expression collapses into one Catalyst projection exactly
like hand-written operator chains do.

Only the expression subset both pandas and Mars accept is supported:
arithmetic / comparison / boolean operators, unary ops, attribute and
subscript access, and literals. Function calls are rejected (Mars
routes those through the normal API surface, not eval strings).
"""

from __future__ import annotations

import ast
import operator
import sys

_BINOPS = {
    ast.Add: operator.add,
    ast.Sub: operator.sub,
    ast.Mult: operator.mul,
    ast.Div: operator.truediv,
    ast.FloorDiv: operator.floordiv,
    ast.Mod: operator.mod,
    ast.Pow: operator.pow,
    ast.BitAnd: operator.and_,
    ast.BitOr: operator.or_,
    ast.BitXor: operator.xor,
}

_CMPOPS = {
    ast.Eq: operator.eq,
    ast.NotEq: operator.ne,
    ast.Lt: operator.lt,
    ast.LtE: operator.le,
    ast.Gt: operator.gt,
    ast.GtE: operator.ge,
}

_UNARYOPS = {
    ast.USub: operator.neg,
    ast.UAdd: operator.pos,
    ast.Invert: operator.invert,
}


class _Evaluator(ast.NodeVisitor):
    def __init__(self, names: dict):
        self._names = names

    def generic_visit(self, node):  # anything not whitelisted below
        raise ValueError(
            f"eval: unsupported syntax {type(node).__name__!r}")

    def visit_Expression(self, node):
        return self.visit(node.body)

    def visit_Constant(self, node):
        return node.value

    def visit_Name(self, node):
        try:
            return self._names[node.id]
        except KeyError:
            raise NameError(f"eval: name {node.id!r} is not defined")

    def visit_Attribute(self, node):
        obj = self.visit(node.value)
        return getattr(obj, node.attr)

    def visit_Subscript(self, node):
        obj = self.visit(node.value)
        return obj[self.visit(node.slice)]

    def visit_BinOp(self, node):
        try:
            op = _BINOPS[type(node.op)]
        except KeyError:
            raise ValueError(
                f"eval: unsupported operator {type(node.op).__name__!r}")
        return op(self.visit(node.left), self.visit(node.right))

    def visit_UnaryOp(self, node):
        if isinstance(node.op, ast.Not):
            return ~self.visit(node.operand)
        try:
            op = _UNARYOPS[type(node.op)]
        except KeyError:
            raise ValueError(
                f"eval: unsupported operator {type(node.op).__name__!r}")
        return op(self.visit(node.operand))

    def visit_BoolOp(self, node):
        # pandas eval maps and/or on boolean columns to &/| (element-wise)
        op = operator.and_ if isinstance(node.op, ast.And) else operator.or_
        out = self.visit(node.values[0])
        for v in node.values[1:]:
            out = op(out, self.visit(v))
        return out

    def visit_Compare(self, node):
        # chained comparisons (a < b <= c) -> (a < b) & (b <= c)
        left = self.visit(node.left)
        out = None
        for op_node, comp in zip(node.ops, node.comparators):
            try:
                op = _CMPOPS[type(op_node)]
            except KeyError:
                raise ValueError(
                    f"eval: unsupported comparison "
                    f"{type(op_node).__name__!r}")
            right = self.visit(comp)
            piece = op(left, right)
            out = piece if out is None else (out & piece)
            left = right
        return out

    def visit_Call(self, node):
        raise ValueError(
            "eval: function calls are not supported — use the API "
            "surface directly (mars/dataframe/base/eval.py routes the "
            "same way)")


def mars_eval(expr: str, local_dict: dict | None = None,
              global_dict: dict | None = None):
    """Evaluate ``expr`` over engine objects resolved from the caller's
    scope (``pd.eval`` name resolution: ``local_dict`` overrides the
    calling frame's locals, which override its globals /
    ``global_dict``). Returns whatever the expression tree yields — an
    engine Series/DataFrame for column arithmetic, a scalar for pure
    literals."""
    if not isinstance(expr, str):
        raise TypeError("eval: expr must be a string")
    caller = sys._getframe(1)
    # mirror pd.eval resolution order without holding the frame alive
    names: dict = {}
    names.update(global_dict if global_dict is not None
                 else caller.f_globals)
    names.update(caller.f_locals)
    if local_dict is not None:
        names.update(local_dict)
    del caller
    tree = ast.parse(expr, mode="eval")
    return _Evaluator(names).visit(tree)
