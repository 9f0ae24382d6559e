"""Safe arithmetic-expression evaluation for ExprFeature.

Replaces the reference's raw ``eval()`` of the expression DSL
(easy_rec/python/input/input.py:507, utils/expr_util.py) with a
whitelisted AST interpreter over numpy arrays.
"""

from __future__ import annotations

import ast
import operator
from typing import Dict

import numpy as np

_BINOPS = {
    ast.Add: operator.add,
    ast.Sub: operator.sub,
    ast.Mult: operator.mul,
    ast.Div: operator.truediv,
    ast.FloorDiv: operator.floordiv,
    ast.Mod: operator.mod,
    ast.Pow: operator.pow,
}

_UNARYOPS = {
    ast.USub: operator.neg,
    ast.UAdd: operator.pos,
}

_CMPOPS = {
    ast.Gt: operator.gt,
    ast.GtE: operator.ge,
    ast.Lt: operator.lt,
    ast.LtE: operator.le,
    ast.Eq: operator.eq,
    ast.NotEq: operator.ne,
}

_FUNCS = {
    'log': np.log,
    'log1p': np.log1p,
    'exp': np.exp,
    'abs': np.abs,
    'sqrt': np.sqrt,
    'min': np.minimum,
    'max': np.maximum,
    'sign': np.sign,
    'floor': np.floor,
    'ceil': np.ceil,
    'sigmoid': lambda x: 1.0 / (1.0 + np.exp(-x)),
}


def evaluate(expression: str, variables: Dict[str, np.ndarray]):
  """Evaluate an arithmetic expression over named numpy arrays."""
  tree = ast.parse(expression, mode='eval')
  return _eval(tree.body, variables)


def _eval(node, variables):
  if isinstance(node, ast.BinOp):
    op = _BINOPS.get(type(node.op))
    if op is None:
      raise ValueError('unsupported operator %s' % type(node.op).__name__)
    return op(_eval(node.left, variables), _eval(node.right, variables))
  if isinstance(node, ast.UnaryOp):
    op = _UNARYOPS.get(type(node.op))
    if op is None:
      raise ValueError('unsupported operator %s' % type(node.op).__name__)
    return op(_eval(node.operand, variables))
  if isinstance(node, ast.Compare):
    if len(node.ops) != 1:
      raise ValueError('chained comparisons unsupported')
    op = _CMPOPS.get(type(node.ops[0]))
    if op is None:
      raise ValueError('unsupported comparison')
    return op(_eval(node.left, variables),
              _eval(node.comparators[0], variables)).astype(np.float32)
  if isinstance(node, ast.Call):
    if not isinstance(node.func, ast.Name) or node.func.id not in _FUNCS:
      raise ValueError('unsupported function call')
    args = [_eval(a, variables) for a in node.args]
    return _FUNCS[node.func.id](*args)
  if isinstance(node, ast.Name):
    if node.id not in variables:
      raise KeyError('unknown variable %r in expression' % node.id)
    return variables[node.id]
  if isinstance(node, ast.Constant):
    if isinstance(node.value, (int, float)):
      return node.value
    raise ValueError('unsupported constant %r' % node.value)
  if isinstance(node, ast.IfExp):
    cond = _eval(node.test, variables)
    return np.where(cond, _eval(node.body, variables),
                    _eval(node.orelse, variables))
  raise ValueError('unsupported expression node %s' % type(node).__name__)
