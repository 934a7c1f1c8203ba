"""Operator layer: the pytree LinearOperator protocol and its implementations.

See `base` for the protocol, `sparse` for COO/CSR/BSR, and `special_ops` for
MatrixFunction / Toeplitz / spectrum normalization.
"""

from .base import (
	AdjointOperator,
	AffineOperator,
	ComposedOperator,
	DeflatedOperator,
	DenseOperator,
	FunctionOperator,
	LinearOperator,
	aslinop,
	is_linear_op,
	is_valid_operator,
	matmat,
	quad_form,
)
from .prepare import PrepInfo, auto_operator, bandwidth, reorder_rcm
from .sparse import BSROperator, COOOperator, CSROperator, DIAOperator, GramOperator
from .special_ops import MatrixFunction, ScaledOperator, Toeplitz, matrix_function, normalize_unit

__all__ = [
	"AdjointOperator",
	"AffineOperator",
	"ComposedOperator",
	"BSROperator",
	"COOOperator",
	"CSROperator",
	"DIAOperator",
	"DeflatedOperator",
	"DenseOperator",
	"FunctionOperator",
	"GramOperator",
	"LinearOperator",
	"MatrixFunction",
	"PrepInfo",
	"ScaledOperator",
	"Toeplitz",
	"aslinop",
	"auto_operator",
	"bandwidth",
	"is_linear_op",
	"is_valid_operator",
	"matmat",
	"matrix_function",
	"normalize_unit",
	"quad_form",
	"reorder_rcm",
]
