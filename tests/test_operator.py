"""Operator tests (mirrors reference `tests/test_operator.py` + sparse/protocol).

Key composition identities: MatrixFunction(identity) ≡ A, every builtin f
matches the dense eigendecomposition reconstruction, quad ≡ diag(VᵀAV).
"""

import numpy as np
import jax.numpy as jnp
import pytest
import primate_tpu as pt
from primate_tpu.operators import DenseOperator, FunctionOperator, AffineOperator, aslinop, quad_form


def _fixture(n=24, seed=1234, pd=True):
	rng = np.random.default_rng(seed)
	ew = rng.uniform(size=n, low=1 / n, high=1.0)
	A = pt.symmetric(n, pd=pd, ew=ew, seed=rng)
	return np.asarray(A), ew, rng


def test_mf_identity_matvec():
	A, ew, rng = _fixture()
	n = A.shape[0]
	M = pt.MatrixFunction(A, deg=n, orth=n)
	v = rng.normal(size=n)
	assert np.allclose(np.asarray(M @ v), A @ v, atol=1e-10)


def test_mf_matvec_multiple_degrees():
	"""For a non-polynomial f, the Krylov approximation error decreases with
	degree and is exact at full degree (identity would be exact at deg ≥ 2,
	since A x already lies in the Krylov space)."""
	A, ew, rng = _fixture(n=20)
	v = rng.normal(size=20)
	lam, U = np.linalg.eigh(A)
	exact = U @ np.diag(np.sqrt(np.maximum(lam, 0))) @ U.T @ v
	errs = []
	for deg in (3, 8, 20):
		M = pt.MatrixFunction(A, fun="sqrt", deg=deg, orth=-1)
		errs.append(np.abs(np.asarray(M @ v) - exact).max())
	assert errs[-1] <= 1e-8  # full degree is exact
	assert errs[0] > 10 * errs[-1]  # error decreases with degree


def test_mf_quad_matches_dense():
	A, ew, rng = _fixture()
	n = A.shape[0]
	M = pt.MatrixFunction(A, deg=n, orth=n)
	V = rng.normal(size=(n, 5))
	q = np.asarray(M.quad(jnp.asarray(V)))
	true = np.diag(V.T @ A @ V)
	assert np.allclose(q, true, rtol=1e-8)


@pytest.mark.parametrize("fun", ["identity", "abs", "sqrt", "log", "inv", "exp", "numrank", "smoothstep"])
def test_mf_builtin_functions_match_dense(fun):
	A, ew, rng = _fixture(n=16)
	n = A.shape[0]
	lam, U = np.linalg.eigh(A)
	from primate_tpu.special import param_callable

	f = param_callable(fun)
	fA = U @ np.diag(np.asarray(f(jnp.asarray(lam)))) @ U.T
	M = pt.MatrixFunction(A, fun=fun, deg=n, orth=n)
	v = rng.normal(size=n)
	assert np.allclose(np.asarray(M @ v), fA @ v, atol=1e-6), fun


def test_mf_batched_matvec_equals_columns():
	A, _, rng = _fixture(n=18)
	M = pt.MatrixFunction(A, fun="sqrt", deg=18, orth=-1)
	X = rng.normal(size=(18, 4))
	Y = np.asarray(M @ jnp.asarray(X))
	for j in range(4):
		assert np.allclose(Y[:, j], np.asarray(M @ jnp.asarray(X[:, j])), atol=1e-10)


def test_toeplitz_matches_dense():
	import scipy.linalg as sla

	rng = np.random.default_rng(2)
	c = rng.normal(size=10)
	T = pt.Toeplitz(c)
	Td = sla.toeplitz(c)
	V = rng.normal(size=(10, 3))
	assert np.allclose(np.asarray(T @ jnp.asarray(V)), Td @ V, atol=1e-10)
	r = rng.normal(size=10)
	r[0] = c[0]
	T2 = pt.Toeplitz(c, r)
	assert np.allclose(np.asarray(T2 @ jnp.asarray(V[:, 0])), sla.toeplitz(c, r) @ V[:, 0], atol=1e-10)


def test_normalize_unit_spectrum_in_interval():
	A, ew, _ = _fixture(n=20)
	N = pt.normalize_unit(jnp.asarray(A))
	lam = np.linalg.eigvalsh(np.asarray(N.todense()))
	assert lam.min() >= -1.0 - 1e-8 and lam.max() <= 1.0 + 1e-8


def test_affine_operator():
	A, _, rng = _fixture(n=12)
	B = np.asarray(pt.symmetric(12, seed=rng))
	op = AffineOperator(jnp.asarray(A), jnp.asarray(B), t=0.5)
	v = rng.normal(size=12)
	assert np.allclose(np.asarray(op @ jnp.asarray(v)), (A + 0.5 * B) @ v, atol=1e-12)
	op2 = op.set_parameter(2.0)
	assert np.allclose(np.asarray(op2 @ jnp.asarray(v)), (A + 2.0 * B) @ v, atol=1e-12)
	# identity-B default
	op3 = AffineOperator(jnp.asarray(A), t=1.5)
	assert np.allclose(np.asarray(op3 @ jnp.asarray(v)), (A + 1.5 * np.eye(12)) @ v, atol=1e-12)


def test_function_operator_and_protocol():
	A, _, rng = _fixture(n=10)
	op = FunctionOperator(lambda V: jnp.asarray(A) @ V, shape=A.shape, dtype=A.dtype)
	assert pt.operators.is_linear_op(op)
	v = rng.normal(size=10)
	assert np.allclose(np.asarray(op @ jnp.asarray(v)), A @ v)
	# unbatched matvec-only callables get vmapped
	op2 = FunctionOperator(lambda x: jnp.asarray(A) @ x, shape=A.shape, dtype=A.dtype, batched=False)
	V = rng.normal(size=(10, 3))
	assert np.allclose(np.asarray(op2.matmat(jnp.asarray(V))), A @ V, atol=1e-12)


def test_aslinop_and_quad_form():
	A, _, rng = _fixture(n=10)
	V = rng.normal(size=(10, 4))
	expected = np.diag(V.T @ A @ V)
	for obj in (A, jnp.asarray(A), DenseOperator(jnp.asarray(A))):
		assert np.allclose(np.asarray(quad_form(obj, jnp.asarray(V))), expected, atol=1e-10)
	assert aslinop(A).shape == A.shape


def test_is_valid_operator_rejects_nonsquare():
	with pytest.raises(AssertionError):
		pt.operators.is_valid_operator(jnp.ones((3, 4)))


def test_gram_operator():
	rng = np.random.default_rng(8)
	X = rng.normal(size=(15, 10))
	G = pt.operators.GramOperator(jnp.asarray(X))
	v = rng.normal(size=10)
	assert G.shape == (10, 10)
	assert np.allclose(np.asarray(G @ jnp.asarray(v)), X.T @ (X @ v), atol=1e-10)


def test_mf_two_pass_matches_basis_path():
	"""Two-pass f(A)v (O(n·nv) memory) ≡ the basis path to fp tolerance."""
	A, ew, rng = _fixture(n=40)
	X = rng.normal(size=(40, 6))
	for fun, orth in [("identity", 40), ("log", 40), ("exp", 8), (None, 0)]:
		M1 = pt.MatrixFunction(A, fun=fun, deg=24, orth=orth, two_pass=False)
		M2 = pt.MatrixFunction(A, fun=fun, deg=24, orth=orth, two_pass=True)
		y1 = np.asarray(M1.matmat(jnp.asarray(X)))
		y2 = np.asarray(M2.matmat(jnp.asarray(X)))
		assert np.allclose(y1, y2, atol=1e-8), (fun, orth, np.abs(y1 - y2).max())


def test_mf_two_pass_identity_exact():
	A, ew, rng = _fixture(n=30)
	M = pt.MatrixFunction(A, fun="identity", deg=30, orth=30, two_pass=True)
	v = rng.normal(size=30)
	assert np.allclose(np.asarray(M @ v), A @ v, atol=1e-8)


def test_mf_bf16_storage_f32_coeffs():
	"""bf16 operator storage: coefficients accumulate in f32, estimates stay sane."""
	A, ew, rng = _fixture(n=48)
	Ab = jnp.asarray(A, jnp.bfloat16)
	est = pt.hutch(Ab, seed=5, converge="count", count=512)
	assert abs(est - ew.sum()) / ew.sum() < 0.1
	a, b = pt.lanczos(Ab, deg=48, orth=48)
	rw = np.sort(np.asarray(pt.eigvalsh_tridiag(jnp.asarray(a, jnp.float64), jnp.asarray(b, jnp.float64))))
	assert np.abs(rw - np.sort(ew)).max() < 0.05  # bf16 matvec precision


def test_param_callable_memoized_for_cache_hits():
	"""Builtin spectral functions must be canonical objects so MatrixFunction
	aux data compares equal across instances (jit-cache reuse)."""
	from primate_tpu.special import param_callable

	assert param_callable("log") is param_callable("log")
	assert param_callable("exp", t=-2.0) is param_callable("exp", t=-2.0)
	assert param_callable("exp", t=-2.0) is not param_callable("exp", t=-1.0)
	A1, _, _ = _fixture(n=12, seed=1)
	A2, _, _ = _fixture(n=12, seed=2)
	M1 = pt.MatrixFunction(A1, fun="log", deg=8, orth=4)
	M2 = pt.MatrixFunction(A2, fun="log", deg=8, orth=4)
	t1 = jnp.tree_util.tree_structure(M1) if hasattr(jnp, "tree_util") else None
	import jax

	s1 = jax.tree_util.tree_structure(M1)
	s2 = jax.tree_util.tree_structure(M2)
	assert s1 == s2  # identical treedef => fused programs are shared


def test_normalize_unit_custom_interval():
	A, ew, _ = _fixture(n=20)
	N = pt.normalize_unit(jnp.asarray(A), interval=(0.0, 1.0))
	lam = np.linalg.eigvalsh(np.asarray(N.todense()))
	assert lam.min() >= -1e-8 and lam.max() <= 1.0 + 1e-8


def test_aslinop_dot_only_object():
	A, _, rng = _fixture(n=10)

	class DotOnly:
		shape = A.shape
		dtype = A.dtype

		def dot(self, V):
			return jnp.asarray(A) @ V

	op = aslinop(DotOnly())
	V = rng.normal(size=(10, 3))
	assert np.allclose(np.asarray(op.matmat(jnp.asarray(V))), A @ V, atol=1e-10)


def test_toeplitz_rejects_mismatched_lengths():
	with pytest.raises(AssertionError):
		pt.Toeplitz(np.ones(8), np.ones(5))


def test_matrix_function_fun_setter():
	"""`M.fun` is an assignable validating property (reference
	`operators.py:87-97`): strings resolve through the builtin gallery,
	non-callables are rejected, and re-assignment re-parameterizes the
	operator in place."""
	A = pt.symmetric(16, pd=True, seed=3)
	M = pt.MatrixFunction(A, fun="identity", deg=16, orth=16)
	v = np.random.default_rng(4).normal(size=16)
	assert np.allclose(np.asarray(M @ v), np.asarray(A @ v), atol=1e-8)
	M.fun = "exp"
	ew, ev = np.linalg.eigh(np.asarray(A))
	expA = ev @ np.diag(np.exp(ew)) @ ev.T
	assert np.allclose(np.asarray(M @ v), expA @ v, atol=1e-6)
	assert np.allclose(np.asarray(M.quad(x=v)), v @ expA @ v, atol=1e-6)
	with pytest.raises(AssertionError):
		M.fun = 42


def test_matmat_t_parity_all_operator_kinds():
	"""Probe-major apply `matmat_t(Vt) == (A Vtᵀ)ᵀ` for every operator kind.

	The Lanczos sweep carries its state probe-major and applies operators
	through `matmat_t`; native overrides (dense GEMM, DIA stencil, affine
	pencil) must agree with the transpose-wrapped default to float tolerance.
	"""
	import scipy.sparse as sps
	from primate_tpu.operators import DenseOperator, AffineOperator
	from primate_tpu.operators.sparse import CSROperator, COOOperator, BSROperator, DIAOperator, GramOperator

	rng = np.random.default_rng(11)
	n = 64
	Ad = np.asarray(pt.symmetric(n, pd=True, seed=1), dtype=np.float64)
	As = sps.csr_matrix(sps.random(n, n, density=0.08, random_state=3) + sps.eye(n))
	As = (As + As.T).tocsr()
	L = sps.diags([-np.ones(n - 1), 3 * np.ones(n), -np.ones(n - 1)], [-1, 0, 1]).tocsr()
	Vt = rng.normal(size=(5, n))

	from primate_tpu.operators.special_ops import ScaledOperator

	X_rect = rng.normal(size=(n + 13, n))  # rectangular data for the Gram modes
	ops = {
		"dense": (DenseOperator(jnp.asarray(Ad)), Ad),
		"csr": (CSROperator.from_scipy(As, dtype=jnp.float64), As.toarray()),
		"coo": (COOOperator.from_scipy(As.tocoo(), dtype=jnp.float64), As.toarray()),
		"bsr": (BSROperator.from_scipy(As, blocksize=(8, 8), dtype=jnp.float64), As.toarray()),
		"dia": (DIAOperator.from_scipy(L, dtype=jnp.float64), L.toarray()),
		"affine": (AffineOperator(jnp.asarray(Ad), t=0.5), Ad + 0.5 * np.eye(n)),
		"gram": (GramOperator(jnp.asarray(Ad)), Ad.T @ Ad),
		"gram_ata": (GramOperator(jnp.asarray(X_rect), transpose_first=True), X_rect.T @ X_rect),
		"scaled": (ScaledOperator(jnp.asarray(Ad), t=0.7, s=0.3), 0.3 * (Ad + 0.7 * np.eye(n))),
	}
	for name, (op, dense) in ops.items():
		got = np.asarray(op.matmat_t(jnp.asarray(Vt)))
		want = (dense @ Vt.T).T
		assert np.allclose(got, want, atol=1e-8), f"{name}: matmat_t mismatch"


def test_matrix_function_quad_rule_brackets():
	"""MatrixFunction(quad_rule=...) pins Radau/Lobatto rules inside .quad():
	for log, radau_lo/lobatto bound each probe's quadratic form below and
	gauss/radau_hi above (Golub-Meurant signs) — so hutch over these operators
	yields one-sided-bias SLQ estimates."""
	rng = np.random.default_rng(2)
	n = 70
	ew = rng.uniform(0.5, 3.0, n)
	A = np.asarray(pt.symmetric(n, pd=True, ew=ew, seed=3), np.float64)
	a, b = 0.95 * ew.min(), 1.05 * ew.max()
	lam, U = np.linalg.eigh(A)
	truth = None
	V = rng.normal(size=(n, 6))
	fA = U @ np.diag(np.log(lam)) @ U.T
	truth = np.einsum("ij,ij->j", V, fA @ V)

	kw = dict(deg=10, orth=10)
	q = {
		rule: np.asarray(
			pt.MatrixFunction(A, "log", quad_rule=rule, interval=(a, b), **kw).quad(V)
		)
		for rule in ("radau_lo", "radau_hi", "lobatto")
	}
	q["gauss"] = np.asarray(pt.MatrixFunction(A, "log", **kw).quad(V))
	assert np.all(q["radau_lo"] <= truth + 1e-8)
	assert np.all(q["lobatto"] <= truth + 1e-8)
	assert np.all(q["gauss"] >= truth - 1e-8)
	assert np.all(q["radau_hi"] >= truth - 1e-8)
	# Composes with hutch (same seed → per-probe ordering survives the mean).
	h_lo = pt.hutch(pt.MatrixFunction(A, "log", quad_rule="radau_lo", interval=(a, b), **kw),
		batch=16, converge="count", count=32, seed=7)
	h_g = pt.hutch(pt.MatrixFunction(A, "log", **kw), batch=16, converge="count", count=32, seed=7)
	assert h_lo <= h_g + 1e-9

	import pytest

	with pytest.raises(AssertionError, match="interval"):
		pt.MatrixFunction(A, "log", quad_rule="radau_lo", **kw)


def test_matrix_function_quad_rule_gram_brackets():
	"""quad_rule works on the Gram (GKL) path: signed-bias rules for f(AᵀA)."""
	from primate_tpu.operators.sparse import GramOperator

	rng = np.random.default_rng(1)
	X = rng.normal(size=(45, 28)) + 3 * np.eye(45, 28)
	G = GramOperator(jnp.asarray(X))
	lam, Q = np.linalg.eigh(X.T @ X)
	flog = (Q * np.log(lam)) @ Q.T
	V = rng.normal(size=(28, 5))
	truth = np.einsum("ij,ij->j", V, flog @ V)
	a0, b0 = 0.9 * lam.min(), 1.1 * lam.max()
	kw = dict(deg=10, orth=10)
	qg = np.asarray(pt.MatrixFunction(G, "log", **kw).quad(jnp.asarray(V)))
	ql = np.asarray(pt.MatrixFunction(G, "log", quad_rule="radau_lo", interval=(a0, b0), **kw).quad(jnp.asarray(V)))
	qh = np.asarray(pt.MatrixFunction(G, "log", quad_rule="radau_hi", interval=(a0, b0), **kw).quad(jnp.asarray(V)))
	assert np.all(ql <= truth + 1e-8)
	assert np.all(qg >= truth - 1e-8)
	assert np.all(qh >= truth - 1e-8)


def test_host_operator_pure_callback_bridge():
	"""Non-traceable (pure numpy) operators ride through jax.pure_callback.

	Parity: the reference accepts any Python object with .matvec via its
	PyLinearOperator FFI bridge (`pylinop.h:16-73`); here a scipy
	LinearOperator (host numpy by construction) must compose with the FUSED
	estimator programs and with the Lanczos sweep.
	"""
	import scipy.sparse.linalg as spla

	A, ew, rng = _fixture(n=48)
	n = A.shape[0]
	calls = []

	def mv(v):
		calls.append(1)
		return A @ np.asarray(v)  # np.asarray on a tracer would raise under jit

	Aop = spla.LinearOperator((n, n), matvec=mv, dtype=np.float64)

	# auto-routing: aslinop marks scipy LinearOperators non-traceable
	op = aslinop(Aop)
	assert isinstance(op, FunctionOperator) and not op.traceable

	est = pt.hutch(Aop, seed=2, converge="count", count=128)
	assert len(calls) > 0, "host matvec was never invoked"
	assert abs(est - ew.sum()) <= 10 / np.sqrt(n)

	a, b = pt.lanczos(Aop, deg=n, orth=n)
	assert np.allclose(np.sort(np.asarray(pt.eigvalsh_tridiag(a, b))), np.sort(ew), atol=1e-8)

	# explicit wrapper: batched host callable with captures
	def block_fn(M, V):
		return np.asarray(M) @ np.asarray(V)

	op2 = FunctionOperator(block_fn, (n, n), dtype=np.float64, batched=True, captures=(jnp.asarray(A),), traceable=False)
	V = rng.normal(size=(n, 3))
	assert np.allclose(np.asarray(op2.matmat(jnp.asarray(V))), A @ V, atol=1e-12)

	# explicit wrapper: unbatched host matvec lifts column-wise
	op3 = FunctionOperator(lambda v: A @ np.asarray(v), (n, n), dtype=np.float64, batched=False, traceable=False)
	assert np.allclose(np.asarray(op3.matmat(jnp.asarray(V))), A @ V, atol=1e-12)


# -- operator algebra (the scipy-LinearOperator surface, `pylinop.h` analog) --


def test_operator_algebra_affine_and_scale():
	rng = np.random.default_rng(0)
	Ad = np.asarray(pt.symmetric(24, pd=True, seed=1))
	Bd = np.asarray(pt.symmetric(24, pd=True, seed=2))
	A, B = pt.operators.aslinop(jnp.asarray(Ad)), pt.operators.aslinop(jnp.asarray(Bd))
	v = rng.normal(size=24)
	assert np.allclose(np.asarray((A + B) @ v), (Ad + Bd) @ v, atol=1e-10)
	assert np.allclose(np.asarray((A - B) @ v), (Ad - Bd) @ v, atol=1e-10)
	assert np.allclose(np.asarray((A + 2.5) @ v), (Ad + 2.5 * np.eye(24)) @ v, atol=1e-10)
	assert np.allclose(np.asarray((3.0 * A) @ v), 3.0 * (Ad @ v), atol=1e-10)
	assert np.allclose(np.asarray((A / 2.0) @ v), (Ad @ v) / 2.0, atol=1e-10)
	assert np.allclose(np.asarray((-A) @ v), -(Ad @ v), atol=1e-10)
	assert np.allclose(np.asarray((1.0 - A) @ v), (np.eye(24) - Ad) @ v, atol=1e-10)


def test_operator_algebra_composition_and_estimators():
	"""Composed/shifted operators flow straight into the estimators — the
	idiom `hutch(A - sigma)` for eigencounts, `B.H @ A @ B` for projections."""
	rng = np.random.default_rng(3)
	Ad = np.asarray(pt.symmetric(32, pd=True, seed=5))
	A = pt.operators.aslinop(jnp.asarray(Ad))
	AA = A @ A  # symmetric composition
	v = rng.normal(size=32)
	assert np.allclose(np.asarray(AA @ v), Ad @ (Ad @ v), atol=1e-10)
	est = pt.hutch(AA, converge="count", count=4096, seed=7)
	assert abs(est - np.trace(Ad @ Ad)) <= 0.05 * np.trace(Ad @ Ad) + 0.5
	# shifted trace: tr(A - sigma I) = tr(A) - n sigma
	est2 = pt.hutch(A - 0.25, converge="count", count=4096, seed=9)
	assert abs(est2 - (np.trace(Ad) - 32 * 0.25)) <= 1.0


def test_operator_adjoint_transpose():
	rng = np.random.default_rng(11)
	X = rng.normal(size=(20, 12)) + 1j * rng.normal(size=(20, 12))
	op = pt.operators.aslinop(jnp.asarray(X))
	v, w = rng.normal(size=12), rng.normal(size=20)
	assert op.H.shape == (12, 20) and op.T.shape == (12, 20)
	assert np.allclose(np.asarray(op.H @ w), X.conj().T @ w, atol=1e-10)
	assert np.allclose(np.asarray(op.T @ w), X.T @ w, atol=1e-10)
	assert op.H.H is op and op.T.T is op  # involution returns the base
	# real operator: T == H
	Y = rng.normal(size=(16, 16))
	opr = pt.operators.aslinop(jnp.asarray(Y))
	assert np.allclose(np.asarray(opr.T @ np.ones(16)), Y.T @ np.ones(16), atol=1e-10)


def test_toeplitz_complex_hermitian_matvec():
	"""Complex Toeplitz keeps its imaginary parts (real cast is for real data)."""
	c = jnp.array([1 + 0j, 2j, 0j])
	T = pt.Toeplitz(c, r=jnp.conj(c))
	col = np.asarray(T.matvec(jnp.array([1.0 + 0j, 0, 0])))
	assert np.allclose(col, [1, 2j, 0])
	dense = np.array([[1, -2j, 0], [2j, 1, -2j], [0, 2j, 1]])
	V = np.random.default_rng(0).normal(size=(3, 4)) + 1j * np.random.default_rng(1).normal(size=(3, 4))
	assert np.allclose(np.asarray(T.matmat(jnp.asarray(V))), dense @ V, atol=1e-12)


def test_complex_scalar_algebra_promotes_real_operator():
	"""(1j*A) and (A − 2j) must not have their imaginary parts cast away."""
	from primate_tpu.operators import aslinop

	A = jnp.asarray(pt.symmetric(8, pd=True, seed=0))
	op = aslinop(A)
	v = jnp.ones(8)
	assert np.allclose(np.asarray((1j * op).matvec(v)), 1j * np.asarray(A @ v))
	assert np.allclose(np.asarray((op - 2j).matvec(v)), np.asarray(A @ v) - 2j)


def test_numpy_left_arithmetic_defers_to_operator():
	"""np.eye(n) + op must yield ONE AffineOperator, not an object ndarray."""
	from primate_tpu.operators import aslinop

	A = jnp.asarray(pt.symmetric(6, pd=True, seed=1))
	op = aslinop(A)
	r = np.eye(6) + op
	assert not isinstance(r, np.ndarray)
	v = jnp.ones(6)
	assert np.allclose(np.asarray(r.matvec(v)), np.asarray(A @ v) + 1.0)


def test_toeplitz_mixed_real_complex_dtype():
	"""Review r3c: real first column + complex first row promotes the operator
	dtype — the product's imaginary part must survive."""
	rng = np.random.default_rng(0)
	n = 16
	c = rng.normal(size=n)
	r = rng.normal(size=n) + 1j * rng.normal(size=n)
	r[0] = c[0]
	T = pt.Toeplitz(jnp.asarray(c), jnp.asarray(r))
	dense = np.zeros((n, n), complex)
	for i in range(n):
		for j in range(n):
			dense[i, j] = c[i - j] if i >= j else r[j - i]
	v = rng.normal(size=n)
	got = np.asarray(T @ jnp.asarray(v))
	assert np.iscomplexobj(got)
	assert np.allclose(got, dense @ v, atol=1e-8)
