// Reference-architecture SLQ baseline, compiled.
//
// The real reference package (scikit-primate) cannot be built in this
// environment (no pybind11/pythran/meson, Eigen submodule empty, zero network
// egress — see benchmarks/REFERENCE_BUILD.md). This file is the calibration
// stand-in the judge asked for: the reference's ARCHITECTURE — a serial
// per-probe Paige-A27 Lanczos recurrence over host CSR SpMV with a windowed
// MGS re-orthogonalization (the job `include/lanczos.h:89-148` +
// `eigen_operators.h:58-104` do) — written fresh in plain C++ and compiled
// with the same -O3 class of optimization Eigen gets, so the baseline pays
// ZERO Python-interpreter overhead per Lanczos step.
//
// Single-threaded on purpose: the reference dropped OpenMP in v0.5
// (docs/src/imate_compare.qmd:25 fn 3) and runs one probe at a time
// (src/primate/trace.py:114-115, operators.py:145-150).
//
// Build: g++ -O3 -march=native -shared -fPIC ref_native.cpp -o _ref_native.so
// Bound via ctypes from bench.py / benchmarks/ref_baseline.py.

#include <cstdint>
#include <cmath>
#include <cstring>
#include <vector>

namespace {

// splitmix64: tiny, well-mixed 64-bit generator for Rademacher probe bits.
inline uint64_t splitmix64(uint64_t& state) {
	uint64_t z = (state += 0x9E3779B97F4A7C15ULL);
	z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
	z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
	return z ^ (z >> 31);
}

inline void fill_rademacher(float* v, int64_t n, uint64_t seed) {
	uint64_t s = seed;
	int64_t i = 0;
	while (i < n) {
		uint64_t bits = splitmix64(s);
		for (int b = 0; b < 64 && i < n; ++b, ++i)
			v[i] = (bits >> b) & 1u ? 1.0f : -1.0f;
	}
}

inline void spmv_csr(int64_t n, const int64_t* indptr, const int32_t* indices,
                     const float* data, const float* x, float* y) {
	for (int64_t r = 0; r < n; ++r) {
		float acc = 0.0f;
		for (int64_t p = indptr[r]; p < indptr[r + 1]; ++p)
			acc += data[p] * x[indices[p]];
		y[r] = acc;
	}
}

inline double dot(const float* a, const float* b, int64_t n) {
	double acc = 0.0;
	for (int64_t i = 0; i < n; ++i) acc += double(a[i]) * double(b[i]);
	return acc;
}

inline void axpy(float alpha, const float* x, float* y, int64_t n) {
	for (int64_t i = 0; i < n; ++i) y[i] += alpha * x[i];
}

}  // namespace

extern "C" {

// One SLQ sweep pass: for each probe, run a degree-`deg` Lanczos recurrence
// with an `orth`-vector MGS ring window over the CSR operator; write per-probe
// (alphas, betas) row-major (probes x deg) and the squared probe norms.
// The Jacobi eigensolve + Gauss quadrature stays in the Python caller (LAPACK,
// exactly as the reference's tridiag.py does). Returns 0 on success.
int slq_sweep_csr_f32(int64_t n, const int64_t* indptr, const int32_t* indices,
                      const float* data, int32_t deg, int32_t orth,
                      int32_t probes, uint64_t seed, double* alphas,
                      double* betas, double* norms2) {
	if (n <= 0 || deg <= 0 || probes <= 0 || orth < 1) return 1;
	std::vector<float> q(n), q_prev(n), w(n);
	std::vector<float> ring(size_t(orth) * n, 0.0f);

	for (int32_t p = 0; p < probes; ++p) {
		fill_rademacher(q.data(), n, seed + uint64_t(p) * 0x632BE59BD9B4E019ULL);
		double nrm2 = dot(q.data(), q.data(), n);
		double inv_nrm = 1.0 / std::sqrt(nrm2);
		for (int64_t i = 0; i < n; ++i) q[i] = float(q[i] * inv_nrm);
		std::memset(q_prev.data(), 0, sizeof(float) * n);
		std::memset(ring.data(), 0, sizeof(float) * size_t(orth) * n);
		std::memcpy(ring.data(), q.data(), sizeof(float) * n);

		double beta = 0.0;
		double* a_row = alphas + size_t(p) * deg;
		double* b_row = betas + size_t(p) * deg;
		std::memset(a_row, 0, sizeof(double) * deg);
		std::memset(b_row, 0, sizeof(double) * deg);

		for (int32_t j = 0; j < deg; ++j) {
			spmv_csr(n, indptr, indices, data, q.data(), w.data());
			if (beta != 0.0) axpy(float(-beta), q_prev.data(), w.data(), n);
			double alpha = dot(w.data(), q.data(), n);
			axpy(float(-alpha), q.data(), w.data(), n);
			// Windowed MGS against the last `orth` basis vectors (zero slots
			// project to nothing).
			for (int32_t u = 0; u < orth; ++u) {
				const float* uv = ring.data() + size_t(u) * n;
				double c = dot(w.data(), uv, n);
				if (c != 0.0) axpy(float(-c), uv, w.data(), n);
			}
			beta = std::sqrt(dot(w.data(), w.data(), n));
			a_row[j] = alpha;
			b_row[j] = beta;
			if (beta < 1e-10) break;  // invariant subspace: early exit
			std::swap(q_prev, q);
			double inv_beta = 1.0 / beta;
			for (int64_t i = 0; i < n; ++i) q[i] = float(w[i] * inv_beta);
			std::memcpy(ring.data() + size_t((j + 1) % orth) * n, q.data(),
			            sizeof(float) * n);
		}
		norms2[p] = nrm2;
	}
	return 0;
}

}  // extern "C"
