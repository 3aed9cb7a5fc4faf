"""Blocked Cholesky / TRSM / fused LML for TPU: Pallas tile kernels + MXU
panel updates.

Replaces gonum ``mat.Cholesky`` (reference gp/gp.go:228-233) on the hot
path.  Design (SURVEY.md §7 PR2):

- **Tile base case** (``_chol_kernel`` / ``_chol_inv_kernel``): rank-8
  panel factorization of a VMEM-resident tile — eight masked substeps on
  an (8, n) slab per panel, one MXU matmul for the trailing rank-8 update
  and one for the panel scatter.  The fused variant emits inv(L) in the
  same program (forward substitution shares the factor substeps'
  dataflow), so the blocked driver needs no XLA triangular solve at all.

- **Blocked driver** (``blocked_cholesky_invs``): right-looking,
  statically unrolled block columns; panels and SYRK trailing updates are
  single MXU matmuls.  Tile inverses come out as a by-product.

- **Streaming vector solves** (``pallas_trsv_lower``/``_t``): the whole
  vector TRSM as ONE sequential-grid Pallas program — L panels pipeline
  from HBM, the solution persists in VMEM scratch, diagonal tiles apply
  via their precomputed inverses.  Bandwidth-bound instead of
  launch-latency-bound.

- **Fused LML core** (``lml_core``): -(log|K| + y^T K^-1 y)/2 with a
  custom VJP computing the analytic GPML-5.9 pullback
  ``Kbar = g/2 (aa^T - K^-1)`` via two blocked TRSMs — no generic
  Cholesky pullback, no extra full matmul.

- **Gradient of the bare factorization** (``cholesky`` custom_vjp): the
  standard pullback K_bar = P(L^-T Phi(L^T L_bar) L^-1) with blocked
  TRSMs, for callers differentiating through ``linalg.cholesky`` itself.

- **Fused whole-matrix kernel** (``fused_cholesky_invs``, round 3): the
  entire left-looking factorization as ONE sequential-grid program with L
  resident in a VMEM scratch — no inter-step HBM round trips.  Wins 3.7x
  over the stepwise driver for unbatched n < 2048 (where per-step launch
  overhead dominates); at larger n the serial diagonal substep chain
  dominates both drivers equally, and under vmap batched XLA Cholesky
  wins outright — so dispatch is batching-aware via custom_vmap
  (unbatched small-n -> fused kernel; batched lml forward -> XLA batched
  Cholesky + vmapped Pallas tile inversions; everything else -> stepwise).

- **Triangular SYRK** (``syrk_lower_t``, round 3): K^{-1} = W^T W in the
  lml backward via recursive 2x2 splitting of the triangular W — ~2n^3/3
  flops in large MXU matmuls, measured 2.5x over the dense dot at n=4096.

Block loops unroll statically up to ``_MAX_UNROLL_STEPS`` (exact trailing
slices); larger step counts switch to fori_loop + dynamic slices (the
unrolled 16k gradient graph stalls XLA's optimizer).

Dispatch: ``maybe_pallas_cholesky``/``maybe_lml_core`` route TPU float32
matrices with n >= _MIN_N (block 256, or 512 for n >= 8192) here;
everything else falls back to XLA primitives.  On CPU the Pallas kernels
run in interpreter mode when forced (tests), never by default.

Measured (v5e f32, floor-corrected device-loop timing, round 2): N=4096
factorization 1.92 ms vs 2.22 ms XLA; LML+gradient 3.41 ms vs 16.8 ms
XLA-AD vs 42.9 ms reference per-theta algorithm; N=16k factorization
48.5 ms (block 512) vs 72.5 ms XLA.

Precision (v5e, n=4096, vs CPU x64 truth): the default TPU f32 dot is a
single bf16 MXU pass, giving 2e-5 rel LML / 1.3e-3 max-rel gradient at
3.41 ms.  Wrapping the call in ``jax.default_matmul_precision
("tensorfloat32")`` raises the driver matmuls to 3-pass accuracy —
2.5e-7 / 2.5e-5, matching the XLA fallback path — at 6.11 ms, still
2.7x faster than XLA-AD.  The context is trace-aware so jit/custom_vjp
caches key on it; benchmarks/matmul_precision.py reproduces the sweep.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

DEFAULT_BLOCK = 256
_MIN_N = 1024  # below this XLA's native cholesky wins (dispatch overhead)
_INTERPRET = False  # tests force interpreter mode on CPU

# Dispatch default: ON.  Measured on one v5e chip with floor-corrected
# device-loop timing (round 2; round 1's numbers carried a ~27 ms/dispatch
# tunnel RTT that block_until_ready failed to wait out): N=4096 f32
# factorization 1.92 ms blocked-Pallas vs 2.22 ms XLA native, and the
# fused lml_core custom-VJP path beats grad-through-XLA-cholesky ~2x.
# Disable with disable_pallas() (or force_xla() at the linalg layer).
_ENABLED = True


import contextlib


@contextlib.contextmanager
def enable_pallas():
    """Opt in to the blocked-Pallas dispatch for TPU f32 n>=_MIN_N."""
    global _ENABLED
    prev, _ENABLED = _ENABLED, True
    try:
        yield
    finally:
        _ENABLED = prev


@contextlib.contextmanager
def disable_pallas():
    """Force the plain-XLA path even on TPU (escape hatch / A-B timing)."""
    global _ENABLED
    prev, _ENABLED = _ENABLED, False
    try:
        yield
    finally:
        _ENABLED = prev


# Matmul precision.  On TPU, JAX's DEFAULT f32 dot precision is a single
# bf16 MXU pass — measured bit-identical to explicitly casting operands to
# bf16 — so there is no "cast to bf16 for speed" headroom: the fast path
# already runs at bf16 operand precision.  The real knob points the other
# way: wrapping a model call in ``jax.default_matmul_precision("float32")``
# (trace-context-aware, so jit/custom_vjp caches key on it correctly)
# raises the XLA-level driver matmuls (SYRK trailing updates, panel/TRSM
# updates) to multi-pass f32 accuracy at ~3-6x their matmul cost.
# Measured at n=4096 vs CPU x64 truth: DEFAULT = 2e-5 rel LML / 1.3e-3
# max-rel grad; the XLA fallback path (internally high precision) = 6e-8 /
# 5e-5.  Mosaic supports only DEFAULT and HIGHEST dot precisions, so
# kernel-internal dots pin an explicit level via ``_kernel_precision``.


def _kernel_precision(precision: str | None = None):
    """Mosaic-supported dot precision for kernel-internal dots.

    An explicit per-call ``precision`` wins; otherwise the ambient
    ``jax.default_matmul_precision`` is read at trace time.
    "tensorfloat32"/"float32" map to HIGH/HIGHEST, which Mosaic rejects /
    honors respectively — pin DEFAULT unless more was asked for, then give
    HIGHEST.
    """
    if precision is None:
        precision = jax.config.jax_default_matmul_precision
    if precision in (None, "bfloat16", "default", "fastest"):
        return jax.lax.Precision.DEFAULT
    return jax.lax.Precision.HIGHEST


@contextlib.contextmanager
def force_interpret():
    """Run the Pallas kernels in interpreter mode and dispatch to them
    regardless of platform/size — the CPU test path."""
    global _INTERPRET
    prev, _INTERPRET = _INTERPRET, True
    try:
        yield
    finally:
        _INTERPRET = prev


def _chol_kernel(a_ref, l_ref, m_ref, *, precision=None, rank=8):
    """Unblocked in-VMEM Cholesky: l_ref <- chol(a_ref), lower (MXU rank-R).

    Panel (rank-R) formulation: the tile is factored R columns at a
    time.  Each panel step extracts the R-row slab of the (symmetric)
    working matrix M — row r of M is column r of M — factors the panel
    *within the slab* using R tiny masked rank-1 substeps on an (R, n)
    block, then applies the trailing update as ONE rank-R MXU matmul
    (W^T W) and scatters the panel into L with a second MXU matmul against
    an iota-built selector.  Compared to the rank-1 formulation this moves
    all O(n^3) work from full-tile VPU passes onto the MXU: the VPU only
    ever touches (R, n) slabs.  Measured on one v5e chip, the rank-8
    256-tile dropped from 1.57 ms (rank-1) to the noise floor; raising
    the rank trades more (cheap) VPU substep work for fewer, deeper MXU
    matmuls — rank must be a multiple of 8 (sublane slab slicing).

    Mosaic rules observed: no lane-dim slicing (columns are reached with
    masked reductions and iota selectors); slab slicing is along the
    sublane dim at static multiples of 8; all dots are 2-D.
    """
    n = a_ref.shape[0]
    dtype = a_ref.dtype
    prec = _kernel_precision(precision)
    rows = jax.lax.broadcasted_iota(jnp.int32, (rank, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (rank, n), 1)
    m_ref[:] = a_ref[:]
    l_ref[:] = jnp.zeros_like(a_ref)

    def panel(s, _):
        r0 = s * rank
        S = m_ref[pl.ds(r0, rank), :]  # (R, n) slab: rows r0..r0+R of M
        W = jnp.zeros_like(S)
        for i in range(rank):  # static unroll — masks select the pivot lane
            c = r0 + i
            row_i = jnp.sum(jnp.where(rows == i, S, 0.0), axis=0, keepdims=True)
            d = jnp.sum(jnp.where(cols[:1, :] == c, row_i, 0.0))
            w = jnp.where(cols[:1, :] >= c, row_i * jax.lax.rsqrt(d), 0.0)
            # w at lanes r0+k, aligned with slab rows k -> (R,1) column
            cvec = jnp.sum(jnp.where(cols == r0 + rows, w, 0.0), axis=1, keepdims=True)
            cvec = jnp.where(rows[:, :1] > i, cvec, 0.0)
            S = S - cvec * w
            W = W + jnp.where(rows == i, w, 0.0)
        # trailing rank-R update: M -= W^T W.  Rows/cols < r0 get zero
        # contribution (W lanes below the pivot are masked); the slab rows
        # themselves become stale but are never read again.
        m_ref[:] = m_ref[:] - jax.lax.dot_general(
            W, W, (((0,), (0,)), ((), ())), preferred_element_type=dtype,
            precision=prec,
        )
        # scatter panel into L columns r0..r0+R-1: L[j, r0+i] = W[i, j],
        # via one MXU dot against the selector E[i, c] = (c == r0+i)
        E = jnp.where(cols == r0 + rows, 1.0, 0.0).astype(dtype)
        l_ref[:] = l_ref[:] + jax.lax.dot_general(
            W, E, (((0,), (0,)), ((), ())), preferred_element_type=dtype,
            precision=prec,
        )
        return 0

    jax.lax.fori_loop(0, n // rank, panel, 0)


# Panel rank for the tile kernels: multiple of 8.  Higher rank = fewer,
# deeper MXU matmuls per tile at more (cheap) VPU substep work.  Measured
# on v5e (benchmarks/r3_experiments.py): rank 32 is ~2.6x faster on bare
# 512-tiles (0.122 vs 0.322 ms) and ~7% on the full n=4096 blocked driver.
_PANEL_RANK = 32


def pallas_cholesky_tile(
    a: Array, precision: str | None = None, rank: int | None = None
) -> Array:
    """Cholesky of one VMEM-sized tile via the Pallas kernel."""
    n = a.shape[-1]
    rank = _PANEL_RANK if rank is None else rank
    if n % rank != 0:
        rank = 8
    return pl.pallas_call(
        functools.partial(_chol_kernel, precision=precision, rank=rank),
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM(a.shape, a.dtype)],
        interpret=_INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * n * n, bytes_accessed=2 * n * n * a.dtype.itemsize,
            transcendentals=n,
        ),
    )(a)


def _chol_inv_kernel(a_ref, l_ref, v_ref, m_ref, *, precision=None, rank=8):
    """Fused tile Cholesky + triangular inverse: L = chol(A), V = inv(L).

    Same rank-R panel scheme as ``_chol_kernel``; the inverse rides along
    for free because forward substitution by the panel's RxR diagonal
    block D has the *same dataflow* as the factor substeps: scale row i by
    rsqrt(d), subtract cvec-weighted copies from the rows below.  Running
    the identical substeps on a second slab T initialized to
    ``E_slab - L_hist @ V`` yields exactly D^{-1}(E - L V) — the next
    R rows of inv(L).  This removes every XLA triangular solve from
    the blocked driver: panels become plain MXU matmuls against V^T.
    """
    n = a_ref.shape[0]
    dtype = a_ref.dtype
    prec = _kernel_precision(precision)
    rows = jax.lax.broadcasted_iota(jnp.int32, (rank, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (rank, n), 1)
    m_ref[:] = a_ref[:]
    l_ref[:] = jnp.zeros_like(a_ref)
    v_ref[:] = jnp.zeros_like(a_ref)

    def panel(s, _):
        r0 = s * rank
        S = m_ref[pl.ds(r0, rank), :]
        # identity rows minus the substitution history: at this point V has
        # rows >= r0 still zero and the L slab has lanes >= r0 still zero,
        # so the dot picks up exactly the already-solved prefix.
        E = jnp.where(cols == r0 + rows, 1.0, 0.0).astype(dtype)
        Lslab = l_ref[pl.ds(r0, rank), :]
        T = E - jax.lax.dot_general(
            Lslab, v_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=dtype,
            precision=prec,
        )
        W = jnp.zeros_like(S)
        U = jnp.zeros_like(T)
        for i in range(rank):
            c = r0 + i
            row_s = jnp.sum(jnp.where(rows == i, S, 0.0), axis=0, keepdims=True)
            row_t = jnp.sum(jnp.where(rows == i, T, 0.0), axis=0, keepdims=True)
            d = jnp.sum(jnp.where(cols[:1, :] == c, row_s, 0.0))
            inv_sqrt = jax.lax.rsqrt(d)
            w = jnp.where(cols[:1, :] >= c, row_s * inv_sqrt, 0.0)
            u = row_t * inv_sqrt
            cvec = jnp.sum(jnp.where(cols == r0 + rows, w, 0.0), axis=1, keepdims=True)
            cvec = jnp.where(rows[:, :1] > i, cvec, 0.0)
            S = S - cvec * w
            T = T - cvec * u
            W = W + jnp.where(rows == i, w, 0.0)
            U = U + jnp.where(rows == i, u, 0.0)
        m_ref[:] = m_ref[:] - jax.lax.dot_general(
            W, W, (((0,), (0,)), ((), ())), preferred_element_type=dtype,
            precision=prec,
        )
        Esel = jnp.where(cols == r0 + rows, 1.0, 0.0).astype(dtype)
        l_ref[:] = l_ref[:] + jax.lax.dot_general(
            W, Esel, (((0,), (0,)), ((), ())), preferred_element_type=dtype,
            precision=prec,
        )
        v_ref[pl.ds(r0, rank), :] = U
        return 0

    jax.lax.fori_loop(0, n // rank, panel, 0)


def pallas_cholesky_inv_tile(
    a: Array, precision: str | None = None, rank: int | None = None
) -> tuple[Array, Array]:
    """(L, inv(L)) of one VMEM-sized tile in a single Pallas program."""
    n = a.shape[-1]
    rank = _PANEL_RANK if rank is None else rank
    if n % rank != 0:
        rank = 8
    L, V = pl.pallas_call(
        functools.partial(_chol_inv_kernel, precision=precision, rank=rank),
        out_shape=(
            jax.ShapeDtypeStruct(a.shape, a.dtype),
            jax.ShapeDtypeStruct(a.shape, a.dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM(a.shape, a.dtype)],
        interpret=_INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=3 * n * n * n, bytes_accessed=3 * n * n * a.dtype.itemsize,
            transcendentals=n,
        ),
    )(a)
    return L, V


def _tril_inv_kernel(l_ref, v_ref, *, precision=None):
    """V = inv(L) for a lower-triangular VMEM tile, rank-8 panels.

    Forward substitution eight rows at a time: T = E_slab - L_slab @ V
    (one MXU dot per panel — V's unsolved rows are still zero, L's slab
    lanes >= r0 are ignored via the history mask), then eight masked
    substitution substeps dividing by the diagonal.
    """
    n = l_ref.shape[0]
    dtype = l_ref.dtype
    prec = _kernel_precision(precision)
    row8 = jax.lax.broadcasted_iota(jnp.int32, (8, n), 0)
    col8 = jax.lax.broadcasted_iota(jnp.int32, (8, n), 1)
    v_ref[:] = jnp.zeros_like(l_ref)

    def panel(s, _):
        r0 = s * 8
        Lslab = l_ref[pl.ds(r0, 8), :]
        hist = jnp.where(col8 < r0, Lslab, 0.0)
        E = jnp.where(col8 == r0 + row8, 1.0, 0.0).astype(dtype)
        T = E - jax.lax.dot_general(
            hist, v_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=dtype,
            precision=prec,
        )
        U = jnp.zeros_like(T)
        for i in range(8):
            c = r0 + i
            row_t = jnp.sum(jnp.where(row8 == i, T, 0.0), axis=0, keepdims=True)
            row_l = jnp.sum(jnp.where(row8 == i, Lslab, 0.0), axis=0, keepdims=True)
            d = jnp.sum(jnp.where(col8[:1, :] == c, row_l, 0.0))
            u = row_t / d
            cvec = jnp.sum(jnp.where(col8 == c, Lslab, 0.0), axis=1, keepdims=True)
            cvec = jnp.where(row8[:, :1] > i, cvec, 0.0)
            T = T - cvec * u
            U = U + jnp.where(row8 == i, u, 0.0)
        v_ref[pl.ds(r0, 8), :] = U
        return 0

    jax.lax.fori_loop(0, n // 8, panel, 0)


def pallas_tril_inv_tile(L: Array, precision: str | None = None) -> Array:
    """inv(L) of one lower-triangular VMEM-sized tile."""
    n = L.shape[-1]
    return pl.pallas_call(
        functools.partial(_tril_inv_kernel, precision=precision),
        out_shape=jax.ShapeDtypeStruct(L.shape, L.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=_INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=n * n * n, bytes_accessed=2 * n * n * L.dtype.itemsize,
            transcendentals=0,
        ),
    )(L)


def _factor_tile_refs(m_ref, l_ref, v_ref, rank: int, prec) -> None:
    """chol + inverse of the tile preloaded in ``m_ref`` into l_ref/v_ref.

    The body of ``_chol_inv_kernel`` as a helper over refs so the fused
    whole-matrix kernel can run it on its own scratch tiles (Mosaic has no
    dynamic_slice on VALUES; all slab access must go through refs).
    ``m_ref`` is consumed as the working buffer.
    """
    n = m_ref.shape[0]
    dtype = m_ref.dtype
    rows = jax.lax.broadcasted_iota(jnp.int32, (rank, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (rank, n), 1)
    l_ref[:] = jnp.zeros((n, n), dtype)
    v_ref[:] = jnp.zeros((n, n), dtype)

    def panel(s, _):
        r0 = s * rank
        S = m_ref[pl.ds(r0, rank), :]
        E = jnp.where(cols == r0 + rows, 1.0, 0.0).astype(dtype)
        Lslab = l_ref[pl.ds(r0, rank), :]
        T = E - jax.lax.dot_general(
            Lslab, v_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=dtype,
            precision=prec,
        )
        W = jnp.zeros_like(S)
        U = jnp.zeros_like(T)
        for i in range(rank):
            c = r0 + i
            row_s = jnp.sum(jnp.where(rows == i, S, 0.0), axis=0, keepdims=True)
            row_t = jnp.sum(jnp.where(rows == i, T, 0.0), axis=0, keepdims=True)
            d = jnp.sum(jnp.where(cols[:1, :] == c, row_s, 0.0))
            inv_sqrt = jax.lax.rsqrt(d)
            w = jnp.where(cols[:1, :] >= c, row_s * inv_sqrt, 0.0)
            u = row_t * inv_sqrt
            cvec = jnp.sum(jnp.where(cols == r0 + rows, w, 0.0), axis=1, keepdims=True)
            cvec = jnp.where(rows[:, :1] > i, cvec, 0.0)
            S = S - cvec * w
            T = T - cvec * u
            W = W + jnp.where(rows == i, w, 0.0)
            U = U + jnp.where(rows == i, u, 0.0)
        m_ref[:] = m_ref[:] - jax.lax.dot_general(
            W, W, (((0,), (0,)), ((), ())), preferred_element_type=dtype,
            precision=prec,
        )
        Esel = jnp.where(cols == r0 + rows, 1.0, 0.0).astype(dtype)
        l_ref[:] = l_ref[:] + jax.lax.dot_general(
            W, Esel, (((0,), (0,)), ((), ())), preferred_element_type=dtype,
            precision=prec,
        )
        v_ref[pl.ds(r0, rank), :] = U
        return 0

    jax.lax.fori_loop(0, n // rank, panel, 0)


def _fused_chol_kernel(
    k_ref, l_ref, inv_ref, lbuf, ck, mt, lt, vt, *, block, rank, precision=None
):
    """Whole-matrix left-looking Cholesky as ONE sequential-grid program.

    Grid step k computes block column k of L with the factor-so-far
    resident in a VMEM scratch (``lbuf``):

      Ck    = K[:, c0:c1] - sum_{j<k} L[:, j] @ L[c0:c1, j]^T   (MXU dots)
      Ltile, Vtile = chol+inv of Ck[c0:c1]                       (substeps)
      L[:, k] = [0; Ltile; Ck_below @ Vtile^T]

    versus the XLA-level blocked driver, this removes every inter-step
    HBM round trip and .at[].set copy: K streams in once as column
    blocks, L streams out once, and all O(n^3) work happens against
    VMEM-resident operands with full-depth (c0-deep) MXU contractions.
    The accumulation loop reads lbuf column blocks at 256-aligned lane
    offsets (Mosaic: dynamic lane slicing must be 128-aligned).
    """
    k = pl.program_id(0)
    n = lbuf.shape[0]
    b = block
    c0 = k * b
    dtype = k_ref.dtype
    prec = _kernel_precision(precision)

    @pl.when(k == 0)
    def _():
        lbuf[:] = jnp.zeros_like(lbuf)

    def body(j, acc):
        lcol = lbuf[:, pl.ds(j * b, b)]  # (n, b)
        lrow = lbuf[pl.ds(c0, b), pl.ds(j * b, b)]  # (b, b)
        return acc + jax.lax.dot_general(
            lcol, lrow, (((1,), (1,)), ((), ())), preferred_element_type=dtype,
            precision=prec,
        )

    acc = jax.lax.fori_loop(0, k, body, jnp.zeros((n, b), dtype))
    ck[:] = k_ref[:] - acc
    mt[:] = ck[pl.ds(c0, b), :]  # (b, b) diagonal tile
    _factor_tile_refs(mt, lt, vt, rank, prec)
    P = jax.lax.dot_general(
        ck[:], vt[:], (((1,), (1,)), ((), ())), preferred_element_type=dtype,
        precision=prec,
    )  # (n, b) = Ck @ Vtile^T; only rows >= c1 are meaningful
    rowsid = jax.lax.broadcasted_iota(jnp.int32, (n, b), 0)
    l_ref[:] = jnp.where(rowsid >= c0 + b, P, 0.0)
    l_ref[pl.ds(c0, b), :] = lt[:]
    lbuf[:, pl.ds(c0, b)] = l_ref[:]
    inv_ref[0] = vt[:]


# Size gate for the fused whole-matrix kernel.  Measured (v5e f32,
# benchmarks/r3_experiments.py methodology): n=1024 fused 0.148 ms vs
# 0.553 ms stepwise (3.7x); n=2048 0.494 vs 0.421 (tie/loss); n=4096
# 1.783 vs 1.419 (loss).  At large n the factorization cost is the
# inherently serial diagonal substep chain (~n dependent rsqrt+reduce
# steps), which both drivers pay equally, while the fused kernel's
# left-looking accumulation cannot overlap across grid steps the way
# XLA pipelines the stepwise driver's independent matmuls.  Below ~2k
# the stepwise driver is dispatch/launch-bound and whole-program fusion
# wins big.  (VMEM would cap the resident-L scratch near n=4608 anyway.)
_FUSED_MAX_N = 2047
_FUSED_WHOLE = True  # dispatch blocked_cholesky_invs through the fused kernel


@contextlib.contextmanager
def no_fused_whole():
    """Force the stepwise XLA-level blocked driver (A/B timing or VMEM
    pressure escape hatch)."""
    global _FUSED_WHOLE
    prev, _FUSED_WHOLE = _FUSED_WHOLE, False
    try:
        yield
    finally:
        _FUSED_WHOLE = prev


def fused_cholesky_invs(
    K: Array, block: int = DEFAULT_BLOCK, precision: str | None = None,
    rank: int | None = None,
) -> tuple[Array, Array]:
    """(L, tile inverses) via the single-program left-looking kernel."""
    n = K.shape[-1]
    if n % block != 0:
        raise ValueError(f"n={n} must be a multiple of block={block}")
    rank = _PANEL_RANK if rank is None else rank
    if block % rank != 0:
        rank = 8
    nb = n // block
    L, invs = pl.pallas_call(
        functools.partial(
            _fused_chol_kernel, block=block, rank=rank, precision=precision
        ),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((n, block), lambda k: (0, k), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((n, block), lambda k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, block), lambda k: (k, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, n), K.dtype),
            jax.ShapeDtypeStruct((nb, block, block), K.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, n), K.dtype),  # resident L
            pltpu.VMEM((n, block), K.dtype),  # current column Ck
            pltpu.VMEM((block, block), K.dtype),  # tile working M
            pltpu.VMEM((block, block), K.dtype),  # tile L
            pltpu.VMEM((block, block), K.dtype),  # tile inv
        ],
        interpret=_INTERPRET,
        # the resident-L scratch needs most of the chip's 128 MB VMEM;
        # the default scoped-vmem limit is 16 MB
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * n * n // 3,
            bytes_accessed=2 * n * n * K.dtype.itemsize,
            transcendentals=n,
        ),
    )(K)
    return L, invs


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


def _inv_lower(Lkk: Array, precision: str | None = None) -> Array:
    """inv(Lkk) for a small lower-triangular tile.

    Pallas substitution kernel on TPU (and under force_interpret); XLA
    triangular solve elsewhere — the per-tile XLA trsm is what used to
    dominate the blocked drivers' non-matmul time.
    """
    if _INTERPRET or _on_tpu():
        return pallas_tril_inv_tile(Lkk, precision)
    eye = jnp.eye(Lkk.shape[-1], dtype=Lkk.dtype)
    return jax.scipy.linalg.solve_triangular(Lkk, eye, lower=True)


def blocked_cholesky_invs(
    K: Array, block: int = DEFAULT_BLOCK, precision: str | None = None
) -> tuple[Array, Array]:
    """Right-looking blocked Cholesky, statically unrolled block columns.

    Returns ``(L, invs)`` where ``invs`` is the (nb, block, block) stack of
    diagonal-tile inverses — a factorization by-product (the fused tile
    kernel produces them anyway) reused by the streaming vector solves.
    Requires n % block == 0 (callers pad; the GP layer always can because
    its shapes are static).
    """
    n = K.shape[-1]
    if n % block != 0:
        raise ValueError(f"n={n} must be a multiple of block={block}")
    if block % 8 != 0:
        raise ValueError(
            f"block={block} must be a multiple of 8 (the tile kernels "
            "factor in rank-8 slabs)"
        )
    use_fused = _INTERPRET or _on_tpu()
    if use_fused and _FUSED_WHOLE and n <= _FUSED_MAX_N and block % 8 == 0:
        # single-program left-looking kernel: L resident in VMEM, no
        # inter-step HBM round trips.  UNBATCHED calls only: under vmap
        # the grid serializes the batch through one core and the fused
        # form loses its launch-amortization edge (measured: B=8 n=1024
        # fused 2.53 ms vs stepwise 2.35 ms, while unbatched is 0.148 vs
        # 0.553) — custom_vmap reroutes batched calls to the stepwise
        # driver, whose tile kernels batch fine.
        @jax.custom_batching.custom_vmap
        def f(K):
            return fused_cholesky_invs(K, block, precision)

        @f.def_vmap
        def _(axis_size, in_batched, Kb):
            out = jax.vmap(
                lambda k: _stepwise_cholesky_invs(k, block, precision)
            )(Kb)
            return out, (True, True)

        return f(K)
    return _stepwise_cholesky_invs(K, block, precision)


_SUPER_PANEL = 0  # 0 = off; >=2 = super-panel width in blocks (A/B hook)


@contextlib.contextmanager
def super_panels(sf: int = 2):
    """Route the stepwise driver through the two-level super-panel
    schedule: diagonal super-tiles of ``sf * block`` factored via the
    existing ``block``-sized Pallas tile kernels, then ONE sf-wide panel
    TRSM and ONE sf-wide trailing SYRK per super-step.  Halves the number
    of sequential HBM-bound trailing updates (the 47%-of-headline
    dependency chain, DESIGN.md 9b) and doubles their contraction depth
    (fewer HBM reads of A per FLOP) without any new Mosaic kernel — the
    known 512-wide tile-kernel compile blowup never enters."""
    global _SUPER_PANEL
    prev, _SUPER_PANEL = _SUPER_PANEL, sf
    try:
        yield
    finally:
        _SUPER_PANEL = prev


def _stepwise_cholesky_invs_super(
    K: Array, block: int, precision: str | None = None, sf: int = 2
) -> tuple[Array, Array]:
    """Two-level right-looking schedule (see :func:`super_panels`).

    Contract identical to :func:`_stepwise_cholesky_invs`: returns
    ``(L, invs)`` with invs the (nb, block, block) diagonal-tile inverse
    stack — the super-tile's inner blocks contribute their own
    block-sized inverses, so every downstream consumer (streaming TRSV,
    fused lml VJP) is unchanged.
    """
    n = K.shape[-1]
    sb = block * sf
    if n % sb != 0:
        raise ValueError(f"n={n} must be a multiple of super-panel {sb}")
    nbs = n // sb
    dtype = K.dtype
    use_fused = _INTERPRET or _on_tpu()

    def dg(a, b_):
        return jax.lax.dot_general(
            a, b_, (((1,), (1,)), ((), ())),
            preferred_element_type=dtype, precision=precision,
        )

    def tile(d):
        if use_fused:
            return pallas_cholesky_inv_tile(d, precision)
        Lkk = pallas_cholesky_tile(d, precision)
        return Lkk, _inv_lower(Lkk, precision)

    L = jnp.zeros_like(K)
    A = K
    invs = []
    for ks in range(nbs):
        c0, c1 = ks * sb, (ks + 1) * sb
        Din = A[c0:c1, c0:c1]
        # inner factorization of the sb x sb diagonal via block-sized tiles
        Ls = jnp.zeros((sb, sb), dtype)
        Vs = []
        for j in range(sf):
            b0, b1 = j * block, (j + 1) * block
            Ljj, Vj = tile(Din[b0:b1, b0:b1])
            Vs.append(Vj)
            Ls = Ls.at[b0:b1, b0:b1].set(Ljj)
            if b1 < sb:
                pan = dg(Din[b1:, b0:b1], Vj)
                Ls = Ls.at[b1:, b0:b1].set(pan)
                Din = Din.at[b1:, b1:].add(-dg(pan, pan))
        invs.extend(Vs)
        L = L.at[c0:c1, c0:c1].set(Ls)
        if c1 == n:
            break
        # sf-wide panel TRSM by forward block substitution against Ls
        R = A[c1:, c0:c1]
        X = []
        for j in range(sf):
            b0, b1 = j * block, (j + 1) * block
            Rj = R[:, b0:b1]
            for i, Xi in enumerate(X):
                Rj = Rj - dg(Xi, Ls[b0:b1, i * block : (i + 1) * block])
            X.append(dg(Rj, Vs[j]))
        panel = jnp.concatenate(X, axis=1)  # (n - c1, sb)
        L = L.at[c1:, c0:c1].set(panel)
        # ONE sb-deep trailing SYRK per super-step (the schedule's point)
        A = A.at[c1:, c1:].add(-dg(panel, panel))
    return L, jnp.stack(invs)


def _stepwise_cholesky_invs(
    K: Array, block: int, precision: str | None = None
) -> tuple[Array, Array]:
    """The XLA-level right-looking block loop (see
    :func:`blocked_cholesky_invs` for the contract)."""
    n = K.shape[-1]
    if _SUPER_PANEL >= 2 and n % (block * _SUPER_PANEL) == 0 and n > block * _SUPER_PANEL:
        return _stepwise_cholesky_invs_super(K, block, precision, _SUPER_PANEL)
    nb = n // block
    dtype = K.dtype
    use_fused = _INTERPRET or _on_tpu()
    L = jnp.zeros_like(K)
    A = K
    invs = []
    for k in range(nb):
        c0, c1 = k * block, (k + 1) * block
        diag = A[c0:c1, c0:c1]
        if use_fused:
            # one Pallas program yields both the factor and its inverse —
            # the panel TRSM becomes a plain MXU matmul, no XLA
            # triangular solve anywhere in the factorization
            Lkk, inv = pallas_cholesky_inv_tile(diag, precision)
        else:
            Lkk = pallas_cholesky_tile(diag, precision)
            inv = _inv_lower(Lkk, precision)
        invs.append(inv)
        L = L.at[c0:c1, c0:c1].set(Lkk)
        if c1 == n:
            break
        panel = jax.lax.dot_general(
            A[c1:, c0:c1], inv, (((1,), (1,)), ((), ())),
            preferred_element_type=dtype, precision=precision,
        )  # (n-c1, block) = A_panel @ inv^T
        L = L.at[c1:, c0:c1].set(panel)
        if nb <= 16:
            # triangular-aware SYRK: update one trailing block COLUMN at a
            # time, rows from its diagonal down — half the FLOPs of the
            # full-square update.  Strip count is nb^2/2 total, so only
            # for small nb (HLO size; large nb keeps the single matmul).
            for j in range(k + 1, nb):
                r0 = j * block - c1
                upd = jax.lax.dot_general(
                    panel[r0:], panel[r0:r0 + block],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=dtype, precision=precision,
                )
                A = A.at[j * block:, j * block:(j + 1) * block].add(-upd)
        else:
            A = A.at[c1:, c1:].add(
                -jax.lax.dot_general(
                    panel, panel, (((1,), (1,)), ((), ())),
                    preferred_element_type=dtype, precision=precision,
                )
            )
    return L, jnp.stack(invs)


def blocked_cholesky(
    K: Array, block: int = DEFAULT_BLOCK, precision: str | None = None
) -> Array:
    """Lower Cholesky factor via the blocked driver (see
    :func:`blocked_cholesky_invs`)."""
    return blocked_cholesky_invs(K, block, precision)[0]


# Unrolled block loops above this many steps produce HLO big enough to
# stall XLA's optimizer (observed: the 16k gradient graph never finished
# compiling); switch to fori_loop + dynamic slices beyond it.
_MAX_UNROLL_STEPS = 24


# ---------------------------------------------------------------------------
# Streaming vector triangular solves.
#
# A vector TRSM is HBM-bandwidth-bound (read L once), but the XLA/blocked
# forms dispatch nb dependent kernels and measure ~0.5 ms at n=4096 where
# the memory bound is ~40 us.  Here the WHOLE solve is one pallas_call
# with a sequential grid over block rows: the solution vector lives in a
# VMEM scratch that persists across grid steps, each step's L panel is
# auto-pipelined from HBM, the already-solved prefix is applied as one
# masked full-width matvec, and the diagonal tile is applied via its
# precomputed inverse (one small MXU matmul).  The tile inverses come for
# free from the fused factorization kernel.
# ---------------------------------------------------------------------------


def _trsv_kernel(y_ref, panel_ref, inv_ref, x_ref, acc_ref, *, precision=None):
    """Grid step k: solve rows [k b, (k+1) b) given the solved prefix."""
    k = pl.program_id(0)
    block = y_ref.shape[0]
    n = panel_ref.shape[1]
    c0 = k * block
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (block, n), 1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    prec = _kernel_precision(precision)
    hist = jnp.where(col_ids < c0, panel_ref[:], 0.0)
    resid = y_ref[:] - jax.lax.dot_general(
        hist, acc_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=y_ref.dtype, precision=prec,
    )
    xk = jax.lax.dot_general(
        inv_ref[0], resid, (((1,), (0,)), ((), ())),
        preferred_element_type=y_ref.dtype, precision=prec,
    )
    acc_ref[pl.ds(c0, block), :] = xk
    x_ref[:] = xk


def _trsv_t_kernel(y_ref, panel_ref, inv_ref, x_ref, acc_ref, *, precision=None):
    """Transpose solve, bottom-up: grid step t handles block nb-1-t."""
    t = pl.program_id(0)
    nb = pl.num_programs(0)
    k = nb - 1 - t
    block = y_ref.shape[0]
    n = panel_ref.shape[0]
    c0 = k * block
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, block), 0)

    @pl.when(t == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # panel_ref = L[:, c0:c1]; contribution of solved rows > c1
    prec = _kernel_precision(precision)
    hist = jnp.where(row_ids >= c0 + block, panel_ref[:], 0.0)
    resid = y_ref[:] - jax.lax.dot_general(
        hist, acc_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=y_ref.dtype, precision=prec,
    )
    xk = jax.lax.dot_general(
        inv_ref[0], resid, (((0,), (0,)), ((), ())),
        preferred_element_type=y_ref.dtype, precision=prec,
    )  # inv^T @ resid
    acc_ref[pl.ds(c0, block), :] = xk
    x_ref[:] = xk


def pallas_trsv_lower(
    L: Array, y: Array, invs: Array, block: int, precision: str | None = None
) -> Array:
    """x = L^{-1} y (vector), one streaming Pallas program.

    ``invs``: (nb, block, block) tile inverses of the diagonal blocks.
    """
    n = L.shape[-1]
    nb = n // block
    y2 = y[:, None]
    out = pl.pallas_call(
        functools.partial(_trsv_kernel, precision=precision),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block, 1), lambda k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, n), lambda k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, block), lambda k: (k, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, 1), lambda k: (k, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 1), L.dtype),
        scratch_shapes=[pltpu.VMEM((n, 1), L.dtype)],
        interpret=_INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=n * n, bytes_accessed=n * n * L.dtype.itemsize, transcendentals=0
        ),
    )(y2, L, invs.reshape(nb, block, block))
    return out[:, 0]


def pallas_trsv_lower_t(
    L: Array, y: Array, invs: Array, block: int, precision: str | None = None
) -> Array:
    """x = L^{-T} y (vector), streaming bottom-up."""
    n = L.shape[-1]
    nb = n // block
    y2 = y[:, None]
    out = pl.pallas_call(
        functools.partial(_trsv_t_kernel, precision=precision),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block, 1), lambda t, nb=nb: (nb - 1 - t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, block), lambda t, nb=nb: (0, nb - 1 - t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, block), lambda t, nb=nb: (nb - 1 - t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, 1), lambda t, nb=nb: (nb - 1 - t, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 1), L.dtype),
        scratch_shapes=[pltpu.VMEM((n, 1), L.dtype)],
        interpret=_INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=n * n, bytes_accessed=n * n * L.dtype.itemsize, transcendentals=0
        ),
    )(y2, L, invs.reshape(nb, block, block))
    return out[:, 0]


def _tri_kj(t):
    """Linear triangular index t -> (k, j) with 0 <= j <= k, row-major
    over the lower triangle (t = k(k+1)/2 + j).  Float sqrt inversion
    with integer guards against rounding at row boundaries."""
    tf = t.astype(jnp.float32)
    k = jnp.floor((jnp.sqrt(8.0 * tf + 1.0) - 1.0) * 0.5).astype(jnp.int32)
    k = jnp.where((k + 1) * (k + 2) // 2 <= t, k + 1, k)
    k = jnp.where(k * (k + 1) // 2 > t, k - 1, k)
    j = t - k * (k + 1) // 2
    return k, j


def _trsv2d_kernel(y_ref, lblk_ref, inv_ref, x_ref, acc_ref, xs_ref, *, precision=None):
    """Triangular-grid streaming forward TRSV: step t visits lower-triangle
    block (k, j); j < k accumulates L[k,j] @ x[j], j == k solves."""
    t = pl.program_id(0)
    k, j = _tri_kj(t)
    block = y_ref.shape[0]
    prec = _kernel_precision(precision)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(j < k)
    def _():
        xj = xs_ref[pl.ds(j * block, block), :]
        acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
            lblk_ref[:], xj, (((1,), (0,)), ((), ())),
            preferred_element_type=y_ref.dtype, precision=prec,
        )

    @pl.when(j == k)
    def _():
        xk = jax.lax.dot_general(
            inv_ref[0], y_ref[:] - acc_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=y_ref.dtype, precision=prec,
        )
        xs_ref[pl.ds(k * block, block), :] = xk
        x_ref[:] = xk


def _trsv2d_t_kernel(y_ref, lblk_ref, inv_ref, x_ref, acc_ref, xs_ref, *, precision=None):
    """Triangular-grid transpose TRSV, bottom-up: row k (descending) needs
    L[j, k]^T @ x[j] for j > k (descending), then the inv^T solve."""
    t = pl.program_id(0)
    block = y_ref.shape[0]
    nb = xs_ref.shape[0] // block
    kp, jp = _tri_kj(t)
    k = nb - 1 - kp
    j = nb - 1 - jp
    prec = _kernel_precision(precision)

    @pl.when(jp == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(j > k)
    def _():
        xj = xs_ref[pl.ds(j * block, block), :]
        acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
            lblk_ref[:], xj, (((0,), (0,)), ((), ())),
            preferred_element_type=y_ref.dtype, precision=prec,
        )

    @pl.when(j == k)
    def _():
        xk = jax.lax.dot_general(
            inv_ref[0], y_ref[:] - acc_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=y_ref.dtype, precision=prec,
        )
        xs_ref[pl.ds(k * block, block), :] = xk
        x_ref[:] = xk


def pallas_trsv2d_lower(
    L: Array, y: Array, invs: Array, block: int, precision: str | None = None
) -> Array:
    """x = L^{-1} y over a TRIANGULAR grid of (block, block) tiles.

    Unlike :func:`pallas_trsv_lower` (whole (block, n) panels resident,
    gated to ~8 MB), each step holds ONE tile — any n — and only the
    lower triangle is ever DMA'd: half the HBM traffic of the panel form
    and of the blocked-XLA fallback.
    """
    n = L.shape[-1]
    nb = n // block
    y2 = y[:, None]
    steps = nb * (nb + 1) // 2

    def l_idx(t):
        k, j = _tri_kj(t)
        return (k, j)

    def row_idx(t):
        k, _ = _tri_kj(t)
        return (k, 0)

    def inv_idx(t):
        k, _ = _tri_kj(t)
        return (k, 0, 0)

    out = pl.pallas_call(
        functools.partial(_trsv2d_kernel, precision=precision),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((block, 1), row_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((block, block), l_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, block), inv_idx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, 1), row_idx, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 1), L.dtype),
        scratch_shapes=[pltpu.VMEM((block, 1), L.dtype), pltpu.VMEM((n, 1), L.dtype)],
        interpret=_INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=n * n, bytes_accessed=n * n * L.dtype.itemsize // 2,
            transcendentals=0,
        ),
    )(y2, L, invs.reshape(nb, block, block))
    return out[:, 0]


def pallas_trsv2d_lower_t(
    L: Array, y: Array, invs: Array, block: int, precision: str | None = None
) -> Array:
    """x = L^{-T} y over a triangular tile grid, bottom-up (see
    :func:`pallas_trsv2d_lower`)."""
    n = L.shape[-1]
    nb = n // block
    y2 = y[:, None]
    steps = nb * (nb + 1) // 2

    def l_idx(t):
        kp, jp = _tri_kj(t)
        return (nb - 1 - jp, nb - 1 - kp)  # block L[j, k]

    def row_idx(t):
        kp, _ = _tri_kj(t)
        return (nb - 1 - kp, 0)

    def inv_idx(t):
        kp, _ = _tri_kj(t)
        return (nb - 1 - kp, 0, 0)

    out = pl.pallas_call(
        functools.partial(_trsv2d_t_kernel, precision=precision),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((block, 1), row_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((block, block), l_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, block), inv_idx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, 1), row_idx, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 1), L.dtype),
        scratch_shapes=[pltpu.VMEM((block, 1), L.dtype), pltpu.VMEM((n, 1), L.dtype)],
        interpret=_INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=n * n, bytes_accessed=n * n * L.dtype.itemsize // 2,
            transcendentals=0,
        ),
    )(y2, L, invs.reshape(nb, block, block))
    return out[:, 0]


def _tile_invs(L: Array, block: int, precision: str | None = None) -> Array:
    """(nb, block, block) stack of inv(L_kk) diagonal-tile inverses."""
    n = L.shape[-1]
    nb = n // block
    tiles = jnp.stack([L[k * block:(k + 1) * block, k * block:(k + 1) * block] for k in range(nb)])
    if block % 8 == 0 and (_INTERPRET or _on_tpu()):
        # vmapped pallas tile: batching maps the grid (the kernel's rank-8
        # slabs need block to be a multiple of 8)
        return jax.vmap(lambda t: pallas_tril_inv_tile(t, precision))(tiles)
    eye = jnp.eye(block, dtype=L.dtype)
    return jax.vmap(lambda t: jax.scipy.linalg.solve_triangular(t, eye, lower=True))(tiles)


def _trsm_lower_fori(
    L: Array, B: Array, block: int, precision: str | None = None
) -> Array:
    """fori_loop trailing-update forward substitution (compile-size-safe
    for large nb at the cost of masked full-width row reads)."""
    n = L.shape[-1]
    nb = n // block
    invs = _tile_invs(L, block, precision)

    def step(k, carry):
        resid, X = carry
        c0 = k * block
        rhs = jax.lax.dynamic_slice(resid, (c0, 0), (block, B.shape[1]))
        xk = jnp.matmul(invs[k], rhs, precision=precision)
        # trailing update: rows above c0+block see zero L columns
        L_cols = jax.lax.dynamic_slice(L, (0, c0), (n, block))
        resid = resid - jnp.matmul(L_cols, xk, precision=precision)
        X = jax.lax.dynamic_update_slice(X, xk, (c0, 0))
        return resid, X

    _, X = jax.lax.fori_loop(0, nb, step, (B, jnp.zeros_like(B)))
    return X


def _trsm_lower_t_fori(
    L: Array, B: Array, block: int, precision: str | None = None
) -> Array:
    """fori_loop transpose solve, bottom-up."""
    n = L.shape[-1]
    nb = n // block
    invs = _tile_invs(L, block, precision)

    def step(t, carry):
        resid, X = carry
        k = nb - 1 - t
        c0 = k * block
        rhs = jax.lax.dynamic_slice(resid, (c0, 0), (block, B.shape[1]))
        xk = jnp.matmul(invs[k].T, rhs, precision=precision)
        # trailing update: resid[:c0+block] -= L[c0:c1, :].T rows' contribution
        L_rows = jax.lax.dynamic_slice(L, (c0, 0), (block, n))
        resid = resid - jnp.matmul(L_rows.T, xk, precision=precision)
        X = jax.lax.dynamic_update_slice(X, xk, (c0, 0))
        return resid, X

    _, X = jax.lax.fori_loop(0, nb, step, (B, jnp.zeros_like(B)))
    return X


def blocked_trsm_lower(
    L: Array, B: Array, block: int = DEFAULT_BLOCK, precision: str | None = None
) -> Array:
    """X = L^{-1} B with L lower triangular, blocked.

    Per block row: X[k] = inv(Lkk) @ (B[k] - L[k, :k] @ X[:k]) — the
    subtraction and the application of the inverted diagonal tile are MXU
    matmuls; tile inversions come from the Pallas substitution kernel.
    Statically unrolled for small step counts (exact trailing slices, no
    wasted FLOPs); fori_loop with dynamic slices beyond _MAX_UNROLL_STEPS
    (the unrolled 16k gradient graph stalls XLA's optimizer).
    """
    n = L.shape[-1]
    if n % block != 0:
        raise ValueError(f"n={n} must be a multiple of block={block}")
    nb = n // block
    if B.ndim == 1:
        return blocked_trsm_lower(L, B[:, None], block, precision)[:, 0]
    if nb > _MAX_UNROLL_STEPS:
        return _trsm_lower_fori(L, B, block, precision)
    X = jnp.zeros_like(B)
    for k in range(nb):
        c0, c1 = k * block, (k + 1) * block
        rhs = B[c0:c1]
        if k > 0:
            rhs = rhs - jnp.matmul(L[c0:c1, :c0], X[:c0], precision=precision)
        inv = _inv_lower(L[c0:c1, c0:c1], precision)
        X = X.at[c0:c1].set(jnp.matmul(inv, rhs, precision=precision))
    return X


def blocked_trsm_lower_t(
    L: Array, B: Array, block: int = DEFAULT_BLOCK, precision: str | None = None
) -> Array:
    """X = L^{-T} B (transpose solve), bottom-up; unroll policy as
    :func:`blocked_trsm_lower`."""
    n = L.shape[-1]
    if n % block != 0:
        raise ValueError(f"n={n} must be a multiple of block={block}")
    nb = n // block
    if B.ndim == 1:
        return blocked_trsm_lower_t(L, B[:, None], block, precision)[:, 0]
    if nb > _MAX_UNROLL_STEPS:
        return _trsm_lower_t_fori(L, B, block, precision)
    X = jnp.zeros_like(B)
    for k in reversed(range(nb)):
        c0, c1 = k * block, (k + 1) * block
        rhs = B[c0:c1]
        if c1 < n:
            rhs = rhs - jnp.matmul(L[c1:, c0:c1].T, X[c1:], precision=precision)
        inv = _inv_lower(L[c0:c1, c0:c1], precision)
        X = X.at[c0:c1].set(jnp.matmul(inv.T, rhs, precision=precision))
    return X


def _tril_mask(n: int, dtype) -> Array:
    """Lower-triangular 0/1 mask via iota comparison (no scatters)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (r >= c).astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def trsm_lower_ad(L: Array, B: Array, block: int, precision: str | None) -> Array:
    """X = L^{-1} B (2-D B) — :func:`blocked_trsm_lower` with an analytic
    VJP so differentiated callers (e.g. the SGPR bound, gp/sparse.py, whose
    m x n whitening solve is this op) can use the blocked MXU path.

    From X = L^{-1} B:  dX = -L^{-1} dL X + L^{-1} dB, so

        Bbar = L^{-T} Xbar            (one transpose blocked solve)
        Lbar = -tril(Bbar X^T)        (one MXU matmul)

    (tril because only the lower triangle of L participates).
    """
    return blocked_trsm_lower(L, B, block, precision)


def _trsm_lower_ad_fwd(L, B, block, precision):
    X = blocked_trsm_lower(L, B, block, precision)
    return X, (L, X)


def _trsm_lower_ad_bwd(block, precision, res, Xbar):
    L, X = res
    Bbar = blocked_trsm_lower_t(L, Xbar, block, precision)
    Lbar = -jnp.matmul(Bbar, X.T, precision=precision) * _tril_mask(
        L.shape[-1], L.dtype
    )
    return Lbar, Bbar


trsm_lower_ad.defvjp(_trsm_lower_ad_fwd, _trsm_lower_ad_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def trsm_lower_t_ad(L: Array, B: Array, block: int, precision: str | None) -> Array:
    """X = L^{-T} B (2-D B) with the analytic VJP (mirror of
    :func:`trsm_lower_ad`):  Bbar = L^{-1} Xbar,  Lbar = -tril(X Bbar^T)."""
    return blocked_trsm_lower_t(L, B, block, precision)


def _trsm_lower_t_ad_fwd(L, B, block, precision):
    X = blocked_trsm_lower_t(L, B, block, precision)
    return X, (L, X)


def _trsm_lower_t_ad_bwd(block, precision, res, Xbar):
    L, X = res
    Bbar = blocked_trsm_lower(L, Xbar, block, precision)
    # from dX = -L^{-T} dL^T X + L^{-T} dB:
    #   <Xbar, -L^{-T} dL^T X> = <dL, -X (L^{-1} Xbar)^T> = <dL, -X Bbar^T>
    Lbar = -jnp.matmul(X, Bbar.T, precision=precision) * _tril_mask(
        L.shape[-1], L.dtype
    )
    return Lbar, Bbar


trsm_lower_t_ad.defvjp(_trsm_lower_t_ad_fwd, _trsm_lower_t_ad_bwd)


def _tril_inv_fori(
    L: Array, block: int, invs: Array, precision: str | None = None
) -> Array:
    """fori_loop blocked triangular inverse (compile-size-safe for large
    nb; masked full-width row reads like :func:`_trsm_lower_fori`)."""
    n = L.shape[-1]
    nb = n // block

    def step(k, X):
        c0 = k * block
        L_rows = jax.lax.dynamic_slice(L, (c0, 0), (block, n))
        # X rows >= c0 are still zero, so L_rows @ X picks up exactly
        # L[k, :k] @ W[:k]; W's triangularity keeps columns >= c0 zero
        upd = -jnp.matmul(
            invs[k], jnp.matmul(L_rows, X, precision=precision),
            precision=precision,
        )
        row = upd + jax.lax.dynamic_update_slice(
            jnp.zeros((block, n), L.dtype), invs[k], (0, c0)
        )
        return jax.lax.dynamic_update_slice(X, row, (c0, 0))

    return jax.lax.fori_loop(0, nb, step, jnp.zeros_like(L))


def blocked_tril_inv(
    L: Array,
    block: int = DEFAULT_BLOCK,
    invs: Array | None = None,
    precision: str | None = None,
) -> Array:
    """W = inv(L) for lower-triangular L, exploiting W's triangularity.

    Forward substitution down block rows, but unlike
    ``blocked_trsm_lower(L, I)`` the trailing product runs only over the
    nonzero (c0, c0) corner of W — ~2n^3/3 FLOPs instead of ~2n^3.
    ``invs``: optional (nb, block, block) diagonal-tile inverses (the
    factorization by-product); computed when omitted.
    """
    n = L.shape[-1]
    if n % block != 0:
        raise ValueError(f"n={n} must be a multiple of block={block}")
    nb = n // block
    if invs is None:
        invs = _tile_invs(L, block, precision)
    if nb > _MAX_UNROLL_STEPS:
        return _tril_inv_fori(L, block, invs, precision)
    X = jnp.zeros_like(L)
    for k in range(nb):
        c0, c1 = k * block, (k + 1) * block
        if k > 0:
            blk = -jnp.matmul(
                invs[k],
                jnp.matmul(L[c0:c1, :c0], X[:c0, :c0], precision=precision),
                precision=precision,
            )
            X = X.at[c0:c1, :c0].set(blk)
        X = X.at[c0:c1, c0:c1].set(invs[k])
    return X


def syrk_lower_t(W: Array, precision: str | None = None, min_size: int = 1024) -> Array:
    """W^T W for LOWER-TRIANGULAR W, exploiting the triangularity.

    A dense dot_general spends 2n^3 flops; recursive 2x2 splitting

        [W1 0; W2 W3]^T [W1 0; W2 W3] =
            [W1^T W1 + W2^T W2,  W2^T W3]
            [   (W2^T W3)^T,     W3^T W3]

    recurses on the triangular W1/W3 diagonal blocks and pays dense
    matmuls only for the genuinely dense W2 quarter: T(n) = 2 T(n/2) +
    n^3/2, i.e. ~2n^3/3 — 3x fewer flops, all of them large MXU matmuls
    (no Pallas needed; the recursion is unrolled at trace time down to
    ``min_size``).  Used by the lml_core backward where K^{-1} = W^T W
    with W = inv(L).
    """
    n = W.shape[-1]
    if n <= min_size or n % 2 != 0 or (n // 2) % 8 != 0:
        return jax.lax.dot_general(
            W, W, (((0,), (0,)), ((), ())),
            preferred_element_type=W.dtype, precision=precision,
        )
    h = n // 2
    W1 = W[:h, :h]
    W2 = W[h:, :h]
    W3 = W[h:, h:]
    top_left = syrk_lower_t(W1, precision, min_size) + jax.lax.dot_general(
        W2, W2, (((0,), (0,)), ((), ())),
        preferred_element_type=W.dtype, precision=precision,
    )
    off = jax.lax.dot_general(
        W2, W3, (((0,), (0,)), ((), ())),
        preferred_element_type=W.dtype, precision=precision,
    )  # (h, h) = W2^T W3
    bottom_right = syrk_lower_t(W3, precision, min_size)
    top = jnp.concatenate([top_left, off], axis=1)
    bottom = jnp.concatenate([off.T, bottom_right], axis=1)
    return jnp.concatenate([top, bottom], axis=0)


def _phi(A: Array) -> Array:
    """tril(A) with the diagonal halved — the Cholesky pullback projector.

    Diagonal extracted with a broadcasted-iota equality mask: ``jnp.diag``
    of a vector lowers to a TPU scatter (measured ~40 ms at n=4096,
    DESIGN.md par.3) and this sits on the gradient hot path.
    """
    n = A.shape[-1]
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return jnp.tril(A) - 0.5 * jnp.where(r == c, A, 0.0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def cholesky(
    K: Array, block: int = DEFAULT_BLOCK, precision: str | None = None
) -> Array:
    return blocked_cholesky(K, block, precision)


def _chol_fwd(K, block, precision):
    L = blocked_cholesky(K, block, precision)
    return L, L


def _chol_bwd(block, precision, L, Lbar):
    # Murray (2016): K_bar = 0.5 * L^-T (Phi(L^T Lbar) + Phi(L^T Lbar)^T) L^-1
    # precision is a nondiff STATIC argument so this backward trace honors
    # it — an ambient jax.default_matmul_precision context inside a
    # differentiated caller does NOT reach here (the transpose is traced
    # outside the caller's dynamic extent; verified by jaxpr inspection).
    P = _phi(jnp.matmul(L.T, Lbar, precision=precision))
    # S = L^-T P: transpose-solve; then K_bar = S L^-1 = (L^-T S^T)^T
    S = blocked_trsm_lower_t(L, P, block, precision)
    Kbar = blocked_trsm_lower_t(L, S.T, block, precision).T
    Kbar = 0.5 * (Kbar + Kbar.T)
    return (Kbar,)


cholesky.defvjp(_chol_fwd, _chol_bwd)


def _eligible_block(K: Array) -> int | None:
    """Block size if the blocked-Pallas path should handle this matrix.

    Under force_interpret (tests) any divisible size qualifies; otherwise
    TPU + f32 + n >= _MIN_N + divisibility.  Shapes seen here are the
    per-example shapes even under vmap (batching maps the pallas grid).
    """
    if K.ndim != 2 or K.shape[-1] != K.shape[-2]:
        return None
    n = K.shape[-1]
    if _INTERPRET:
        for b in (DEFAULT_BLOCK, 128, 64, 32, 16, 8):
            if n % b == 0:
                return b
        return None
    if not _ENABLED or not _on_tpu():
        return None
    if K.dtype != jnp.float32:
        return None
    if n < _MIN_N:
        return None
    # Larger tiles amortize per-step HBM traffic at large n: measured 16k
    # f32 factorization 48.5 ms at block 512 vs 80.9 at 256 (XLA: 72.5).
    # 1024-tiles blow up Mosaic compile time — do not raise further.
    if n >= 8192 and n % 512 == 0:
        return 512
    if n % DEFAULT_BLOCK != 0:
        return None
    return DEFAULT_BLOCK


def maybe_pallas_cholesky(K: Array, precision: str | None = None):
    """Dispatch: the blocked Pallas path when it's profitable, else None."""
    block = _eligible_block(K)
    return None if block is None else cholesky(K, block, precision)


# ---------------------------------------------------------------------------
# Fused log-marginal-likelihood core with the exact analytic pullback.
#
# lml_core(K, y) = -1/2 (log|K| + y^T K^-1 y); the -(n/2) log 2pi constant
# and masking conventions live in the GP layer (padded rows carry identity
# rows in K and zeros in y, so they contribute log 1 + 0 here).
#
# Backward (GPML eq. 5.9): dlml = -1/2 tr(K^-1 dK) + 1/2 a^T dK a with
# a = K^-1 y, so  Kbar = g * 1/2 (a a^T - K^-1)  and  ybar = -g a.  This
# skips the generic Cholesky pullback entirely — no Phi projector, no
# L^T @ Lbar full matmul — and costs two blocked mat-TRSMs for K^-1.
# ---------------------------------------------------------------------------


def _chol_invs_for_lml(K: Array, block: int, precision: str | None = None):
    """Factorization + tile inverses for the lml core, batching-aware.

    Unbatched: the blocked/fused Pallas drivers.  Under vmap: XLA's native
    batched Cholesky (measured faster than the serialized-grid Pallas
    drivers on batches — B=8 n=1024: 1.66 vs 2.40 ms) + vmapped Pallas
    tile inversions for the solves' diagonal-tile inverses.
    """

    @jax.custom_batching.custom_vmap
    def f(K):
        return blocked_cholesky_invs(K, block, precision)

    @f.def_vmap
    def _(axis_size, in_batched, Kb):
        L = jnp.linalg.cholesky(Kb)
        invs = jax.vmap(lambda l: _tile_invs(l, block, precision))(L)
        return (L, invs), (True, True)

    return f(K)


def _lml_core_impl(K: Array, y: Array, block: int, precision: str | None = None):
    L, invs = _chol_invs_for_lml(K, block, precision)
    n = K.shape[-1]
    # streaming solves reuse the tile inverses the factorization already
    # produced.  The 1-D panel form keeps a (block, n) L panel in VMEM per
    # grid step; past ~8 MB that overflows scoped VMEM (observed at 16k x
    # 512) — the triangular-grid form holds one (block, block) tile per
    # step (any n) and DMAs only the lower triangle.
    panel_bytes = block * n * K.dtype.itemsize
    if (block % 128 == 0 and panel_bytes <= 8 * 1024 * 1024) or _INTERPRET:
        z = pallas_trsv_lower(L, y, invs, block, precision)
        alpha = pallas_trsv_lower_t(L, z, invs, block, precision)
    elif block % 128 == 0:
        z = pallas_trsv2d_lower(L, y, invs, block, precision)
        alpha = pallas_trsv2d_lower_t(L, z, invs, block, precision)
    else:
        z = blocked_trsm_lower(L, y, block, precision)
        alpha = blocked_trsm_lower_t(L, z, block, precision)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
    value = -0.5 * (logdet + jnp.dot(z, z))
    return value, (L, alpha, invs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def lml_core(
    K: Array, y: Array, block: int = DEFAULT_BLOCK, precision: str | None = None
) -> Array:
    value, _ = _lml_core_impl(K, y, block, precision)
    return value


def _lml_core_fwd(K, y, block, precision):
    return _lml_core_impl(K, y, block, precision)


def _lml_core_bwd(block, precision, res, g):
    L, alpha, invs = res
    # K^-1 = W^T W with W = inv(L): one blocked triangular inverse
    # (~2n^3/3 FLOPs, reusing the factorization's tile inverses) plus one
    # dense MXU matmul — replaces two sequential full-width TRSMs.
    # precision is a static argument precisely so THIS trace sees it: the
    # backward is traced outside any ambient context a caller's function
    # body established (see _chol_bwd note).
    W = blocked_tril_inv(L, block, invs, precision)
    Kinv = syrk_lower_t(W, precision)
    Kbar = (0.5 * g) * (jnp.outer(alpha, alpha) - Kinv)
    ybar = -g * alpha
    return Kbar, ybar


lml_core.defvjp(_lml_core_fwd, _lml_core_bwd)


def maybe_lml_core(K: Array, y: Array, precision: str | None = None):
    """Dispatch the fused lml core when the blocked path qualifies."""
    if y.ndim != 1:
        return None
    block = _eligible_block(K)
    return None if block is None else lml_core(K, y, block, precision)
