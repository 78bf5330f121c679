"""Pallas TPU kernel: fused correlation softmax + label propagation.

The SOT/VOS hot op (SURVEY.md §7 hard parts): out[k, j] = sum_i v[k, i] *
softmax_i(e0[i] . e1[j]) over N = H/8*W/8 pixels (16k x 16k at 800x1280,
~1 GB if materialized). This kernel streams i-blocks with online (flash-
style) softmax: the score matrix never leaves VMEM; HBM traffic is O(N*C).

Grid: (j_blocks, i_blocks), i minor (sequential revisiting of the j output
block); running max / denom / numerator live in VMEM scratch.

Oracle: ops/correlation.correlation_propagate (chunked XLA) — tests compare
both (the dual-implementation pattern, reference ops/test.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _corr_kernel(e0_ref, e1_ref, v_ref, out_ref, m_ref, l_ref, acc_ref,
                 *, n_i_blocks: int, block_i: int, n_valid: int,
                 bf16_dots: bool = False):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    e0 = e0_ref[...]            # (BI, C)
    e1 = e1_ref[...]            # (BJ, C)
    v = v_ref[...]              # (K, BI)
    if bf16_dots:
        # inference-mode precision, mirroring the reference's fp16
        # correlation (unicorn_sot.py:94-97); accumulation stays fp32
        e0 = e0.astype(jnp.bfloat16)
        e1 = e1.astype(jnp.bfloat16)

    s = jax.lax.dot_general(
        e0, e1, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                           # (BI, BJ)
    # mask padded source rows (global index >= n_valid)
    row_ids = i * block_i + jax.lax.broadcasted_iota(
        jnp.int32, s.shape, dimension=0)
    s = jnp.where(row_ids < n_valid, s, -1e30)

    m_old = m_ref[...]          # (1, BJ)
    m_new = jnp.maximum(m_old, jnp.max(s, axis=0, keepdims=True))
    alpha = jnp.exp(m_old - m_new)          # (1, BJ)
    p = jnp.exp(s - m_new)                  # (BI, BJ)
    l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=0, keepdims=True)
    pv = jax.lax.dot_general(
        v, p, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                           # (K, BJ)
    acc_ref[...] = acc_ref[...] * alpha + pv
    m_ref[...] = m_new

    @pl.when(i == n_i_blocks - 1)
    def _():
        out_ref[...] = acc_ref[...] / l_ref[...]


@functools.partial(jax.jit, static_argnames=("block_i", "block_j", "interpret",
                                             "bf16_dots"))
def correlation_propagate_pallas(e0, e1, v, block_i: int = 512,
                                 block_j: int = 256, interpret: bool = False,
                                 bf16_dots: bool = False):
    """e0 (B, N, C), e1 (B, N, C), v (B, K, N) -> (B, K, N).

    N is zero-padded up to a multiple of lcm(block_i, block_j); padded source
    rows are masked to -inf scores inside the kernel (TPU block shapes must be
    multiples of (8, 128)); padded target columns are sliced off the output.
    """
    B, N, C = e0.shape
    K = v.shape[1]
    import math

    align = math.lcm(block_i, block_j)
    n_pad = (-N) % align
    if n_pad:
        e0 = jnp.pad(e0, ((0, 0), (0, n_pad), (0, 0)))
        e1 = jnp.pad(e1, ((0, 0), (0, n_pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, n_pad)))
    Np = N + n_pad
    n_i = Np // block_i
    n_j = Np // block_j

    grid_spec = pl.GridSpec(
        grid=(n_j, n_i),
        in_specs=[
            pl.BlockSpec((block_i, C), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_j, C), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, block_i), lambda j, i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, block_j), lambda j, i: (0, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1, block_j), jnp.float32),
            pltpu.VMEM((1, block_j), jnp.float32),
            pltpu.VMEM((K, block_j), jnp.float32),
        ],
    )

    kernel = functools.partial(_corr_kernel, n_i_blocks=n_i,
                               block_i=block_i, n_valid=N,
                               bf16_dots=bf16_dots)

    def one(e0_b, e1_b, v_b):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((K, Np), jnp.float32),
            interpret=interpret,
        )(e0_b.astype(jnp.float32), e1_b.astype(jnp.float32),
          v_b.astype(jnp.float32))

    return jax.vmap(one)(e0, e1, v)[:, :, :N]


def pick_blocks(N: int, target_i: int = 512, target_j: int = 256):
    """Block sizes: multiples of 128 (TPU lane constraint); padding inside
    the kernel handles non-divisible N."""
    bi = min(target_i, max(128, (N // 128) * 128 if N >= 128 else 128))
    bj = min(target_j, bi)
    return (bi // 128) * 128 or 128, (bj // 128) * 128 or 128


def correlation_propagate_auto(e0, e1, v, use_pallas: bool = True):
    """Dispatch: pallas kernel on TPU backends (2x the XLA chunked version at
    N=16k), XLA chunked streaming on CPU/small shapes."""
    from .correlation import correlation_propagate

    on_tpu = jax.default_backend() == "tpu"
    N = e0.shape[1]
    if not use_pallas or not on_tpu or N < 256:
        return correlation_propagate(e0, e1, v)
    bi, bj = pick_blocks(N)
    return correlation_propagate_pallas(e0, e1, v, block_i=bi, block_j=bj,
                                        bf16_dots=True)


# ---------------------------------------------------------------------------
# custom VJP: flash-style backward (training can use the kernel too)
# ---------------------------------------------------------------------------

def _corr_fwd_lse_kernel(e0_ref, e1_ref, v_ref, out_ref, lse_ref,
                         m_ref, l_ref, acc_ref,
                         *, n_i_blocks: int, block_i: int, n_valid: int):
    """Forward that also emits the column logsumexp (for the backward)."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    e0 = e0_ref[...]
    e1 = e1_ref[...]
    v = v_ref[...]
    s = jax.lax.dot_general(e0, e1, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    row_ids = i * block_i + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    s = jnp.where(row_ids < n_valid, s, -1e30)
    m_old = m_ref[...]
    m_new = jnp.maximum(m_old, jnp.max(s, axis=0, keepdims=True))
    alpha = jnp.exp(m_old - m_new)
    p = jnp.exp(s - m_new)
    l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=0, keepdims=True)
    pv = jax.lax.dot_general(v, p, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    acc_ref[...] = acc_ref[...] * alpha + pv
    m_ref[...] = m_new

    @pl.when(i == n_i_blocks - 1)
    def _():
        out_ref[...] = acc_ref[...] / l_ref[...]
        lse_ref[...] = m_ref[...] + jnp.log(l_ref[...])


def _corr_bwd_i_kernel(e0_ref, e1_ref, v_ref, lse_ref, do_ref, c_ref,
                       de0_ref, dv_ref, de0_acc, dv_acc,
                       *, n_j_blocks: int, block_i: int, n_valid: int):
    """grid (i, j minor): accumulates dE0 (BI, C) and dV (K, BI) over j."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        de0_acc[...] = jnp.zeros_like(de0_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    e0 = e0_ref[...]            # (BI, C)
    e1 = e1_ref[...]            # (BJ, C)
    v = v_ref[...]              # (K, BI)
    lse = lse_ref[...]          # (1, BJ)
    do = do_ref[...]            # (K, BJ)
    c = c_ref[...]              # (1, BJ) = sum_k O*dO per column

    s = jax.lax.dot_general(e0, e1, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    row_ids = i * block_i + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    s = jnp.where(row_ids < n_valid, s, -1e30)
    p = jnp.exp(s - lse)                          # (BI, BJ)
    # dP[i, j] = sum_k V[k, i] dO[k, j]
    dp = jax.lax.dot_general(v, do, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (BI, BJ)
    ds = p * (dp - c)                             # (BI, BJ)
    de0_acc[...] += jax.lax.dot_general(
        ds, e1, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    # dV[k, i] = sum_j P[i, j] dO[k, j]
    dv_acc[...] += jax.lax.dot_general(
        do, p, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(j == n_j_blocks - 1)
    def _():
        de0_ref[...] = de0_acc[...]
        dv_ref[...] = dv_acc[...]


def _corr_bwd_j_kernel(e0_ref, e1_ref, v_ref, lse_ref, do_ref, c_ref,
                       de1_ref, de1_acc,
                       *, n_i_blocks: int, block_i: int, n_valid: int):
    """grid (j, i minor): accumulates dE1 (BJ, C) over i."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        de1_acc[...] = jnp.zeros_like(de1_acc)

    e0 = e0_ref[...]
    e1 = e1_ref[...]
    v = v_ref[...]
    lse = lse_ref[...]
    do = do_ref[...]
    c = c_ref[...]
    s = jax.lax.dot_general(e0, e1, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    row_ids = i * block_i + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    s = jnp.where(row_ids < n_valid, s, -1e30)
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(v, do, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - c)                             # (BI, BJ)
    de1_acc[...] += jax.lax.dot_general(
        ds, e0, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(i == n_i_blocks - 1)
    def _():
        de1_ref[...] = de1_acc[...]


def _pad_ncs(e0, e1, v, block_i, block_j):
    import math

    N = e0.shape[1]
    align = math.lcm(block_i, block_j)
    n_pad = (-N) % align
    if n_pad:
        e0 = jnp.pad(e0, ((0, 0), (0, n_pad), (0, 0)))
        e1 = jnp.pad(e1, ((0, 0), (0, n_pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, n_pad)))
    return e0, e1, v, N, N + n_pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def correlation_propagate_pallas_vjp(e0, e1, v, block_i: int = 512,
                                     block_j: int = 256,
                                     interpret: bool = False):
    out, _ = _corr_fwd_lse(e0, e1, v, block_i, block_j, interpret)
    return out


def _corr_fwd_lse(e0, e1, v, block_i, block_j, interpret):
    e0, e1, v, N, Np = _pad_ncs(e0, e1, v, block_i, block_j)
    B, _, C = e0.shape
    K = v.shape[1]
    n_i = Np // block_i
    n_j = Np // block_j
    grid_spec = pl.GridSpec(
        grid=(n_j, n_i),
        in_specs=[
            pl.BlockSpec((block_i, C), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_j, C), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, block_i), lambda j, i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((K, block_j), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_j), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, block_j), jnp.float32),
            pltpu.VMEM((1, block_j), jnp.float32),
            pltpu.VMEM((K, block_j), jnp.float32),
        ],
    )
    kernel = functools.partial(_corr_fwd_lse_kernel, n_i_blocks=n_i,
                               block_i=block_i, n_valid=N)

    def one(e0_b, e1_b, v_b):
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((K, Np), jnp.float32),
                       jax.ShapeDtypeStruct((1, Np), jnp.float32)),
            interpret=interpret,
        )(e0_b.astype(jnp.float32), e1_b.astype(jnp.float32),
          v_b.astype(jnp.float32))

    out, lse = jax.vmap(one)(e0, e1, v)
    return out[:, :, :N], lse


def _corr_vjp_fwd(e0, e1, v, block_i, block_j, interpret):
    out, lse = _corr_fwd_lse(e0, e1, v, block_i, block_j, interpret)
    return out, (e0, e1, v, out, lse)


def _corr_vjp_bwd(block_i, block_j, interpret, res, dout):
    e0, e1, v, out, lse = res
    N = e0.shape[1]
    e0p, e1p, vp, _, Np = _pad_ncs(e0, e1, v, block_i, block_j)
    B, _, C = e0p.shape
    K = vp.shape[1]
    n_i = Np // block_i
    n_j = Np // block_j
    doutp = jnp.pad(dout.astype(jnp.float32),
                    ((0, 0), (0, 0), (0, Np - N)))
    outp = jnp.pad(out.astype(jnp.float32), ((0, 0), (0, 0), (0, Np - N)))
    # c[j] = sum_k O[k, j] dO[k, j]
    c = jnp.sum(outp * doutp, axis=1, keepdims=True)  # (B, 1, Np)

    # kernel B1: grid (i, j minor) -> dE0, dV
    gs1 = pl.GridSpec(
        grid=(n_i, n_j),
        in_specs=[
            pl.BlockSpec((block_i, C), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_j, C), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, block_i), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_j), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, block_j), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_j), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_i, C), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, block_i), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_i, C), jnp.float32),
            pltpu.VMEM((K, block_i), jnp.float32),
        ],
    )
    k1 = functools.partial(_corr_bwd_i_kernel, n_j_blocks=n_j,
                           block_i=block_i, n_valid=N)

    gs2 = pl.GridSpec(
        grid=(n_j, n_i),
        in_specs=[
            pl.BlockSpec((block_i, C), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_j, C), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, block_i), lambda j, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_j), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, block_j), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_j), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_j, C), lambda j, i: (j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((block_j, C), jnp.float32)],
    )
    k2 = functools.partial(_corr_bwd_j_kernel, n_i_blocks=n_i,
                           block_i=block_i, n_valid=N)

    def one(e0_b, e1_b, v_b, lse_b, do_b, c_b):
        de0, dv = pl.pallas_call(
            k1, grid_spec=gs1,
            out_shape=(jax.ShapeDtypeStruct((Np, C), jnp.float32),
                       jax.ShapeDtypeStruct((K, Np), jnp.float32)),
            interpret=interpret,
        )(e0_b, e1_b, v_b, lse_b, do_b, c_b)
        de1 = pl.pallas_call(
            k2, grid_spec=gs2,
            out_shape=jax.ShapeDtypeStruct((Np, C), jnp.float32),
            interpret=interpret,
        )(e0_b, e1_b, v_b, lse_b, do_b, c_b)
        return de0, dv, de1

    de0, dv, de1 = jax.vmap(one)(
        e0p.astype(jnp.float32), e1p.astype(jnp.float32),
        vp.astype(jnp.float32), lse, doutp, c)
    return (de0[:, :N].astype(e0.dtype), de1[:, :N].astype(e1.dtype),
            dv[:, :, :N].astype(v.dtype))


correlation_propagate_pallas_vjp.defvjp(_corr_vjp_fwd, _corr_vjp_bwd)


def correlation_propagate_train(e0, e1, v, use_pallas: bool = True):
    """Differentiable dispatch for TRAINING: pallas custom-VJP kernel on TPU,
    XLA chunked (autodiff'd) elsewhere."""
    from .correlation import correlation_propagate

    on_tpu = jax.default_backend() == "tpu"
    N = e0.shape[1]
    if not use_pallas or not on_tpu or N < 256:
        return correlation_propagate(e0, e1, v)
    bi, bj = pick_blocks(N)
    return correlation_propagate_pallas_vjp(e0, e1, v, bi, bj, False)
