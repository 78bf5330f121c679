"""Multi-scale deformable attention sampling, TPU-native.

The reference implements this as a CUDA im2col kernel
(unicorn/models/ops/src/cuda/ms_deform_im2col_cuda.cuh) with a pure-PyTorch
grid_sample oracle (unicorn/models/ops/functions/ms_deform_attn_func.py:41-62).

Two XLA formulations, same semantics, same interface:
  * "gather": static-shape take_along_axis + bilinear weights — exact,
    fast on CPU, but TPU gathers of 2M 32-float rows are slow (~18 ms at
    Lq=8000, the SOT hot shape).
  * "onehot": each query row is a 16-tap sparse row over the flattened
    spatial dim; materialize it chunk-wise via iota-compare accumulation and
    contract on the MXU (a matmul instead of a gather; 3x faster on TPU).
    In f32 it is bit-equivalent selection; in bf16 only the tap weights
    round.
"auto" picks the fused factored Pallas kernel for bf16 values on TPU
(serving: 2.90 ms vs 6.28 XLA factored at the 8k-query SOT shape), the XLA
factored one-hot for fp32 on TPU (training), gather elsewhere. All
differentiate correctly (grads flow through the bilinear tap weights and
the value rows — the tap indices are piecewise constant, as in the CUDA
backward; the Pallas kernels route their VJP through the XLA forms).

Semantics match F.grid_sample(mode='bilinear', padding_mode='zeros',
align_corners=False): pixel coordinate x_pix = loc * W - 0.5, out-of-range
corners contribute zero.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# "auto" resolution override for the TPU path (None = the measured default).
# set_msda_method("pallas_factored") opts serving into the fused factored
# kernel; bench.py wires BENCH_MSDA to this.
_MSDA_TPU_METHOD = None


_MSDA_METHODS = (None, "gather", "onehot", "onehot_factored",
                 "pallas", "pallas_factored")


def set_msda_method(method):
    """Override the method "auto" picks on TPU (None restores default).

    TRACE-TIME semantics: the override is read when a jitted caller is
    traced, and is NOT part of any jit cache key — call this BEFORE the
    first trace of any function that reaches ms_deform_attn(method="auto").
    Calling it afterwards silently has no effect on already-cached traces
    (bench.py sets BENCH_MSDA before model build for exactly this reason).
    """
    global _MSDA_TPU_METHOD
    if method not in _MSDA_METHODS:
        raise ValueError(
            f"unknown MSDA method {method!r}; expected one of "
            f"{[m for m in _MSDA_METHODS if m]} or None")
    _MSDA_TPU_METHOD = method


def _pallas_factored_fits(value, q_block: int = 256,
                          budget_bytes: int = 10 * 2**20) -> bool:
    """VMEM-footprint guard for the "auto" -> pallas_factored route.

    _msda_pallas_factored stages, per grid step, the full (H*W, D) value
    block, the (H, W, QB) fp32 weight-tile accumulator, and its (H*W, QB)
    dt cast. At the serving shapes (HW<=4000) that is ~3.5 MB; a future
    caller with a stride-8 map (HW 16k+) would exceed VMEM (~16 MB/core)
    and fail Mosaic compilation. Fall back to the XLA factored path there
    instead of erroring (the budget leaves headroom for taps + double
    buffering)."""
    B, L, H, W, M, D = value.shape
    qb = q_block  # QB = min(q_block, round_up(Lq, 128)) <= q_block
    est = (H * W * D * value.dtype.itemsize      # value block
           + H * W * qb * 4                      # fp32 accumulator tile
           + H * W * qb * value.dtype.itemsize)  # dt-cast wmat
    return est <= budget_bytes


def _bilinear_taps(sampling_locations, attention_weights, H, W):
    """(B,Lq,M,L,P,2) locs -> 16-tap (idx, weight), both (B, Lq, M, L, P*4)."""
    x = sampling_locations[..., 0] * W - 0.5
    y = sampling_locations[..., 1] * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = x - x0
    ly = y - y0
    idxs, wts = [], []
    for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
        cx = x0 + dx
        cy = y0 + dy
        w_c = (lx if dx else (1.0 - lx)) * (ly if dy else (1.0 - ly))
        in_range = (cx >= 0) & (cx < W) & (cy >= 0) & (cy < H)
        wts.append(jnp.where(in_range, w_c, 0.0) * attention_weights)
        idxs.append((jnp.clip(cy, 0, H - 1) * W
                     + jnp.clip(cx, 0, W - 1)).astype(jnp.int32))
    B, Lq, M, L, P = attention_weights.shape
    return (jnp.stack(idxs, -1).reshape(B, Lq, M, L, P * 4),
            jnp.stack(wts, -1).reshape(B, Lq, M, L, P * 4))


def ms_deform_attn(value, sampling_locations, attention_weights,
                   method: str = "auto", q_chunk: int = 1000):
    """Deformable attention aggregation over L equal-shape levels.

    Args:
      value: (B, L, H, W, M, D) per-level value maps split into M heads.
      sampling_locations: (B, Lq, M, L, P, 2) normalized (x, y) in [0, 1].
      attention_weights: (B, Lq, M, L, P), already softmaxed over L*P.
      method: "gather" | "onehot" | "onehot_factored" | "pallas" |
        "pallas_factored" | "auto" (TPU: pallas_factored for bf16 values
        [2.90 ms at the 8k-query SOT shape], onehot_factored for fp32
        [6.28 ms; direct pallas 12.3, XLA gather ~18]; CPU: gather).

    Returns:
      (B, Lq, M * D)
    """
    if method == "auto":
        # measured at the SOT shape (v5e, bf16): factored one-hot 4.2 ms
        # (q_chunk 500), direct one-hot 4.8 ms, fused Pallas 10.0 ms (the
        # dense compare-build is VPU-bound; without per-element VMEM gather
        # support a dense Pallas formulation cannot win — kept as an explicit
        # method for future toolchains), XLA gather ~18 ms.
        if jax.default_backend() == "tpu":
            method, q_chunk = "onehot_factored", min(q_chunk, 500)
            if value.dtype == jnp.bfloat16 and _pallas_factored_fits(value):
                # serving (serve_interact_bf16): the fused factored VMEM
                # kernel measures 2.90 ms vs 6.28 XLA at the 8k-query SOT
                # shape (perf_lab msda, v5e). Training interaction is fp32
                # and stays on the XLA path (autodiff, fp32-MXU penalty
                # identical either way, unmeasured -> unchanged).
                method = "pallas_factored"
            if _MSDA_TPU_METHOD is not None:
                method = _MSDA_TPU_METHOD
        else:
            method = "gather"
    if method == "pallas":
        return _msda_pallas_vjp(value, sampling_locations, attention_weights)
    if method == "pallas_factored":
        return _msda_pallas_factored_vjp(value, sampling_locations,
                                         attention_weights)
    if method == "onehot":
        return _msda_onehot(value, sampling_locations, attention_weights,
                            q_chunk)
    if method == "onehot_factored":
        return _msda_onehot_factored(value, sampling_locations,
                                     attention_weights, q_chunk)
    return _msda_gather(value, sampling_locations, attention_weights)


def _msda_gather(value, sampling_locations, attention_weights):
    B, L, H, W, M, D = value.shape
    _, Lq, _, _, P, _ = sampling_locations.shape
    idx, wts = _bilinear_taps(sampling_locations, attention_weights, H, W)
    # value laid out for gathering along flattened spatial dim
    v = value.transpose(0, 1, 4, 2, 3, 5).reshape(B, L, M, H * W, D)
    idx_g = idx.transpose(0, 3, 2, 1, 4).reshape(B, L, M, Lq * P * 4)
    gathered = jnp.take_along_axis(v, idx_g[..., None], axis=3)
    gathered = gathered.reshape(B, L, M, Lq, P * 4, D)
    w_g = wts.transpose(0, 3, 2, 1, 4)  # (B, L, M, Lq, P*4)
    out = jnp.einsum("blmqkd,blmqk->bqmd", gathered, w_g.astype(value.dtype))
    return out.reshape(B, Lq, M * D)


def _msda_onehot(value, sampling_locations, attention_weights, q_chunk):
    B, L, H, W, M, D = value.shape
    _, Lq, _, _, P, _ = sampling_locations.shape
    HW = H * W
    K = P * 4
    dt = value.dtype
    idx, wts = _bilinear_taps(sampling_locations, attention_weights, H, W)
    v = value.transpose(0, 1, 4, 2, 3, 5).reshape(B, L, M, HW, D)
    # pad Lq to a multiple of q_chunk (static shapes)
    q_chunk = min(q_chunk, Lq)
    n_pad = (-Lq) % q_chunk
    if n_pad:
        idx = jnp.pad(idx, ((0, 0), (0, n_pad), (0, 0), (0, 0), (0, 0)))
        wts = jnp.pad(wts, ((0, 0), (0, n_pad), (0, 0), (0, 0), (0, 0)))
    nq = (Lq + n_pad) // q_chunk
    idx = idx.transpose(1, 0, 3, 2, 4).reshape(nq, q_chunk, B, L, M, K)
    wts = wts.transpose(1, 0, 3, 2, 4).reshape(nq, q_chunk, B, L, M, K)
    iota = jnp.arange(HW, dtype=jnp.int32)

    # jax.checkpoint: the (B,L,M,qc,HW) one-hot matrix must be RECOMPUTED in
    # the backward pass, not stored — storing it as a scan residual costs
    # n_chunks x ~2 GB at the training shape (observed 39 GB HBM OOM)
    @jax.checkpoint
    def chunk_fn(i_c, w_c):
        i_c = i_c.transpose(1, 2, 3, 0, 4)   # (B, L, M, qc, K)
        w_c = w_c.transpose(1, 2, 3, 0, 4).astype(dt)
        Wmat = jnp.zeros((B, L, M, i_c.shape[3], HW), dt)
        for k in range(K):  # 16 iota-compare accumulate passes
            oh = (i_c[..., k:k + 1] == iota).astype(dt)
            Wmat = Wmat + w_c[..., k:k + 1] * oh
        return jnp.einsum("blmqh,blmhd->bqmd", Wmat, v)

    def chunk(carry, inp):
        i_c, w_c = inp  # (q_chunk, B, L, M, K)
        return carry, chunk_fn(i_c, w_c)

    _, outs = jax.lax.scan(chunk, 0, (idx, wts))
    out = outs.transpose(1, 0, 2, 3, 4).reshape(B, Lq + n_pad, M, D)[:, :Lq]
    return out.reshape(B, Lq, M * D)


def _msda_pallas(value, sampling_locations, attention_weights,
                 q_block: int = 256, interpret: bool = False):
    """Fused Pallas sampling kernel (TPU).

    Same semantics as _msda_onehot, but the (q_block, HW) tap-weight matrix is
    built in VMEM and contracted on the MXU without ever materializing in HBM
    — the HBM round-trip of that matrix (~1 GB/frame at the SOT shape) is what
    makes the XLA one-hot formulation slow. Each (level, head) value map
    (HW x D, ~256 KB bf16) fits entirely in VMEM; the grid accumulates over
    levels via output revisiting. Forward-only: ms_deform_attn wires a
    custom VJP that recomputes the backward through the XLA gather/one-hot
    formulation (tap indices are piecewise constant, as in the reference CUDA
    backward, ms_deform_im2col_cuda.cuh).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L, H, W, M, D = value.shape
    _, Lq, _, _, P, _ = sampling_locations.shape
    HW = H * W
    K = P * 4
    dt = value.dtype

    idx, wts = _bilinear_taps(sampling_locations, attention_weights, H, W)
    # per-(l, m) layouts
    idx = idx.transpose(0, 3, 2, 1, 4)                  # (B, L, M, Lq, K)
    wts = wts.transpose(0, 3, 2, 1, 4).astype(dt)
    v = value.transpose(0, 1, 4, 2, 3, 5).reshape(B, L, M, HW, D)

    QB = min(q_block, _round_up(Lq, 8))
    Lq_p = _round_up(Lq, QB)
    HW_p = _round_up(HW, 128)
    if Lq_p != Lq:
        pad = ((0, 0), (0, 0), (0, 0), (0, Lq_p - Lq), (0, 0))
        idx = jnp.pad(idx, pad)
        wts = jnp.pad(wts, pad)
    if HW_p != HW:
        v = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, HW_p - HW), (0, 0)))
    nq = Lq_p // QB

    def kern(idx_ref, wts_ref, v_ref, out_ref):
        l = pl.program_id(3)
        ii = idx_ref[0, 0, 0]                            # (QB, K) int32
        ww = wts_ref[0, 0, 0]                            # (QB, K)
        vv = v_ref[0, 0, 0]                              # (HW_p, D)
        iota = jax.lax.broadcasted_iota(jnp.int32, (QB, HW_p), 1)
        wmat = jnp.zeros((QB, HW_p), dt)
        for k in range(K):
            # arithmetic one-hot: a broadcasted where() select hits a Mosaic
            # relayout bug on (QB, 1) true-operands; compare->cast->multiply
            # lowers cleanly
            oh = (iota == ii[:, k:k + 1]).astype(dt)
            wmat = wmat + ww[:, k:k + 1] * oh
        contrib = jnp.dot(wmat, vv, preferred_element_type=jnp.float32)

        @pl.when(l == 0)
        def _():
            out_ref[0, 0, :, :] = contrib

        @pl.when(l > 0)
        def _():
            out_ref[0, 0, :, :] += contrib

    out = pl.pallas_call(
        kern,
        grid=(B, nq, M, L),
        in_specs=[
            pl.BlockSpec((1, 1, 1, QB, K), lambda b, q, m, l: (b, l, m, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, QB, K), lambda b, q, m, l: (b, l, m, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, HW_p, D), lambda b, q, m, l: (b, l, m, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # out laid out (B, M, Lq, D): Mosaic requires the last two block dims
        # to be (8, 128)-divisible or full — (QB, D) qualifies, (QB, 1, D)
        # would not.
        out_specs=pl.BlockSpec((1, 1, QB, D), lambda b, q, m, l: (b, m, q, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, M, Lq_p, D), jnp.float32),
        interpret=interpret,
    )(idx, wts, v)
    out = out[:, :, :Lq].transpose(0, 2, 1, 3)  # (B, Lq, M, D)
    return out.reshape(B, Lq, M * D).astype(dt)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _msda_pallas_factored(value, sampling_locations, attention_weights,
                          q_block: int = 256, interpret: bool = False,
                          build_f32: bool = True):
    """Fused FACTORED one-hot sampling kernel (TPU).

    The XLA factored formulation (_msda_onehot_factored) is HBM-bound: the
    (q_chunk, H, W) weight matrix it builds between its two einsums
    round-trips ~2 GB/frame through HBM at the SOT shape (Lq=8000,
    HW=4000, M=8, L=2, bf16). This kernel builds that matrix tile-by-tile
    in VMEM from the separable per-axis taps — 2 VPU FMAs per (cell, point)
    instead of the direct one-hot's 16 compare+select+FMA taps that made
    _msda_pallas VPU-bound — and contracts it on the MXU without ever
    materializing it in HBM.

    Layout: queries ride the LANES. The weight tile is built as
    (H, W, QB=128) — per-axis one-hots are (H, QB)/(W, QB) built by
    row-broadcast compares, the rank-1 accumulate inserts only leading/
    middle dims (minor-dim insertion is a Mosaic relayout; lane dim stays
    QB throughout), and the (H*W, QB) reshape merges leading dims (layout
    no-op). The MXU contraction is dot_general over the FULL H*W dim of
    both the tile and the (H*W, D) value map — no 128-padding waste.
    Forward-only; ms_deform_attn wires the XLA one-hot backward via
    custom VJP (tap indices are piecewise constant, as in the reference
    CUDA backward).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L, H, W, M, D = value.shape
    _, Lq, _, _, P, _ = sampling_locations.shape
    dt = value.dtype

    # per-axis taps with attention weights folded into the y-axis weights
    # (same prep as _msda_onehot_factored)
    x = sampling_locations[..., 0] * W - 0.5
    y = sampling_locations[..., 1] * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = (x - x0).astype(dt)
    ly = (y - y0).astype(dt)

    def taps(c0, frac, n):
        in_lo = (c0 >= 0) & (c0 < n)
        in_hi = (c0 + 1 >= 0) & (c0 + 1 < n)
        w_lo = jnp.where(in_lo, 1.0 - frac, 0.0).astype(dt)
        w_hi = jnp.where(in_hi, frac, 0.0).astype(dt)
        i_lo = jnp.clip(c0, 0, n - 1).astype(jnp.int32)
        i_hi = jnp.clip(c0 + 1, 0, n - 1).astype(jnp.int32)
        return jnp.stack([i_lo, i_hi], -1), jnp.stack([w_lo, w_hi], -1)

    yi, wy = taps(y0, ly, H)                    # (B, Lq, M, L, P, 2)
    xi, wx = taps(x0, lx, W)
    wy = wy * attention_weights[..., None].astype(dt)

    def layout(t):                              # -> (B, L, M, P*2, Lq)
        return t.transpose(0, 3, 2, 4, 5, 1).reshape(B, L, M, P * 2, Lq)

    yi, wy, xi, wx = layout(yi), layout(wy), layout(xi), layout(wx)

    QB = min(q_block, _round_up(Lq, 128))
    Lq_p = _round_up(Lq, QB)
    if Lq_p != Lq:
        pad = ((0, 0), (0, 0), (0, 0), (0, 0), (0, Lq_p - Lq))
        # padded columns get weight 0 -> contribute nothing
        yi, wy = jnp.pad(yi, pad), jnp.pad(wy, pad)
        xi, wx = jnp.pad(xi, pad), jnp.pad(wx, pad)
    nq = Lq_p // QB
    v = value.transpose(0, 1, 4, 2, 3, 5).reshape(B, L, M, H * W, D)
    K2 = P * 2

    def kern(yi_ref, wy_ref, xi_ref, wx_ref, v_ref, out_ref):
        l = pl.program_id(3)
        yi_t = yi_ref[0, 0, 0]                  # (P*2, QB) int32
        wy_t = wy_ref[0, 0, 0]
        xi_t = xi_ref[0, 0, 0]
        wx_t = wx_ref[0, 0, 0]
        vv = v_ref[0, 0, 0]                     # (H*W, D)
        iota_h = jax.lax.broadcasted_iota(jnp.int32, (H, QB), 0)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, QB), 0)
        f32 = jnp.float32 if build_f32 else dt
        acc = jnp.zeros((H, W, QB), f32)
        for p in range(P):
            lo, hi = 2 * p, 2 * p + 1
            oy = (wy_t[lo:lo + 1, :].astype(f32)
                  * (iota_h == yi_t[lo:lo + 1, :]).astype(f32)
                  + wy_t[hi:hi + 1, :].astype(f32)
                  * (iota_h == yi_t[hi:hi + 1, :]).astype(f32))
            ox = (wx_t[lo:lo + 1, :].astype(f32)
                  * (iota_w == xi_t[lo:lo + 1, :]).astype(f32)
                  + wx_t[hi:hi + 1, :].astype(f32)
                  * (iota_w == xi_t[hi:hi + 1, :]).astype(f32))
            acc = acc + oy[:, None, :] * ox[None, :, :]
        wmat = acc.reshape(H * W, QB).astype(dt)
        # contract the H*W dim of both: (H*W, QB) x (H*W, D) -> (QB, D)
        contrib = jax.lax.dot_general(
            wmat, vv, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(l == 0)
        def _():
            out_ref[0, 0, :, :] = contrib

        @pl.when(l > 0)
        def _():
            out_ref[0, 0, :, :] += contrib

    tap_spec = pl.BlockSpec((1, 1, 1, K2, QB), lambda b, q, m, l: (b, l, m, 0, q),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(B, nq, M, L),
        in_specs=[tap_spec, tap_spec, tap_spec, tap_spec,
                  pl.BlockSpec((1, 1, 1, H * W, D),
                               lambda b, q, m, l: (b, l, m, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, QB, D), lambda b, q, m, l: (b, m, q, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, M, Lq_p, D), jnp.float32),
        interpret=interpret,
    )(yi, wy, xi, wx, v)
    out = out[:, :, :Lq].transpose(0, 2, 1, 3)  # (B, Lq, M, D)
    return out.reshape(B, Lq, M * D).astype(dt)


@jax.custom_vjp
def _msda_pallas_factored_vjp(value, sampling_locations, attention_weights):
    return _msda_pallas_factored(value, sampling_locations, attention_weights)


def _msda_pallas_factored_fwd(value, sampling_locations, attention_weights):
    out = _msda_pallas_factored(value, sampling_locations, attention_weights)
    return out, (value, sampling_locations, attention_weights)


def _msda_pallas_factored_bwd(res, g):
    value, locs, attw = res
    _, vjp = jax.vjp(lambda v, l, w: _msda_onehot_factored(v, l, w, 500),
                     value, locs, attw)
    return vjp(g)


_msda_pallas_factored_vjp.defvjp(_msda_pallas_factored_fwd,
                                 _msda_pallas_factored_bwd)


@jax.custom_vjp
def _msda_pallas_vjp(value, sampling_locations, attention_weights):
    return _msda_pallas(value, sampling_locations, attention_weights)


def _msda_pallas_fwd(value, sampling_locations, attention_weights):
    out = _msda_pallas(value, sampling_locations, attention_weights)
    return out, (value, sampling_locations, attention_weights)


def _msda_pallas_bwd(res, g):
    value, locs, attw = res
    # backward recomputes through the XLA one-hot formulation (same math);
    # forward stays on the fused kernel.
    _, vjp = jax.vjp(lambda v, l, w: _msda_onehot(v, l, w, 1000),
                     value, locs, attw)
    return vjp(g)


_msda_pallas_vjp.defvjp(_msda_pallas_fwd, _msda_pallas_bwd)


def _msda_onehot_factored(value, sampling_locations, attention_weights,
                          q_chunk: int = 1000):
    """One-hot formulation with a rank-1 (row x col) weight-matrix build.

    The direct one-hot build costs ~16 taps x (compare+select+fma) per
    (query, cell) — ~40 VPU ops/cell. Bilinear taps are separable:
    W[q, y, x] = sum_p Ay_p[q, y] * Bx_p[q, x], where Ay/Bx have 2 taps each
    over H resp. W (tiny to build). The (qc, H, W) matrix then costs 2 VPU
    ops per cell per point (8 total) — ~5x less build work — and contracts
    with the (H, W, D) value maps in one 2-dim-contraction einsum on the MXU.
    Out-of-range corners follow grid_sample zero-padding: each axis tap is
    zero-weighted when its row/col falls outside, so the corner weight
    (the product) vanishes exactly as in _bilinear_taps.
    """
    B, L, H, W, M, D = value.shape
    _, Lq, _, _, P, _ = sampling_locations.shape
    dt = value.dtype

    x = sampling_locations[..., 0] * W - 0.5
    y = sampling_locations[..., 1] * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = (x - x0).astype(dt)
    ly = (y - y0).astype(dt)

    # per-axis taps with zero weight when out of range
    def taps(c0, frac, n):
        in_lo = (c0 >= 0) & (c0 < n)
        in_hi = (c0 + 1 >= 0) & (c0 + 1 < n)
        w_lo = jnp.where(in_lo, 1.0 - frac, 0.0).astype(dt)
        w_hi = jnp.where(in_hi, frac, 0.0).astype(dt)
        i_lo = jnp.clip(c0, 0, n - 1).astype(jnp.int32)
        i_hi = jnp.clip(c0 + 1, 0, n - 1).astype(jnp.int32)
        return jnp.stack([i_lo, i_hi], -1), jnp.stack([w_lo, w_hi], -1)

    yi, wy = taps(y0, ly, H)           # (B, Lq, M, L, P, 2)
    xi, wx = taps(x0, lx, W)
    wy = wy * attention_weights[..., None].astype(dt)  # fold attw into rows

    iota_h = jnp.arange(H, dtype=jnp.int32)
    iota_w = jnp.arange(W, dtype=jnp.int32)
    # (B, L, M, Lq, P, H/W) one-hot-with-weights per axis
    oh_y = jnp.sum(
        (yi[..., None] == iota_h).astype(dt) * wy[..., None], axis=-2
    ).transpose(0, 3, 2, 1, 4, 5)      # (B, L, M, Lq, P, H)
    oh_x = jnp.sum(
        (xi[..., None] == iota_w).astype(dt) * wx[..., None], axis=-2
    ).transpose(0, 3, 2, 1, 4, 5)      # (B, L, M, Lq, P, W)

    v3 = value.transpose(0, 1, 4, 2, 3, 5)  # (B, L, M, H, W, D)

    q_chunk = min(q_chunk, Lq)
    n_pad = (-Lq) % q_chunk
    if n_pad:
        pad = ((0, 0), (0, 0), (0, 0), (0, n_pad), (0, 0), (0, 0))
        oh_y = jnp.pad(oh_y, pad)
        oh_x = jnp.pad(oh_x, pad)
    nq = (Lq + n_pad) // q_chunk
    oh_y = oh_y.reshape(B, L, M, nq, q_chunk, P, H).transpose(3, 0, 1, 2, 4, 5, 6)
    oh_x = oh_x.reshape(B, L, M, nq, q_chunk, P, W).transpose(3, 0, 1, 2, 4, 5, 6)

    @jax.checkpoint
    def chunk_fn(oy, ox):
        # (B, L, M, qc, P, H) x (B, L, M, qc, P, W) -> (B, L, M, qc, H, W)
        wmat = jnp.einsum("blmqph,blmqpw->blmqhw", oy, ox)
        return jnp.einsum("blmqhw,blmhwd->bqmd", wmat, v3)

    def chunk(carry, inp):
        oy, ox = inp
        return carry, chunk_fn(oy, ox)

    _, outs = jax.lax.scan(chunk, 0, (oh_y, oh_x))
    out = outs.transpose(1, 0, 2, 3, 4).reshape(B, Lq + n_pad, M, D)[:, :Lq]
    return out.reshape(B, Lq, M * D)


def ms_deform_attn_reference(value, sampling_locations, attention_weights):
    """Dense einsum-free oracle using explicit loops over levels/points.

    Slow but direct transliteration of grid_sample semantics; used by tests
    (mirrors the reference's dual-implementation pattern, ops/test.py:31-61).
    """
    import numpy as np

    value = np.asarray(value, np.float64)
    locs = np.asarray(sampling_locations, np.float64)
    attw = np.asarray(attention_weights, np.float64)
    B, L, H, W, M, D = value.shape
    _, Lq, _, _, P, _ = locs.shape
    out = np.zeros((B, Lq, M, D))
    for b in range(B):
        for q in range(Lq):
            for m in range(M):
                for l in range(L):
                    for p in range(P):
                        xx = locs[b, q, m, l, p, 0] * W - 0.5
                        yy = locs[b, q, m, l, p, 1] * H - 0.5
                        x0, y0 = int(np.floor(xx)), int(np.floor(yy))
                        lx, ly = xx - x0, yy - y0
                        acc = np.zeros(D)
                        for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
                            cx, cy = x0 + dx, y0 + dy
                            if 0 <= cx < W and 0 <= cy < H:
                                w_c = (lx if dx else 1 - lx) * (ly if dy else 1 - ly)
                                acc += w_c * value[b, l, cy, cx, m]
                        out[b, q, m] += attw[b, q, m, l, p] * acc
    return out.reshape(B, Lq, M * D)
