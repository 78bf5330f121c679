"""Fused ConvNeXt block as a Pallas TPU kernel.

One ConvNeXt block is y = x + gamma * W2·gelu(W1·LN(dwconv7x7(x))) (reference
unicorn/models/backbone/convnext.py:19-55). XLA executes it as ~4 separate
HBM-round-tripping stages (grouped conv, fp32 LN, two matmuls with a 4x-wide
intermediate); at 800x1280 the stage-0 block costs 0.45 ms of which the
depthwise conv alone is 0.28 ms. This kernel keeps a row-slab of the feature
map in VMEM and runs the whole block in one pass: the 7x7 depthwise conv as
49 shifted multiply-adds, LayerNorm in fp32 over the lane (channel) dim, and
the MLP as per-row MXU matmuls, writing only the final residual output to HBM.

Forward-only: `convnext_block` wires a custom VJP whose backward recomputes
through `convnext_block_ref` (plain jnp, bit-matching the flax module), so
the op is safe inside training graphs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def convnext_block_ref(x, p, exact_gelu: bool = False, eps: float = 1e-6):
    """Pure-jnp reference of the flax ConvNeXtBlock (blocks.py:206-244).

    x: (B, H, W, C); p: dict with Conv_0{kernel (7,7,1,C) or (7,7,C), bias},
    LayerNorm_0{scale, bias}, Dense_0{kernel, bias}, Dense_1{kernel, bias},
    gamma (C,). Computes in x.dtype with fp32 LayerNorm, like the module.
    """
    dt = x.dtype
    kdw = p["Conv_0"]["kernel"]
    if kdw.ndim == 4:
        kdw = kdw[:, :, 0, :]
    C = x.shape[-1]
    y = jax.lax.conv_general_dilated(
        x, kdw[:, :, None, :].astype(dt), (1, 1), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)
    y = y + p["Conv_0"]["bias"].astype(dt)
    yf = y.astype(jnp.float32)
    mu = jnp.mean(yf, -1, keepdims=True)
    var = jnp.mean(jnp.square(yf - mu), -1, keepdims=True)
    yn = (yf - mu) * jax.lax.rsqrt(var + eps)
    yn = yn * p["LayerNorm_0"]["scale"] + p["LayerNorm_0"]["bias"]
    yn = yn.astype(dt)
    h = yn @ p["Dense_0"]["kernel"].astype(dt) + p["Dense_0"]["bias"].astype(dt)
    h = jax.nn.gelu(h, approximate=not exact_gelu)
    h = h @ p["Dense_1"]["kernel"].astype(dt) + p["Dense_1"]["bias"].astype(dt)
    return x + h * p["gamma"].astype(dt)


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def convnext_block_pallas(x, p, exact_gelu: bool = False, eps: float = 1e-6,
                          row_block: int = 16, interpret: bool = False):
    """Fused kernel. x (B, H, W, C). Processes each batch element separately
    (B is a grid dim); rows in slabs of `row_block` with a 3-row halo DMA'd
    from HBM."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C = x.shape
    dt = x.dtype
    # DMA slices require the lane (channel) dim 128-aligned: pad channels.
    # Pad lanes stay exactly zero end-to-end: dw taps/bias are zero there,
    # the sum-based LN divides by the true C (pad lanes contribute 0 to both
    # sums) and ln scale/bias pads are zero, so yn pad lanes are zero into
    # the MLP whose padded kernel rows/cols are zero.
    Cp = _round_up(C, 128)

    def padc(a, axis):
        if Cp == C:
            return a
        cfg = [(0, 0)] * a.ndim
        cfg[axis] = (0, Cp - C)
        return jnp.pad(a, cfg)

    kdw = p["Conv_0"]["kernel"]
    if kdw.ndim == 4:
        kdw = kdw[:, :, 0, :]
    kdw = padc(kdw.astype(jnp.float32), 2)
    b_dw = padc(p["Conv_0"]["bias"].reshape(1, -1).astype(jnp.float32), 1)
    lns = padc(p["LayerNorm_0"]["scale"].reshape(1, -1).astype(jnp.float32), 1)
    lnb = padc(p["LayerNorm_0"]["bias"].reshape(1, -1).astype(jnp.float32), 1)
    w1 = padc(p["Dense_0"]["kernel"].astype(dt), 0)
    b1 = p["Dense_0"]["bias"].reshape(1, -1).astype(jnp.float32)
    w2 = padc(p["Dense_1"]["kernel"].astype(dt), 1)
    b2 = padc(p["Dense_1"]["bias"].reshape(1, -1).astype(jnp.float32), 1)
    gamma = padc(p["gamma"].reshape(1, -1).astype(jnp.float32), 1)

    TH = min(row_block, _round_up(H, 8))
    H_p = _round_up(H, TH)
    W_p = _round_up(W + 6, 8)  # cols 3..3+W valid after pad
    # halo-pad once in XLA; every slab DMA then reads valid memory
    xp = jnp.pad(x, ((0, 0), (3, 3 + H_p - H), (3, W_p - W - 3), (0, Cp - C)))

    def kern(xp_hbm, kdw_r, bdw_r, lns_r, lnb_r, w1_r, b1_r, w2_r, b2_r,
             gamma_r, out_ref, slab, sem):
        b = pl.program_id(0)
        i = pl.program_id(1)
        cp = pltpu.make_async_copy(
            xp_hbm.at[b, pl.ds(i * TH, TH + 6)], slab, sem)
        cp.start()
        cp.wait()

        acc = jnp.zeros((TH, W, Cp), jnp.float32) + bdw_r[0][None, None, :]
        for dy in range(7):
            for dx in range(7):
                tap = slab[dy:dy + TH, dx:dx + W, :].astype(jnp.float32)
                acc = acc + tap * kdw_r[dy, dx][None, None, :]
        # sum-based LN over the TRUE channel count (pad lanes hold zeros)
        mu = jnp.sum(acc, -1, keepdims=True) * (1.0 / C)
        var = jnp.sum(acc * acc, -1, keepdims=True) * (1.0 / C) - mu * mu
        yn = (acc - mu) * jax.lax.rsqrt(var + eps)
        yn = (yn * lns_r[0][None, None, :] + lnb_r[0][None, None, :]).astype(dt)

        res = slab[3:3 + TH, 3:3 + W, :]
        for h in range(TH):
            t = jnp.dot(yn[h], w1_r[:], preferred_element_type=jnp.float32)
            t = t + b1_r[0][None, :]
            t = jax.nn.gelu(t, approximate=not exact_gelu).astype(dt)
            y = jnp.dot(t, w2_r[:], preferred_element_type=jnp.float32)
            y = y + b2_r[0][None, :]
            out_ref[0, h] = (res[h].astype(jnp.float32)
                             + y * gamma_r[0][None, :]).astype(dt)

    full = lambda shape: pl.BlockSpec(
        shape, lambda b, i: (0,) * len(shape), memory_space=pltpu.VMEM)
    C4 = w1.shape[1]
    out = pl.pallas_call(
        kern,
        grid=(B, H_p // TH),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),        # xp (halo'd input)
            full((7, 7, Cp)), full((1, Cp)), full((1, Cp)), full((1, Cp)),
            full((Cp, C4)), full((1, C4)), full((C4, Cp)), full((1, Cp)),
            full((1, Cp)),
        ],
        out_specs=pl.BlockSpec((1, TH, W, Cp), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H_p, W, Cp), dt),
        scratch_shapes=[
            pltpu.VMEM((TH + 6, W_p, Cp), dt),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, kdw, b_dw, lns, lnb, w1, b1, w2, b2, gamma)
    return out[:, :H, :, :C]


def dwconv7x7_ref(x, kdw, bias):
    """Plain-XLA depthwise 7x7 'SAME' conv, NHWC. kdw (7,7,1,C) or (7,7,C),
    fp32 params applied in x.dtype (the nn.Conv(dtype=...) promotion rule)."""
    dt = x.dtype
    if kdw.ndim == 3:
        kdw = kdw[:, :, None, :]
    C = x.shape[-1]
    y = jax.lax.conv_general_dilated(
        x, kdw.astype(dt), (1, 1), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)
    return y + bias.astype(dt)


def dwconv7x7_blocked(x, kdw, bias, blk: int = 8):
    """dw7x7 as a block-diagonal GROUPED conv — the MXU formulation of the
    trunk's depthwise wall (VERDICT r4 item 3).

    A depthwise conv (feature_group_count=C) is the blk=1 case of a grouped
    conv whose (7,7,blk,C) weights are block-diagonal:
    ``rhs[kh, kw, i, c] = kdw[kh, kw, c] if i == c % blk else 0``
    (output channel c sits in group c//blk, which reads input channels
    [c//blk*blk : c//blk*blk+blk]; the diagonal picks back exactly channel
    c). The expansion happens at trace time from the SAME dw params — no
    checkpoint change — and the zeros contribute nothing, so the result is
    exact up to dtype accumulation order. Cost: blk x the FLOPs, but the
    contraction depth becomes blk (x49 taps in the conv), which XLA can
    tile onto the MXU (~70x the VPU rate the dw lowering gets), vs the
    depthwise form's scalar per-channel taps. Measured by perf_lab
    EXP=dw_mxu across blk in {4,8,16,32,C}; see BASELINE.md for the
    adopt-or-negative record."""
    dt = x.dtype
    if kdw.ndim == 4:
        kdw = kdw[:, :, 0, :]
    C = x.shape[-1]
    if blk <= 1 or C % blk:
        return dwconv7x7_ref(x, kdw, bias)
    eye = (jnp.arange(blk)[:, None] == (jnp.arange(C) % blk)[None, :])
    rhs = kdw[:, :, None, :] * eye.astype(kdw.dtype)     # (7,7,blk,C)
    y = jax.lax.conv_general_dilated(
        x, rhs.astype(dt), (1, 1), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C // blk)
    return y + bias.astype(dt)


def dwconv7x7_pallas(x, kdw, bias, row_block: int = 16,
                     interpret: bool = False, variant: str = "dx_hoist"):
    """Depthwise 7x7 as a dedicated Pallas kernel — a probe of how much of
    the trunk's dw wall (BASELINE.md roofline table) is lowering overhead
    vs true VPU roofline (pure-FMA bound measured 8.9 TFLOP/s at the
    stage-0 shape vs XLA's 2.8).

    variants (measured by perf_lab dw_probe2):
      naive     49 slices of the fp32 slab, each misaligned in the sublane
                (W) dim — 0.95 ms at stage-0, 4x SLOWER than XLA: Mosaic
                realigns the whole slab per tap.
      dx_hoist  7 shifted copies (one per dx), then 49 row-sliced (free,
                untiled dim) aligned FMAs.
      bf16      dx_hoist with bf16 multiply-accumulate (no fp32 convert);
                one-rounding-per-tap drift, serving-only.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C = x.shape
    dt = x.dtype
    if kdw.ndim == 4:
        kdw = kdw[:, :, 0, :]
    # quantize taps/bias to the compute dtype first (the nn.Conv promotion
    # rule), so the only deviation from the XLA form is fp32 accumulation
    kdw = kdw.astype(dt)
    bias = bias.astype(dt)
    Cp = _round_up(C, 128)
    if Cp != C:
        kdw = jnp.pad(kdw.astype(jnp.float32), ((0, 0), (0, 0), (0, Cp - C)))
        b_dw = jnp.pad(bias.reshape(1, -1).astype(jnp.float32),
                       ((0, 0), (0, Cp - C)))
    else:
        kdw = kdw.astype(jnp.float32)
        b_dw = bias.reshape(1, -1).astype(jnp.float32)

    TH = min(row_block, _round_up(H, 8))
    H_p = _round_up(H, TH)
    W_p = _round_up(W + 6, 8)
    xp = jnp.pad(x, ((0, 0), (3, 3 + H_p - H), (3, W_p - W - 3), (0, Cp - C)))

    def kern(xp_hbm, kdw_r, bdw_r, out_ref, slab, sem):
        b = pl.program_id(0)
        i = pl.program_id(1)
        cp = pltpu.make_async_copy(
            xp_hbm.at[b, pl.ds(i * TH, TH + 6)], slab, sem)
        cp.start()
        cp.wait()
        if variant == "naive":
            xf = slab[...].astype(jnp.float32)  # single convert pass
            acc = (jnp.zeros((TH, W, Cp), jnp.float32)
                   + bdw_r[0][None, None, :])
            for dy in range(7):
                for dx in range(7):
                    acc = acc + (xf[dy:dy + TH, dx:dx + W, :]
                                 * kdw_r[dy, dx][None, None, :])
            out_ref[0] = acc.astype(dt)
        elif variant == "bf16":
            acc = jnp.broadcast_to(bdw_r[0][None, None, :].astype(dt),
                                   (TH, W, Cp)).astype(dt)
            for dx in range(7):
                xs = slab[:, dx:dx + W, :]  # one sublane realign per dx
                for dy in range(7):
                    # row slices are the untiled dim: aligned, free
                    acc = acc + xs[dy:dy + TH] * kdw_r[dy, dx][None, None, :].astype(dt)
            out_ref[0] = acc
        else:  # dx_hoist
            acc = (jnp.zeros((TH, W, Cp), jnp.float32)
                   + bdw_r[0][None, None, :])
            for dx in range(7):
                xs = slab[:, dx:dx + W, :].astype(jnp.float32)
                for dy in range(7):
                    acc = acc + (xs[dy:dy + TH]
                                 * kdw_r[dy, dx][None, None, :])
            out_ref[0] = acc.astype(dt)

    full = lambda shape: pl.BlockSpec(
        shape, lambda b, i: (0,) * len(shape), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(B, H_p // TH),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            full((7, 7, Cp)), full((1, Cp)),
        ],
        out_specs=pl.BlockSpec((1, TH, W, Cp), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H_p, W, Cp), dt),
        scratch_shapes=[
            pltpu.VMEM((TH + 6, W_p, Cp), dt),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, kdw, b_dw)
    return out[:, :H, :, :C]


@jax.custom_vjp
def dwconv7x7(x, kdw, bias):
    """Pallas depthwise 7x7 with gradients routed through the XLA reference
    (recompute-based custom VJP, same pattern as convnext_block)."""
    return dwconv7x7_pallas(x, kdw, bias,
                            interpret=jax.default_backend() != "tpu")


def _dw_fwd(x, kdw, bias):
    return dwconv7x7(x, kdw, bias), (x, kdw, bias)


def _dw_bwd(res, g):
    x, kdw, bias = res
    _, vjp = jax.vjp(dwconv7x7_ref, x, kdw, bias)
    return vjp(g)


dwconv7x7.defvjp(_dw_fwd, _dw_bwd)


# ---------------------------------------------------------------------------
# dw7x7 custom-VJP with RESTRUCTURED gradients (training-path attack on the
# dw wall, VERDICT r3 item 4). XLA's autodiff of a feature-grouped conv
# computes the filter gradient as a batch_group_count=C conv — historically
# the worst-lowered conv form on TPU. This VJP recomputes both grads in
# forms the TPU lowers well:
#   dx: depthwise conv of dy with the spatially-flipped kernel — byte-for-
#       byte the SAME grouped-conv program as the forward (XLA's best dw
#       lowering, BASELINE.md dw_probe).
#   dW: 49 shifted multiply-reduce taps on the padded input, H-shift
#       hoisted (H is an untiled dim on TPU: H-slices are free; only the 7
#       W-shifts pay a sublane realign), each tap a lane-preserving
#       (B,H,W,C)->(C,) reduction that XLA fuses into one pass per tap.
# Numerics: identical contractions in fp32 accumulation; allclose-tested
# against jax.vjp of the reference form (tests/test_pallas_convnext.py).
# ---------------------------------------------------------------------------

_DW_CUSTOM_VJP = False


def set_dw_custom_vjp(on: bool):
    """Training switch: route ConvNeXt dw7x7 through the restructured-
    gradient VJP below. Flip BEFORE tracing the train step."""
    global _DW_CUSTOM_VJP
    _DW_CUSTOM_VJP = bool(on)


def dw_grads_restructured(x, kdw, dy):
    """(dx, dkdw, dbias) for y = dwconv7x7_ref(x, kdw, bias), restructured
    per the note above. x, dy: (B, H, W, C); kdw (7,7,1,C)."""
    dt = dy.dtype
    B, H, W, C = x.shape
    if kdw.ndim == 3:
        kdw = kdw[:, :, None, :]
    # input grad: correlation with the flipped kernel == the forward program
    kflip = kdw[::-1, ::-1]
    dx = jax.lax.conv_general_dilated(
        dy, kflip.astype(dt), (1, 1), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)
    # filter grad: dW[u,v,c] = sum_{b,i,j} xpad[b,i+u,j+v,c] * dy[b,i,j,c]
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (3, 3), (3, 3), (0, 0)))
    dyf = dy.astype(jnp.float32)
    rows = []
    for u in range(7):
        xu = jax.lax.dynamic_slice_in_dim(xp, u, H, axis=1)  # H-shift: free
        taps = []
        for v in range(7):
            xv = jax.lax.dynamic_slice_in_dim(xu, v, W, axis=2)
            taps.append(jnp.sum(xv * dyf, axis=(0, 1, 2)))   # (C,)
        rows.append(jnp.stack(taps))                         # (7, C)
    dkdw = jnp.stack(rows)[:, :, None, :]                    # (7, 7, 1, C)
    dbias = jnp.sum(dyf, axis=(0, 1, 2))
    return dx, dkdw, dbias


@jax.custom_vjp
def dwconv7x7_cvjp(x, kdw, bias):
    """XLA forward (identical program to dwconv7x7_ref) + restructured VJP."""
    return dwconv7x7_ref(x, kdw, bias)


def _dwc_fwd(x, kdw, bias):
    return dwconv7x7_ref(x, kdw, bias), (x, kdw)


def _dwc_bwd(res, g):
    x, kdw = res
    dx, dkdw, dbias = dw_grads_restructured(x, kdw, g)
    return dx, dkdw.astype(jnp.float32), dbias.astype(jnp.float32)


dwconv7x7_cvjp.defvjp(_dwc_fwd, _dwc_bwd)


def convnext_block(x, p, exact_gelu: bool = False, method: str = "auto"):
    """Dispatcher: fused Pallas on TPU, reference composition elsewhere.
    Gradients always flow through the reference composition (custom VJP)."""
    if method == "auto":
        method = "pallas" if jax.default_backend() == "tpu" else "ref"
    if method == "pallas":
        if exact_gelu:
            return _block_vjp_exact(x, p)
        return _block_vjp_tanh(x, p)
    return convnext_block_ref(x, p, exact_gelu)


def _make_vjp(exact_gelu: bool):
    @jax.custom_vjp
    def f(x, p):
        return convnext_block_pallas(x, p, exact_gelu)

    def fwd(x, p):
        return f(x, p), (x, p)

    def bwd(res, g):
        x, p = res
        _, vjp = jax.vjp(lambda x_, p_: convnext_block_ref(x_, p_, exact_gelu),
                         x, p)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


_block_vjp_tanh = _make_vjp(False)
_block_vjp_exact = _make_vjp(True)
