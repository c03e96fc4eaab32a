"""Fused last-stage *training* kernels: ConvT + activation + SSE loss.

Training cannot reuse the multi-stage fused apply tail
(``decoder_kernel.py``): interior stages carry train-mode BatchNorm whose
batch statistics couple every image in the batch, while the apply kernel's
grid is one image per step.  The *final* decoder stage has no BatchNorm
(reference ``decoder.py:39-50`` — BN+ReLU between stages, none after the
last; ``unet.py:114-163`` likewise), so its ConvT + sigmoid + squared-error
against the training target fuses cleanly per image.

That stage is the training step's HBM hot spot.  At the flagship
16x16->256x256 geometry the full-resolution (256^2) tensors — the forward
output, the sigmoid residual saved for backward, and the loss gradient —
dominate the step's activation traffic; XLA materializes each of them (conv
outputs are fusion roots, and the ConvT backward reads the 256^2 cotangent
twice: once for d/dinput, once for d/dweight).  The fused pair never writes
any 256^2 tensor to HBM:

  forward:   sse_i = sum((act(convT(h_i, w) + b) - y_i)^2)     reads h, y
  backward:  (dh_i, dw, db)  with the stage recomputed in VMEM  reads h, y

The backward recomputes the stage output in VMEM (~0.5 MFLOP/image — far
cheaper than the 256 KB/image HBM round-trip it replaces), forms the
full-resolution gradient, and de-interleaves it into stride-2 parity planes
with the *transposed* 0/1 expansion matmuls of the forward kernel
(``decoder_kernel._expand_mats``).  The ConvT input-gradient is then a
correlation with the same taps mirrored (+t where the forward reads -t),
and the weight gradient is a per-tap masked reduction accumulated across
the (sequential) TPU grid.

Returning per-image SSE — not the scalar mean — keeps the trainer's
weighted-batch semantics (``train/loop.py batch_weights``: zero-weight
padding rows reproduce torch's smaller-final-batch loss exactly) outside
the kernel: the per-image cotangent arrives in ``dsse`` and simply scales
each image's gradient.

Tap math is f32 VPU; the interleave/de-interleave and upsample matmuls
ride the MXU at 1-pass bf16 input rounding (the 0/1 matrices are
bf16-exact; the value operand rounds — ~1e-4-class, measured on the
apply twin, ``decoder_kernel._ilv_mode``).  That grade is deliberate
for TRAINING: gradients at bf16-faithful rounding are indistinguishable
to the optimizer (loss-curve parity is test-asserted vs the XLA loss),
and the apply path — where the parity contract lives — uses the
compensated interleave instead.

Reference hot loop being outclassed: ``conv_ae_model.py:185-203`` (per-batch
forward/backward of the torch decoder whose last stage materializes the
full-resolution output, sigmoid grad and MSE grad in HBM).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decoder_kernel import (
    _MAX_K,
    _MAX_OUT_PIXELS,
    _MAX_TAIL_CIN,
    _expand_mats,
    _plane_rows,
    _stage_fused,
    _stage_geometry,
    _taps,
)


def last_stage_eligible(spec) -> bool:
    """True when the decoder's final LayerSpec fits the fused kernels:
    stride 2, no output_padding, kernel <= 4, input channels <= 8, output
    image within the VMEM guard (same constraints as the apply tail)."""
    k_h, k_w = spec.kernel_hw
    o_c, o_h, o_w = spec.get_output_dimensions()
    return (
        spec.get_stride() == 2
        and not spec.get_output_padding()
        and max(int(k_h), int(k_w)) <= _MAX_K
        and int(spec.get_input_dimensions()[0]) <= _MAX_TAIL_CIN
        and int(o_h) * int(o_w) <= _MAX_OUT_PIXELS
    )


def _nhwc_to_nchw(x):
    n, h, w, c = x.shape
    if c == 1:  # same buffer layout; reshape is free
        return x.reshape(n, 1, h, w)
    return jnp.transpose(x, (0, 3, 1, 2))


# --------------------------------------------------------------------------
# kernel bodies
# --------------------------------------------------------------------------

def _sse_fwd_kernel(x_ref, y_ref, w_ref, b_ref, er_ref, fc_ref, sse_ref,
                    *, geom, act):
    cin = geom[2]
    chans = [x_ref[0, c] for c in range(cin)]
    outs = _stage_fused(chans, w_ref, b_ref, 0, 0, geom, act, er_ref, fc_ref)
    acc = None
    for co, o in enumerate(outs):
        d = o - y_ref[0, co]
        s = jnp.sum(d * d)
        acc = s if acc is None else acc + s
    # whole-(n,) SMEM block shared across the sequential grid (Mosaic
    # requires sub-blocks be (8,128)-divisible; a full block is exempt)
    sse_ref[pl.program_id(0)] = acc


def _stage_backprop(chans, ggs, w_ref, eat_ref, fbt_ref,
                    dx_ref, dw_ref, db_ref, geom):
    """Given post-activation-grad full-resolution cotangents ``ggs`` (one
    (o_h, o_w) array per output channel), backprop the stride-2 ConvT:
    write this image's ``dx`` block and accumulate ``dw``/``db`` into the
    shared SMEM blocks (the TPU grid is sequential).  Shared by every
    fused-training-loss kernel (SSE and masked-stats)."""
    k_h, k_w, cin, cout, i_h, i_w, _o_h, _o_w = geom

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for j in range(k_h * k_w * cin * cout):
            dw_ref[j] = 0.0
        for co in range(cout):
            db_ref[co] = 0.0

    planes = []  # per-co {(a, b): G_ab} stride-2 parity planes of the grad
    for co in range(cout):
        gg = ggs[co]
        db_ref[co] = db_ref[co] + jnp.sum(gg)
        # de-interleave rows then columns with the transposed 0/1 matrices:
        # P_a[m] = gg[2m+a] ; G_ab[m, n] = gg[2m+a, 2n+b]
        p0 = jnp.dot(eat_ref[0], gg, preferred_element_type=jnp.float32)
        p1 = jnp.dot(eat_ref[1], gg, preferred_element_type=jnp.float32)
        planes.append({
            (0, 0): jnp.dot(p0, fbt_ref[0], preferred_element_type=jnp.float32),
            (0, 1): jnp.dot(p0, fbt_ref[1], preferred_element_type=jnp.float32),
            (1, 0): jnp.dot(p1, fbt_ref[0], preferred_element_type=jnp.float32),
            (1, 1): jnp.dot(p1, fbt_ref[1], preferred_element_type=jnp.float32),
        })

    def w_at(ki, kj, ci, co):
        return w_ref[((ki * k_w + kj) * cin + ci) * cout + co]

    # dx[p, q, ci] = sum_{co, taps} G_ab[p + t_i, q + t_j] * w[ki, kj, ci, co]
    # (the forward reads x[m - t]; its transpose reads the planes at +t)
    for ci in range(cin):
        acc = None
        for co in range(cout):
            for a in (0, 1):
                for (ti, ki) in _taps(k_h, a):
                    for b2 in (0, 1):
                        for (tj, kj) in _taps(k_w, b2):
                            term = (
                                planes[co][(a, b2)][ti : ti + i_h,
                                                    tj : tj + i_w]
                                * w_at(ki, kj, ci, co)
                            )
                            acc = term if acc is None else acc + term
        dx_ref[0, ci] = (
            acc if acc is not None else jnp.zeros((i_h, i_w), jnp.float32)
        )

    # dw[ki, kj, ci, co] = sum_p x[p] * G_ab[p + t] — accumulated across the
    # sequential grid into the shared SMEM block
    for co in range(cout):
        for a in (0, 1):
            for (ti, ki) in _taps(k_h, a):
                for b2 in (0, 1):
                    for (tj, kj) in _taps(k_w, b2):
                        g_sl = planes[co][(a, b2)][ti : ti + i_h,
                                                   tj : tj + i_w]
                        for ci in range(cin):
                            j = ((ki * k_w + kj) * cin + ci) * cout + co
                            dw_ref[j] = dw_ref[j] + jnp.sum(chans[ci] * g_sl)


def _sse_bwd_kernel(x_ref, y_ref, w_ref, b_ref, g_ref, er_ref, fc_ref,
                    eat_ref, fbt_ref, dx_ref, dw_ref, db_ref, *, geom, act):
    cin, cout = geom[2], geom[3]
    chans = [x_ref[0, c] for c in range(cin)]
    # recompute the stage output in VMEM — identical math to the forward
    # kernel, so the gradient is consistent to the bit
    outs = _stage_fused(chans, w_ref, b_ref, 0, 0, geom, act, er_ref, fc_ref)
    # d(sse)/d(out) = 2*(out - y) * per-image cotangent
    scale = 2.0 * g_ref[pl.program_id(0)]
    ggs = []
    for co in range(cout):
        o = outs[co]
        gg = (o - y_ref[0, co]) * scale
        if act == "sigmoid":
            gg = gg * (o * (1.0 - o))
        ggs.append(gg)
    _stage_backprop(chans, ggs, w_ref, eat_ref, fbt_ref,
                    dx_ref, dw_ref, db_ref, geom)


# --------------------------------------------------------------------------
# emitting SSE kernels (VarAE training loss with an active MS-SSIM term)
# --------------------------------------------------------------------------
#
# The VarAE loss (λ_mse·MSE + λ_kl·KL + λ_ssim·(1−MS-SSIM), SURVEY §2.11)
# needs the full-resolution output as the MS-SSIM kernels' input, so the
# plain SSE pair above — whose whole point is never writing that tensor —
# cannot carry it.  The *emitting* variant fuses everything that can still
# fuse: the forward computes the stage in VMEM, reduces the per-image SSE
# in-kernel AND writes the post-activation output exactly once (the one
# HBM write the SSIM term makes structurally unavoidable); the backward
# accepts the *external* output-cotangent ``dout`` (the λ_ssim·d(1−MS-SSIM)
# adjoint produced by the analytic MS-SSIM backward kernel) alongside the
# per-image SSE cotangent, recomputes the stage in VMEM, and folds both
# sources into one activation-grad before the shared ConvT backprop —
# d(out) = 2·(out−y)·g_sse + dout, then ·act'.  Versus the XLA loss this
# still removes the separate sigmoid/loss-grad materialisations and runs
# the ConvT dgrad/wgrad through the fused ``_stage_backprop`` path; the
# only full-resolution HBM trips left are the two the loss graph itself
# demands (out in the forward, dout in the backward).  Measured on the
# round-5 trace (`scripts/trace_varae.py`): the unfused conv core is ~41%
# of the 17.3 ms VarAE step — this variant is the fused-tail answer for
# the half of that cost the SSIM term does not pin.


def _sse_emit_fwd_kernel(x_ref, y_ref, w_ref, b_ref, er_ref, fc_ref,
                         sse_ref, out_ref, *, geom, act):
    cin = geom[2]
    chans = [x_ref[0, c] for c in range(cin)]
    outs = _stage_fused(chans, w_ref, b_ref, 0, 0, geom, act, er_ref, fc_ref)
    acc = None
    for co, o in enumerate(outs):
        out_ref[0, co] = o
        d = o - y_ref[0, co]
        s = jnp.sum(d * d)
        acc = s if acc is None else acc + s
    sse_ref[pl.program_id(0)] = acc


def _sse_emit_bwd_kernel(x_ref, y_ref, w_ref, b_ref, g_ref, go_ref, er_ref,
                         fc_ref, eat_ref, fbt_ref, dx_ref, dw_ref, db_ref,
                         *, geom, act):
    cin, cout = geom[2], geom[3]
    chans = [x_ref[0, c] for c in range(cin)]
    outs = _stage_fused(chans, w_ref, b_ref, 0, 0, geom, act, er_ref, fc_ref)
    # both cotangent sources are w.r.t. the POST-activation output: the
    # per-image SSE cotangent and the external (e.g. MS-SSIM) adjoint —
    # sum first, then one activation-grad
    scale = 2.0 * g_ref[pl.program_id(0)]
    ggs = []
    for co in range(cout):
        o = outs[co]
        gg = (o - y_ref[0, co]) * scale + go_ref[0, co]
        if act == "sigmoid":
            gg = gg * (o * (1.0 - o))
        ggs.append(gg)
    _stage_backprop(chans, ggs, w_ref, eat_ref, fbt_ref,
                    dx_ref, dw_ref, db_ref, geom)


def _run_sse_emit_fwd(x, y, w_flat, b, geom, act, interpret):
    n = x.shape[0]
    _kh, _kw, cin, cout, i_h, i_w, o_h, o_w = geom
    er, fc, _eat, _fbt = _mats(geom)
    kernel = functools.partial(_sse_emit_fwd_kernel, geom=geom, act=act)
    sse, out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, cin, i_h, i_w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout, o_h, o_w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            _const_spec(er),
            _const_spec(fc),
        ],
        out_specs=[
            pl.BlockSpec((n,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, cout, o_h, o_w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n,), jnp.float32),
            jax.ShapeDtypeStruct((n, cout, o_h, o_w), jnp.float32),
        ],
        interpret=interpret,
    )(x, y, w_flat, b, er, fc)
    return sse, out


def _run_sse_emit_bwd(x, y, w_flat, b, dsse, dout, geom, act, interpret):
    n = x.shape[0]
    k_h, k_w, cin, cout, i_h, i_w, o_h, o_w = geom
    er, fc, eat, fbt = _mats(geom)
    wn = k_h * k_w * cin * cout
    kernel = functools.partial(_sse_emit_bwd_kernel, geom=geom, act=act)
    dx, dw, db = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, cin, i_h, i_w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout, o_h, o_w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((n,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, cout, o_h, o_w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            _const_spec(er),
            _const_spec(fc),
            _const_spec(eat),
            _const_spec(fbt),
        ],
        out_specs=[
            pl.BlockSpec((1, cin, i_h, i_w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wn,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((cout,), lambda i: (0,), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, cin, i_h, i_w), jnp.float32),
            jax.ShapeDtypeStruct((wn,), jnp.float32),
            jax.ShapeDtypeStruct((cout,), jnp.float32),
        ],
        interpret=interpret,
    )(x, y, w_flat, b, dsse, dout, er, fc, eat, fbt)
    return dx, dw, db


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _sse_emit_core(geom, act, interpret, x, w_flat, b, y):
    return _run_sse_emit_fwd(x, y, w_flat, b, geom, act, interpret)


def _sse_emit_fwd_rule(geom, act, interpret, x, w_flat, b, y):
    sse, out = _run_sse_emit_fwd(x, y, w_flat, b, geom, act, interpret)
    return (sse, out), (x, w_flat, b, y)


def _sse_emit_bwd_rule(geom, act, interpret, res, cts):
    x, w_flat, b, y = res
    dsse, dout = cts
    dx, dw, db = _run_sse_emit_bwd(
        x, y, w_flat, b,
        dsse.astype(jnp.float32).reshape(-1),
        dout.astype(jnp.float32), geom, act, interpret,
    )
    return dx, dw, db, jnp.zeros_like(y)


_sse_emit_core.defvjp(_sse_emit_fwd_rule, _sse_emit_bwd_rule)


def last_stage_sse_emit(w, b, h_nhwc, y_nhwc, final_act="sigmoid",
                        interpret=False, mesh=None):
    """Per-image SSE of the fused final decoder stage, PLUS the output.

    ``(sse, out_nhwc) = last_stage_sse_emit(...)`` where ``sse[i]`` matches
    ``last_stage_sse`` and ``out_nhwc`` is the post-activation stage output
    ``act(convT_s2(h, w) + b)`` written once from VMEM — for losses whose
    extra terms (MS-SSIM in ``VarAEModel``) need the full-resolution
    output.  Differentiable in ``w``, ``b``, ``h``; the analytic backward
    folds the external ``out`` cotangent into the fused ConvT backprop
    (see the section comment above).
    """
    k_h, k_w = int(w.shape[0]), int(w.shape[1])
    cin, cout = int(w.shape[2]), int(w.shape[3])
    n, i_h, i_w, _ = h_nhwc.shape
    o_h, o_w = _stage_geometry(int(i_h), int(i_w), k_h, k_w)
    geom = (k_h, k_w, cin, cout, int(i_h), int(i_w), o_h, o_w)
    x = _nhwc_to_nchw(h_nhwc).astype(jnp.float32)
    yy = _nhwc_to_nchw(y_nhwc).astype(jnp.float32)
    core = functools.partial(_sse_emit_core, geom, final_act, bool(interpret))

    def call(w_flat, b_, x_, y_):
        return core(x_, w_flat, b_, y_)

    if mesh is not None and mesh.size > 1:
        call = _shard_map_batch(call, mesh, n_batch_args=2, n_out=2)
    sse, out = call(
        w.astype(jnp.float32).reshape(-1),
        b.astype(jnp.float32).reshape(-1), x, yy,
    )
    if cout == 1:  # same buffer layout; reshape is free
        out_nhwc = out.reshape(n, o_h, o_w, 1)
    else:
        out_nhwc = jnp.transpose(out, (0, 2, 3, 1))
    return sse, out_nhwc


# --------------------------------------------------------------------------
# masked-statistics kernels (UNET training loss)
# --------------------------------------------------------------------------
#
# The UNET content loss (masked MSE + masked Pearson, ``unet_model.py``;
# reference ``unet.py:316-321,635-678``) is a pure function of seven
# per-(image, channel) masked sufficient statistics of the final-stage
# output o against target y and spatial mask m:
#
#   n_m = Σ m        s_o  = Σ m·o        s_y  = Σ m·y
#   s_oo = Σ m·o²    s_yy = Σ m·y²       s_oy = Σ m·o·y
#   s2   = Σ m²·(o−y)²          (masked-MSE numerator; m² because the
#                                reference squares the *masked* diff)
#
# so the full-resolution output never needs to leave VMEM during training:
# the forward emits 7 scalars per (image, channel) and the host computes
# mse/Pearson (ops/losses.py::stats_* twins of masked_mse/masked_pearson).
# The backward is again a recompute-in-VMEM: every stat's output-cotangent
# is of the form
#
#   dL/do = m·(α + β·o + γ·y) + m²·δ·(o−y)
#
# with per-(image, channel) scalars α = d(s_o), β = 2·d(s_oo),
# γ = d(s_oy), δ = 2·d(s2) — the same shape as the SSE kernel's cotangent
# (α=γ=0 there), so both share ``_stage_backprop``.


def _stats_fwd_kernel(x_ref, y_ref, m_ref, w_ref, b_ref, er_ref, fc_ref,
                      nm_ref, so_ref, sy_ref, soo_ref, syy_ref, soy_ref,
                      s2_ref, *, geom, act):
    cin, cout = geom[2], geom[3]
    i = pl.program_id(0)
    chans = [x_ref[0, c] for c in range(cin)]
    outs = _stage_fused(chans, w_ref, b_ref, 0, 0, geom, act, er_ref, fc_ref)
    mm = m_ref[0, 0]
    nm_ref[i] = jnp.sum(mm)
    mm2 = mm * mm
    for co in range(cout):
        o = outs[co]
        y = y_ref[0, co]
        j = i * cout + co
        so_ref[j] = jnp.sum(mm * o)
        sy_ref[j] = jnp.sum(mm * y)
        soo_ref[j] = jnp.sum(mm * o * o)
        syy_ref[j] = jnp.sum(mm * y * y)
        soy_ref[j] = jnp.sum(mm * o * y)
        d = o - y
        s2_ref[j] = jnp.sum(mm2 * d * d)


def _stats_bwd_kernel(x_ref, y_ref, m_ref, w_ref, b_ref, al_ref, be_ref,
                      ga_ref, de_ref, er_ref, fc_ref, eat_ref, fbt_ref,
                      dx_ref, dw_ref, db_ref, *, geom, act):
    cin, cout = geom[2], geom[3]
    i = pl.program_id(0)
    chans = [x_ref[0, c] for c in range(cin)]
    outs = _stage_fused(chans, w_ref, b_ref, 0, 0, geom, act, er_ref, fc_ref)
    mm = m_ref[0, 0]
    mm2 = mm * mm
    ggs = []
    for co in range(cout):
        o = outs[co]
        y = y_ref[0, co]
        j = i * cout + co
        gg = mm * (al_ref[j] + be_ref[j] * o + ga_ref[j] * y) + (
            mm2 * de_ref[j]
        ) * (o - y)
        if act == "sigmoid":
            gg = gg * (o * (1.0 - o))
        ggs.append(gg)
    _stage_backprop(chans, ggs, w_ref, eat_ref, fbt_ref,
                    dx_ref, dw_ref, db_ref, geom)


# --------------------------------------------------------------------------
# host-side wrappers
# --------------------------------------------------------------------------

def _mats(geom):
    o_h, o_w = geom[6], geom[7]
    m_h, m_w = _plane_rows(o_h), _plane_rows(o_w)
    er = _expand_mats(m_h, o_h)  # (2, o_h, m_h) row-expansion
    fc = np.transpose(_expand_mats(m_w, o_w), (0, 2, 1))  # (2, m_w, o_w)
    eat = np.transpose(er, (0, 2, 1))  # (2, m_h, o_h) row de-interleave
    fbt = _expand_mats(m_w, o_w)  # (2, o_w, m_w) col de-interleave
    return tuple(jnp.asarray(a) for a in (er, fc, eat, fbt))


def _const_spec(arr):
    nd = arr.ndim
    return pl.BlockSpec(arr.shape, lambda i: (0,) * nd,
                        memory_space=pltpu.VMEM)


def _run_sse_fwd(x, y, w_flat, b, geom, act, interpret):
    n = x.shape[0]
    _kh, _kw, cin, cout, i_h, i_w, o_h, o_w = geom
    er, fc, _eat, _fbt = _mats(geom)
    kernel = functools.partial(_sse_fwd_kernel, geom=geom, act=act)
    sse = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, cin, i_h, i_w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout, o_h, o_w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            _const_spec(er),
            _const_spec(fc),
        ],
        out_specs=pl.BlockSpec((n,), lambda i: (0,),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((n,), jnp.float32),
        interpret=interpret,
    )(x, y, w_flat, b, er, fc)
    return sse


def _run_sse_bwd(x, y, w_flat, b, dsse, geom, act, interpret):
    n = x.shape[0]
    k_h, k_w, cin, cout, i_h, i_w, o_h, o_w = geom
    er, fc, eat, fbt = _mats(geom)
    wn = k_h * k_w * cin * cout
    kernel = functools.partial(_sse_bwd_kernel, geom=geom, act=act)
    dx, dw, db = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, cin, i_h, i_w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout, o_h, o_w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((n,), lambda i: (0,), memory_space=pltpu.SMEM),
            _const_spec(er),
            _const_spec(fc),
            _const_spec(eat),
            _const_spec(fbt),
        ],
        out_specs=[
            pl.BlockSpec((1, cin, i_h, i_w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wn,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((cout,), lambda i: (0,), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, cin, i_h, i_w), jnp.float32),
            jax.ShapeDtypeStruct((wn,), jnp.float32),
            jax.ShapeDtypeStruct((cout,), jnp.float32),
        ],
        interpret=interpret,
    )(x, y, w_flat, b, dsse, er, fc, eat, fbt)
    return dx, dw, db


def _run_stats_fwd(x, y, m, w_flat, b, geom, act, interpret):
    n = x.shape[0]
    _kh, _kw, cin, cout, i_h, i_w, o_h, o_w = geom
    er, fc, _eat, _fbt = _mats(geom)
    kernel = functools.partial(_stats_fwd_kernel, geom=geom, act=act)
    flat = pl.BlockSpec((n * cout,), lambda i: (0,), memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, cin, i_h, i_w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout, o_h, o_w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, o_h, o_w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            _const_spec(er),
            _const_spec(fc),
        ],
        out_specs=[pl.BlockSpec((n,), lambda i: (0,),
                                memory_space=pltpu.SMEM)] + [flat] * 6,
        out_shape=[jax.ShapeDtypeStruct((n,), jnp.float32)]
        + [jax.ShapeDtypeStruct((n * cout,), jnp.float32)] * 6,
        interpret=interpret,
    )(x, y, m, w_flat, b, er, fc)
    return tuple(out)


def _run_stats_bwd(x, y, m, w_flat, b, coeffs, geom, act, interpret):
    n = x.shape[0]
    k_h, k_w, cin, cout, i_h, i_w, o_h, o_w = geom
    er, fc, eat, fbt = _mats(geom)
    wn = k_h * k_w * cin * cout
    kernel = functools.partial(_stats_bwd_kernel, geom=geom, act=act)
    flat = pl.BlockSpec((n * cout,), lambda i: (0,), memory_space=pltpu.SMEM)
    dx, dw, db = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, cin, i_h, i_w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout, o_h, o_w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, o_h, o_w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            flat, flat, flat, flat,
            _const_spec(er),
            _const_spec(fc),
            _const_spec(eat),
            _const_spec(fbt),
        ],
        out_specs=[
            pl.BlockSpec((1, cin, i_h, i_w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wn,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((cout,), lambda i: (0,), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, cin, i_h, i_w), jnp.float32),
            jax.ShapeDtypeStruct((wn,), jnp.float32),
            jax.ShapeDtypeStruct((cout,), jnp.float32),
        ],
        interpret=interpret,
    )(x, y, m, w_flat, b, *coeffs, er, fc, eat, fbt)
    return dx, dw, db


# --------------------------------------------------------------------------
# custom-VJP core + public API
# --------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _sse_core(geom, act, interpret, x, w_flat, b, y):
    return _run_sse_fwd(x, y, w_flat, b, geom, act, interpret)


def _sse_fwd_rule(geom, act, interpret, x, w_flat, b, y):
    sse = _run_sse_fwd(x, y, w_flat, b, geom, act, interpret)
    return sse, (x, w_flat, b, y)


def _sse_bwd_rule(geom, act, interpret, res, dsse):
    x, w_flat, b, y = res
    dx, dw, db = _run_sse_bwd(
        x, y, w_flat, b,
        dsse.astype(jnp.float32).reshape(-1), geom, act, interpret,
    )
    # y is training data — its cotangent is never consumed (XLA dead-code
    # eliminates the zeros); returning -d(out-grad) would force the very
    # full-resolution HBM write the kernel exists to avoid
    return dx, dw, db, jnp.zeros_like(y)


_sse_core.defvjp(_sse_fwd_rule, _sse_bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _stats_core(geom, act, interpret, x, w_flat, b, y, m):
    return _run_stats_fwd(x, y, m, w_flat, b, geom, act, interpret)


def _stats_fwd_rule(geom, act, interpret, x, w_flat, b, y, m):
    stats = _run_stats_fwd(x, y, m, w_flat, b, geom, act, interpret)
    return stats, (x, w_flat, b, y, m)


def _stats_bwd_rule(geom, act, interpret, res, dstats):
    x, w_flat, b, y, m = res
    _dnm, dso, _dsy, dsoo, _dsyy, dsoy, ds2 = dstats
    # dL/do = m·(α + β·o + γ·y) + m²·δ·(o−y); the y-/m-only stats carry no
    # output dependence (their cotangents flow only into the training data)
    coeffs = tuple(
        c.astype(jnp.float32).reshape(-1)
        for c in (dso, 2.0 * dsoo, dsoy, 2.0 * ds2)
    )
    dx, dw, db = _run_stats_bwd(x, y, m, w_flat, b, coeffs, geom, act,
                                interpret)
    return dx, dw, db, jnp.zeros_like(y), jnp.zeros_like(m)


_stats_core.defvjp(_stats_fwd_rule, _stats_bwd_rule)


def last_stage_masked_stats(w, b, h_nhwc, y_nhwc, m_nhw1, final_act="sigmoid",
                            interpret=False, mesh=None):
    """Masked sufficient statistics of the fused final decoder stage.

    Computes ``o = act(convT_s2(h, w) + b)`` entirely in VMEM and returns
    per-(image, channel) reductions against target ``y`` and spatial mask
    ``m``::

        {"n_m": (N,), "s_o"|"s_y"|"s_oo"|"s_yy"|"s_oy"|"s2": (N, C)}

    where ``s2 = Σ m²·(o−y)²`` (the masked-MSE numerator) and the rest are
    the plain first/second masked moments.  Together they determine the
    UNET content loss (masked MSE + masked Pearson — see
    ``ops/losses.py::masked_mse_from_stats``/``masked_pearson_from_stats``)
    without ever writing the full-resolution output, its activation-grad,
    or its loss-grad to HBM.  Differentiable in ``w``, ``b``, ``h`` with an
    analytic fused backward (``_stats_bwd_kernel``).

    ``m_nhw1``: (N, oh, ow, 1) float mask (ones when the dataset has no
    mask variable — ``data/dataset.py::arrays_nhwc``).
    """
    k_h, k_w = int(w.shape[0]), int(w.shape[1])
    cin, cout = int(w.shape[2]), int(w.shape[3])
    n, i_h, i_w, _ = h_nhwc.shape
    o_h, o_w = _stage_geometry(int(i_h), int(i_w), k_h, k_w)
    geom = (k_h, k_w, cin, cout, int(i_h), int(i_w), o_h, o_w)
    x = _nhwc_to_nchw(h_nhwc).astype(jnp.float32)
    yy = _nhwc_to_nchw(y_nhwc).astype(jnp.float32)
    mm = _nhwc_to_nchw(m_nhw1).astype(jnp.float32)
    core = functools.partial(_stats_core, geom, final_act, bool(interpret))

    def call(w_flat, b_, x_, y_, m_):
        return core(x_, w_flat, b_, y_, m_)

    if mesh is not None and mesh.size > 1:
        call = _shard_map_batch(call, mesh, n_batch_args=3, n_out=7)
    nm, so, sy, soo, syy, soy, s2 = call(
        w.astype(jnp.float32).reshape(-1),
        b.astype(jnp.float32).reshape(-1), x, yy, mm,
    )
    pc = lambda a: a.reshape(n, cout)  # noqa: E731
    return {
        "n_m": nm, "s_o": pc(so), "s_y": pc(sy), "s_oo": pc(soo),
        "s_yy": pc(syy), "s_oy": pc(soy), "s2": pc(s2),
    }


def _shard_map_batch(fn, mesh, n_batch_args, n_out, n_param_args=2):
    """Wrap ``fn(*params, *batched)`` in a ``shard_map`` over the mesh's
    "data" axis: the leading ``n_param_args`` arguments are replicated,
    batched operands/results sharded on their leading axis.  Lets the
    per-image Pallas kernels run under the DP trainer — each device runs
    the kernel on its local batch shard and ``shard_map``'s AD transpose
    inserts the cross-device ``psum`` for the replicated parameter
    gradients, riding ICI exactly like the XLA loss's gradient
    all-reduce.  Axes other than "data" (e.g. a TP "model" axis) stay
    unmapped/replicated."""
    from jax.sharding import PartitionSpec as P

    batch_spec = P("data")
    in_specs = (P(),) * n_param_args + (batch_spec,) * n_batch_args
    out_specs = (batch_spec,) * n_out if n_out > 1 else batch_spec
    return jax.shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )


def last_stage_sse(w, b, h_nhwc, y_nhwc, final_act="sigmoid",
                   interpret=False, mesh=None):
    """Per-image SSE of the fused final decoder stage.

    ``sse[i] = sum((act(convT_s2(h[i], w) + b) - y[i])**2)`` with a fused
    Pallas forward and an analytic fused backward (d/dh, d/dw, d/db).

    ``w``: (kh, kw, cin, cout) HWIO pre-flipped (the library convention,
    ``ops/convops.py``); ``h_nhwc``: (N, ih, iw, cin) input to the final
    stage; ``y_nhwc``: (N, oh, ow, cout) normalised target.
    Differentiable in ``w``, ``b``, ``h`` (use it directly inside a loss).
    """
    k_h, k_w = int(w.shape[0]), int(w.shape[1])
    cin, cout = int(w.shape[2]), int(w.shape[3])
    n, i_h, i_w, _ = h_nhwc.shape
    o_h, o_w = _stage_geometry(int(i_h), int(i_w), k_h, k_w)
    geom = (k_h, k_w, cin, cout, int(i_h), int(i_w), o_h, o_w)
    x = _nhwc_to_nchw(h_nhwc).astype(jnp.float32)
    yy = _nhwc_to_nchw(y_nhwc).astype(jnp.float32)
    core = functools.partial(_sse_core, geom, final_act, bool(interpret))

    def call(w_flat, b_, x_, y_):
        return core(x_, w_flat, b_, y_)

    if mesh is not None and mesh.size > 1:
        call = _shard_map_batch(call, mesh, n_batch_args=2, n_out=1)
    return call(
        w.astype(jnp.float32).reshape(-1),
        b.astype(jnp.float32).reshape(-1), x, yy,
    )


# --------------------------------------------------------------------------
# residual masked-statistics kernels (UNETRes training loss)
# --------------------------------------------------------------------------
#
# UNETRes (``models/unet_model.py::UNETRes``) predicts a residual over a
# bilinear-upsampled, 1x1-projected base estimate of the input:
#
#   p = base + s*o,   base = conv1x1(up(x_in), rw) + rb,   o = convT(h, w)+b
#
# Bilinear resize is a separable linear map — ``up(x) = A_h @ x @ A_w^T``
# with matrices obtained by resizing identity (exact; verified to f32
# noise against ``jax.image.resize``) — so the ENTIRE residual head fuses
# into the stats kernel: two small MXU matmuls recreate the base in VMEM
# and no full-resolution tensor (up(x), base, p, o, or any gradient) ever
# reaches HBM.  Inputs are only the tiny model input ``x_in`` and the
# stage input ``h``; the loss is the same masked-stats form as UNET.
#
# Backward: with G = m*(α + β*p + γ*y) + m²*δ*(p−y) recomputed in VMEM,
#   d/dh,dw,db  <- ggs = s*G through the shared ConvT backprop,
#   d/ds        = Σ o*G,   d/drb[co] = Σ G[co],
#   d/drw[ci,co] = Σ up(x)[ci]*G[co]   (up recomputed per channel).


#: VMEM guard: the kernel keeps cin_in upsampled planes live; many-channel
#: inputs (e.g. 13-predictor LST stacks) fall back to the XLA loss.
_MAX_RES_CIN = 4


def _res_stats_fwd_kernel(xh_ref, y_ref, m_ref, xin_ref, w_ref, b_ref,
                          rw_ref, rb_ref, s_ref, uh_ref, uwt_ref,
                          er_ref, fc_ref, nm_ref, so_ref, sy_ref, soo_ref,
                          syy_ref, soy_ref, s2_ref, *, geom, res_cin):
    cin, cout = geom[2], geom[3]
    i = pl.program_id(0)
    chans = [xh_ref[0, c] for c in range(cin)]
    outs = _stage_fused(chans, w_ref, b_ref, 0, 0, geom, "linear",
                        er_ref, fc_ref)
    ups = []
    for ci in range(res_cin):
        t = jnp.dot(uh_ref[...], xin_ref[0, ci],
                    preferred_element_type=jnp.float32)
        ups.append(jnp.dot(t, uwt_ref[...],
                           preferred_element_type=jnp.float32))
    mm = m_ref[0, 0]
    nm_ref[i] = jnp.sum(mm)
    mm2 = mm * mm
    s = s_ref[0]
    for co in range(cout):
        base = None
        for ci in range(res_cin):
            term = ups[ci] * rw_ref[ci * cout + co]
            base = term if base is None else base + term
        p = base + rb_ref[co] + s * outs[co]
        y = y_ref[0, co]
        j = i * cout + co
        so_ref[j] = jnp.sum(mm * p)
        sy_ref[j] = jnp.sum(mm * y)
        soo_ref[j] = jnp.sum(mm * p * p)
        syy_ref[j] = jnp.sum(mm * y * y)
        soy_ref[j] = jnp.sum(mm * p * y)
        d = p - y
        s2_ref[j] = jnp.sum(mm2 * d * d)


def _res_stats_bwd_kernel(xh_ref, y_ref, m_ref, xin_ref, w_ref, b_ref,
                          rw_ref, rb_ref, s_ref, al_ref, be_ref, ga_ref,
                          de_ref, uh_ref, uwt_ref, er_ref, fc_ref, eat_ref,
                          fbt_ref, dx_ref, dw_ref, db_ref, drw_ref, drb_ref,
                          ds_ref, *, geom, res_cin):
    cin, cout = geom[2], geom[3]
    i = pl.program_id(0)

    @pl.when(pl.program_id(0) == 0)
    def _init_res():
        for j in range(res_cin * cout):
            drw_ref[j] = 0.0
        for co in range(cout):
            drb_ref[co] = 0.0
        ds_ref[0] = 0.0

    chans = [xh_ref[0, c] for c in range(cin)]
    outs = _stage_fused(chans, w_ref, b_ref, 0, 0, geom, "linear",
                        er_ref, fc_ref)
    ups = []
    for ci in range(res_cin):
        t = jnp.dot(uh_ref[...], xin_ref[0, ci],
                    preferred_element_type=jnp.float32)
        ups.append(jnp.dot(t, uwt_ref[...],
                           preferred_element_type=jnp.float32))
    mm = m_ref[0, 0]
    mm2 = mm * mm
    s = s_ref[0]
    ggs = []
    ds_acc = None
    for co in range(cout):
        base = None
        for ci in range(res_cin):
            term = ups[ci] * rw_ref[ci * cout + co]
            base = term if base is None else base + term
        o = outs[co]
        p = base + rb_ref[co] + s * o
        y = y_ref[0, co]
        j = i * cout + co
        g = mm * (al_ref[j] + be_ref[j] * p + ga_ref[j] * y) + (
            mm2 * de_ref[j]
        ) * (p - y)
        drb_ref[co] = drb_ref[co] + jnp.sum(g)
        for ci in range(res_cin):
            jj = ci * cout + co
            drw_ref[jj] = drw_ref[jj] + jnp.sum(ups[ci] * g)
        term = jnp.sum(o * g)
        ds_acc = term if ds_acc is None else ds_acc + term
        ggs.append(g * s)
    ds_ref[0] = ds_ref[0] + ds_acc
    _stage_backprop(chans, ggs, w_ref, eat_ref, fbt_ref,
                    dx_ref, dw_ref, db_ref, geom)


@functools.lru_cache(maxsize=None)
def _resize_mats(i_h, i_w, o_h, o_w):
    """Separable bilinear-resize matrices matching ``jax.image.resize``
    (exact: resize is linear per axis, so resizing identity recovers the
    operator).  Returns (A_h (o_h, i_h), A_w^T (i_w, o_w)).

    Must run under ``ensure_compile_time_eval``: the caller sits inside
    the jitted train step (epoch-scan trainer), where bare lax ops join
    the ambient trace and the ``np.asarray`` below would see tracers."""
    with jax.ensure_compile_time_eval():
        a_h = jax.image.resize(jnp.eye(i_h, dtype=jnp.float32), (o_h, i_h),
                               method="bilinear")
        a_wt = jnp.transpose(
            jax.image.resize(jnp.eye(i_w, dtype=jnp.float32), (o_w, i_w),
                             method="bilinear")
        )
        return np.asarray(a_h), np.asarray(a_wt)


def _run_res_stats_fwd(xh, y, m, xin, w_flat, b, rw, rb, s, geom, res_cin,
                       interpret):
    n = xh.shape[0]
    _kh, _kw, cin, cout, i_h, i_w, o_h, o_w = geom
    er, fc, _eat, _fbt = _mats(geom)
    uh, uwt = (jnp.asarray(a) for a in
               _resize_mats(xin.shape[2], xin.shape[3], o_h, o_w))
    kernel = functools.partial(_res_stats_fwd_kernel, geom=geom,
                               res_cin=res_cin)
    flat = pl.BlockSpec((n * cout,), lambda i: (0,), memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, cin, i_h, i_w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout, o_h, o_w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, o_h, o_w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, res_cin) + xin.shape[2:],
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            _const_spec(uh),
            _const_spec(uwt),
            _const_spec(er),
            _const_spec(fc),
        ],
        out_specs=[pl.BlockSpec((n,), lambda i: (0,),
                                memory_space=pltpu.SMEM)] + [flat] * 6,
        out_shape=[jax.ShapeDtypeStruct((n,), jnp.float32)]
        + [jax.ShapeDtypeStruct((n * cout,), jnp.float32)] * 6,
        interpret=interpret,
    )(xh, y, m, xin, w_flat, b, rw, rb, s, uh, uwt, er, fc)
    return tuple(out)


def _run_res_stats_bwd(xh, y, m, xin, w_flat, b, rw, rb, s, coeffs, geom,
                       res_cin, interpret):
    n = xh.shape[0]
    k_h, k_w, cin, cout, i_h, i_w, o_h, o_w = geom
    er, fc, eat, fbt = _mats(geom)
    uh, uwt = (jnp.asarray(a) for a in
               _resize_mats(xin.shape[2], xin.shape[3], o_h, o_w))
    wn = k_h * k_w * cin * cout
    kernel = functools.partial(_res_stats_bwd_kernel, geom=geom,
                               res_cin=res_cin)
    flat = pl.BlockSpec((n * cout,), lambda i: (0,), memory_space=pltpu.SMEM)
    dx, dw, db, drw, drb, ds = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, cin, i_h, i_w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout, o_h, o_w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, o_h, o_w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, res_cin) + xin.shape[2:],
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            flat, flat, flat, flat,
            _const_spec(uh),
            _const_spec(uwt),
            _const_spec(er),
            _const_spec(fc),
            _const_spec(eat),
            _const_spec(fbt),
        ],
        out_specs=[
            pl.BlockSpec((1, cin, i_h, i_w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wn,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((cout,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((res_cin * cout,), lambda i: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((cout,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, cin, i_h, i_w), jnp.float32),
            jax.ShapeDtypeStruct((wn,), jnp.float32),
            jax.ShapeDtypeStruct((cout,), jnp.float32),
            jax.ShapeDtypeStruct((res_cin * cout,), jnp.float32),
            jax.ShapeDtypeStruct((cout,), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.float32),
        ],
        interpret=interpret,
    )(xh, y, m, xin, w_flat, b, rw, rb, s, *coeffs, uh, uwt, er, fc, eat,
      fbt)
    return dx, dw, db, drw, drb, ds


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _res_stats_core(geom, res_cin, interpret, xh, w_flat, b, rw, rb, s,
                    xin, y, m):
    return _run_res_stats_fwd(xh, y, m, xin, w_flat, b, rw, rb, s, geom,
                              res_cin, interpret)


def _res_stats_fwd_rule(geom, res_cin, interpret, xh, w_flat, b, rw, rb, s,
                        xin, y, m):
    stats = _run_res_stats_fwd(xh, y, m, xin, w_flat, b, rw, rb, s, geom,
                               res_cin, interpret)
    return stats, (xh, w_flat, b, rw, rb, s, xin, y, m)


def _res_stats_bwd_rule(geom, res_cin, interpret, res, dstats):
    xh, w_flat, b, rw, rb, s, xin, y, m = res
    _dnm, dso, _dsy, dsoo, _dsyy, dsoy, ds2 = dstats
    coeffs = tuple(
        c.astype(jnp.float32).reshape(-1)
        for c in (dso, 2.0 * dsoo, dsoy, 2.0 * ds2)
    )
    dx, dw, db, drw, drb, dsc = _run_res_stats_bwd(
        xh, y, m, xin, w_flat, b, rw, rb, s, coeffs, geom, res_cin,
        interpret,
    )
    return (dx, dw, db, drw, drb, dsc.reshape(()),
            jnp.zeros_like(xin), jnp.zeros_like(y), jnp.zeros_like(m))


_res_stats_core.defvjp(_res_stats_fwd_rule, _res_stats_bwd_rule)


def residual_stats_eligible(spec, res_cin) -> bool:
    return int(res_cin) <= _MAX_RES_CIN and last_stage_eligible(spec)


def last_stage_residual_stats(w, b, res_scale, rw, rb, h_nhwc, xin_nhwc,
                              y_nhwc, m_nhw1, interpret=False, mesh=None):
    """Masked sufficient statistics of the fused UNETRes final stage +
    residual head:

        p = bilinear_up(x_in) @ rw + rb + res_scale * (convT_s2(h, w) + b)

    entirely in VMEM (the resize rides two separable MXU matmuls), with
    the same 7 per-(image, channel) masked moments and host-side
    masked-MSE/Pearson reconstruction as ``last_stage_masked_stats``.
    Differentiable in ``w``, ``b``, ``res_scale``, ``rw`` (1x1 base
    projection, HWIO (1, 1, cin, cout) or (cin, cout)), ``rb`` and ``h``.

    Reference context: the residual-head architecture is additive (no
    upstream implementation shipped — ``base_model.py:140-141`` only
    device-moves a ``unet_res`` attr); the loss form matches
    ``unet.py:316-321``.
    """
    k_h, k_w = int(w.shape[0]), int(w.shape[1])
    cin, cout = int(w.shape[2]), int(w.shape[3])
    n, i_h, i_w, _ = h_nhwc.shape
    res_cin = int(xin_nhwc.shape[3])
    o_h, o_w = _stage_geometry(int(i_h), int(i_w), k_h, k_w)
    geom = (k_h, k_w, cin, cout, int(i_h), int(i_w), o_h, o_w)
    xh = _nhwc_to_nchw(h_nhwc).astype(jnp.float32)
    yy = _nhwc_to_nchw(y_nhwc).astype(jnp.float32)
    mm = _nhwc_to_nchw(m_nhw1).astype(jnp.float32)
    xi = _nhwc_to_nchw(xin_nhwc).astype(jnp.float32)
    core = functools.partial(_res_stats_core, geom, res_cin, bool(interpret))

    def call(w_flat, b_, rw_, rb_, s_, xh_, xi_, y_, m_):
        return core(xh_, w_flat, b_, rw_, rb_, s_, xi_, y_, m_)

    if mesh is not None and mesh.size > 1:
        call = _shard_map_batch(call, mesh, n_batch_args=4, n_out=7,
                                n_param_args=5)
    nm, so, sy, soo, syy, soy, s2 = call(
        w.astype(jnp.float32).reshape(-1),
        b.astype(jnp.float32).reshape(-1),
        rw.astype(jnp.float32).reshape(-1),
        rb.astype(jnp.float32).reshape(-1),
        res_scale.astype(jnp.float32).reshape(-1),
        xh, xi, yy, mm,
    )
    pc = lambda a: a.reshape(n, cout)  # noqa: E731
    return {
        "n_m": nm, "s_o": pc(so), "s_y": pc(sy), "s_oo": pc(soo),
        "s_yy": pc(syy), "s_oy": pc(soy), "s2": pc(s2),
    }
