"""Fused ConvAE decoder-tail Pallas kernel.

The ConvAE apply path (reference stack ``decoder.py:39-50`` — ConvT/BN/ReLU
pyramid up to the output resolution) is HBM-bound in XLA: every stage's
activation round-trips HBM across the whole batch.  For the flagship
16x16->256x256 geometry the *tail* stages carry ~95% of that traffic
(31^2*8 -> 63^2*4 -> 127^2*2 -> 256^2*1), while the head stages
(3^2*64 ... 31^2*8) are negligible.  This kernel fuses all tail stages —
transposed conv + folded BatchNorm + ReLU per stage, sigmoid at the end —
into one VMEM-resident pass per image: one HBM read of the (H, W, C<=8)
tail input, one HBM write of the final image.

ConvT-inside-Pallas uses the parity (subpixel) decomposition: for stride 2,
output pixels split into 4 parity planes; each plane is a small VALID
correlation of the (zero-padded) input with the matching sub-taps of the
(pre-flipped, HWIO) kernel — implemented as statically-unrolled VPU
multiply-adds per input channel.  Planes are re-interleaved by 0/1
expansion-matrix matmuls on the MXU: TPUs have no strided vector store,
``pltpu.repeat`` tiles rather than element-repeats, and the sublane
stack+reshape alternative measured *slower* than the matmuls on v5e
(7.06 vs 5.21 us/img at batch 1024 — relayouts are not free).  Tap math
is f32 VPU; the interleave matmuls ride the MXU, whose input rounding
follows the product's conv-precision ladder (see ``_ilv_mode`` —
measured on a trained model: 8.7e-5 normalized at 1-pass bf16, 1.3e-6
with the default 2-pass compensation, == Precision.HIGHEST's error at
a third of its pass count).

Weights enter the kernel flattened in SMEM (a few hundred scalars); BN
running stats are folded into per-stage (w', b') outside the kernel
(eval-mode only — training keeps the XLA path and its autodiff).
"""

from __future__ import annotations

import functools
import math
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...nn.modules import BN_EPS

#: kernel is used when every tail stage satisfies these
_MAX_TAIL_CIN = 8
_MAX_K = 4  # tap shift <= 1, matching the fixed 1-pixel zero pad
#: VMEM guard on the final image
_MAX_OUT_PIXELS = 512 * 512


# --------------------------------------------------------------------------
# geometry helpers (python ints, trace-time)
# --------------------------------------------------------------------------

def _taps(k: int, a: int):
    """Sub-taps of a stride-2 transposed conv for output parity ``a``.

    With the pre-flipped kernel w applied as a VALID correlation over the
    2x-dilated, (k-1)-padded input (``convops.conv_transpose2d``), output
    row ``o`` reads input row ``p`` through tap ``ki`` iff
    ``p = (o + ki - (k-1)) / 2`` is integral.  For ``o = 2m + a`` that
    selects ``ki = (k-1) - a - 2t`` and ``p = m - t``.
    Returns [(t, ki), ...] with t >= 0 and 0 <= ki < k.
    """
    out = []
    t = 0
    while True:
        ki = (k - 1) - a - 2 * t
        if ki < 0:
            break
        out.append((t, ki))
        t += 1
    return out


def _plane_rows(o: int) -> int:
    """Per-parity plane size = ceil(o/2); interleaving two such planes
    yields >= o rows, and any trailing garbage row lands beyond ``o``."""
    return (o + 1) // 2


def _stage_geometry(i_h, i_w, k_h, k_w):
    o_h = (i_h - 1) * 2 + k_h
    o_w = (i_w - 1) * 2 + k_w
    return o_h, o_w


# --------------------------------------------------------------------------
# kernel body
# --------------------------------------------------------------------------

def _expand_mats(m: int, o: int):
    """0/1 parity-expansion matrices E_a (o, m): E_a[2i+a, i] = 1.

    ``E_0 @ P0 + E_1 @ P1`` row-interleaves two parity planes — an MXU
    matmul instead of the strided store TPUs don't have.  (``pltpu.repeat``
    tiles rather than element-repeats, so a mask-select interleave is not
    expressible; the matmul form is exact — 0/1 weights — and keeps the
    whole stage in VMEM.)
    """
    e = np.zeros((2, o, m), np.float32)
    for a in range(2):
        idx = np.arange(a, o, 2)
        e[a, idx, (idx - a) // 2] = 1.0
    return e


#: Interleave-matmul precision ladder.  The 0/1 parity-expansion matmuls
#: run on the MXU, which at DEFAULT (1-pass bf16) rounds the *plane
#: values* to bf16 at its input even though the 0/1 matrix side is
#: bf16-exact and accumulation is f32 (``preferred_element_type`` does
#: not control input rounding).  Measured on a trained (mid-sigmoid)
#: model: 1e-4 normalized output error vs the XLA path — 3 orders above
#: interpret mode (6e-8); random-init bench weights saturate the sigmoid
#: and masked it.  The fused apply therefore follows the product's own
#: conv-precision ladder (``convops.set_precision``):
#:   default  -> 1-pass dots (err ~1e-4, the 1-pass-bf16 class)
#:   high     -> 2-pass bf16 error compensation on the plane operand
#:               (hi = bf16(p), lo = p - hi; exact to 16 mantissa bits,
#:               err ~2^-17 ~ 8e-6 worst case, measured below 1e-5 —
#:               inside the HIGH parity budget at 1/3 the pass count of
#:               Precision.HIGHEST)
#:   highest  -> Precision.HIGHEST (multi-pass exact f32)
#: ``CAE_TPU_ILV_PRECISION=default|compensated|high|highest`` overrides
#: (resolved at trace time, like the conv knob).
def _ilv_mode():
    env = os.environ.get("CAE_TPU_ILV_PRECISION")
    if env:
        allowed = ("default", "compensated", "high", "highest")
        if env not in allowed:
            raise ValueError(
                f"CAE_TPU_ILV_PRECISION={env!r} is not one of {allowed}"
            )
        return env
    from ...ops import convops

    p = convops.get_precision()
    if p == jax.lax.Precision.HIGHEST:
        return "highest"
    if p == jax.lax.Precision.HIGH:
        return "compensated"
    return "default"


def _ilv_dot(a, b, ilv, plane):
    """f32-accumulating MXU dot with the plane operand (``plane`` =
    "lhs"|"rhs") protected per the interleave precision mode.

    "high" aliases "compensated": Mosaic's dot lowering supports only
    DEFAULT and HIGHEST precisions inside a Pallas kernel, and the
    2-pass compensation measures 1.3e-6 on the trained-model probe —
    the HIGH error class at 2 passes."""
    kw = {"preferred_element_type": jnp.float32}
    if ilv in ("compensated", "high"):
        x = a if plane == "lhs" else b
        hi = x.astype(jnp.bfloat16).astype(jnp.float32)
        lo = x - hi
        if plane == "lhs":
            return jnp.dot(hi, b, **kw) + jnp.dot(lo, b, **kw)
        return jnp.dot(a, hi, **kw) + jnp.dot(a, lo, **kw)
    prec = {
        "default": None,
        "highest": jax.lax.Precision.HIGHEST,
    }[ilv]
    return jnp.dot(a, b, precision=prec, **kw)


def _interleave_cols(p0, p1, f0, f1, ilv="default"):
    """out[:, 2n+b] = p_b[:, n] via right-matmul with F_b = E_b^T."""
    return _ilv_dot(p0, f0, ilv, "lhs") + _ilv_dot(p1, f1, ilv, "lhs")


def _interleave_rows(p0, p1, e0, e1, ilv="default"):
    return _ilv_dot(e0, p0, ilv, "rhs") + _ilv_dot(e1, p1, ilv, "rhs")


def _stage_fused(chans, w_ref, b_ref, w_off, b_off, geom, act, er_ref,
                 fc_ref, ilv="default"):
    """One ConvT stage on per-channel 2-D planes; returns output channels.

    ``chans``: list of (i_h, i_w) f32 arrays (input channels).
    ``w_ref``/``b_ref``: flat SMEM refs; ``w_off``/``b_off``: static offsets.
    ``geom``: (k_h, k_w, cin, cout, i_h, i_w, o_h, o_w).
    ``er_ref``: (2, o_h, m_h) row-expansion; ``fc_ref``: (2, m_w, o_w).
    """
    k_h, k_w, cin, cout, i_h, i_w, o_h, o_w = geom
    m_h = _plane_rows(o_h)
    m_w = _plane_rows(o_w)
    # zero-pad once per input channel: top/left 1 (max tap shift), and
    # bottom/right so every tap slice [1-t+m for m < M] stays in range
    pad_b = max(0, m_h - i_h)
    pad_r = max(0, m_w - i_w)
    padded = [
        jnp.pad(c, ((1, pad_b), (1, pad_r))) for c in chans
    ]

    def w_at(ki, kj, ci, co):
        return w_ref[w_off + ((ki * k_w + kj) * cin + ci) * cout + co]

    out = []
    for co in range(cout):
        planes = {}
        for a in range(2):
            for b in range(2):
                acc = None
                for ci in range(cin):
                    xp = padded[ci]
                    for (ti, ki) in _taps(k_h, a):
                        for (tj, kj) in _taps(k_w, b):
                            term = (
                                xp[1 - ti : 1 - ti + m_h,
                                   1 - tj : 1 - tj + m_w]
                                * w_at(ki, kj, ci, co)
                            )
                            acc = term if acc is None else acc + term
                planes[(a, b)] = (
                    acc if acc is not None
                    else jnp.zeros((m_h, m_w), jnp.float32)
                )
        f0, f1 = fc_ref[0], fc_ref[1]
        c0 = _interleave_cols(planes[(0, 0)], planes[(0, 1)], f0, f1, ilv)
        c1 = _interleave_cols(planes[(1, 0)], planes[(1, 1)], f0, f1, ilv)
        y = _interleave_rows(
            c0, c1, er_ref[0], er_ref[1], ilv
        ) + b_ref[b_off + co]
        if act == "relu":
            y = jnp.maximum(y, 0.0)
        elif act == "sigmoid":
            y = jax.nn.sigmoid(y)
        out.append(y)
    return out


def _tail_kernel(x_ref, w_ref, b_ref, *refs, geoms, acts, denorm=False,
                 pre=False, ilv="default"):
    # refs = [p_ref?, d_ref?, er_0, fc_0, er_1, fc_1, ..., out_ref]
    cin0 = geoms[0][2]
    if pre:
        p_ref, *refs = refs
    if denorm:
        d_ref, *refs = refs
    out_ref = refs[-1]
    if pre:
        # the last XLA-head stage's bias+BatchNorm+ReLU, folded to a
        # per-channel affine applied on the already-VMEM-resident input
        # planes: saves the full-batch HBM round trip of the tail input
        # that XLA's standalone elementwise fusion would pay (measured
        # 8.1% of forward device time at b8192, BASELINE.md round 4)
        chans = [
            jnp.maximum(x_ref[0, c] * p_ref[c] + p_ref[cin0 + c], 0.0)
            for c in range(cin0)
        ]
    else:
        chans = [x_ref[0, c] for c in range(cin0)]
    w_off = b_off = 0
    for si, (geom, act) in enumerate(zip(geoms, acts)):
        chans = _stage_fused(
            chans, w_ref, b_ref, w_off, b_off, geom, act,
            refs[2 * si], refs[2 * si + 1], ilv=ilv,
        )
        k_h, k_w, cin, cout = geom[:4]
        w_off += k_h * k_w * cin * cout
        b_off += cout
    for c, y in enumerate(chans):
        if denorm:
            # output denormalisation folded into the final activation:
            # lo + y*range, same f32 op order as the XLA affine it replaces
            # (base.py::_predict_denorm_nchw) — saves that pass's
            # full-resolution HBM read+write (Pallas is a fusion barrier,
            # so XLA could never fuse it in)
            y = d_ref[0] + y * d_ref[1]
        # out_ref may be bf16 (opt-in serving output, excluded from the
        # <=1e-5 parity contract): the cast halves the kernel's dominant
        # HBM cost, the full-resolution output write
        out_ref[0, c] = y.astype(out_ref.dtype)


# --------------------------------------------------------------------------
# host-side wrapper
# --------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("geoms", "acts", "interpret", "ilv", "out_dtype"),
)
def _run_tail(x_nchw, w_flat, b_flat, geoms, acts, interpret=False,
              d_flat=None, p_flat=None, ilv="default",
              out_dtype="float32"):
    n = x_nchw.shape[0]
    cin0 = geoms[0][2]
    i_h, i_w = geoms[0][4], geoms[0][5]
    cout_last = geoms[-1][3]
    o_h, o_w = geoms[-1][6], geoms[-1][7]
    has_denorm = d_flat is not None
    has_pre = p_flat is not None
    kernel = functools.partial(
        _tail_kernel, geoms=geoms, acts=acts, denorm=has_denorm,
        pre=has_pre, ilv=ilv,
    )

    # per-stage 0/1 parity-expansion matrices (shared across the grid)
    ef_arrays = []
    ef_specs = []
    for (k_h, k_w, _ci, _co, ih, iw, oh, ow) in geoms:
        m_h, m_w = _plane_rows(oh), _plane_rows(ow)
        er = _expand_mats(m_h, oh)  # (2, oh, m_h)
        fc = np.transpose(_expand_mats(m_w, ow), (0, 2, 1))  # (2, m_w, ow)
        ef_arrays += [jnp.asarray(er), jnp.asarray(fc)]
        ef_specs += [
            pl.BlockSpec(
                er.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                fc.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ]

    p_args = (p_flat,) if has_pre else ()
    p_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] if has_pre else []
    d_args = (d_flat,) if has_denorm else ()
    d_specs = (
        [pl.BlockSpec(memory_space=pltpu.SMEM)] if has_denorm else []
    )
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(
                (1, cin0, i_h, i_w), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            *p_specs,
            *d_specs,
            *ef_specs,
        ],
        out_specs=pl.BlockSpec(
            (1, cout_last, o_h, o_w), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n, cout_last, o_h, o_w), jnp.dtype(out_dtype)
        ),
        interpret=interpret,
    )(x_nchw, w_flat, b_flat, *p_args, *d_args, *ef_arrays)
    return out


def fold_tail_params(decoder, params, state, start, final_act="sigmoid"):
    """Fold eval-mode BatchNorm into each tail stage's (w, b); returns
    (geoms, acts, w_flat, b_flat) ready for the kernel.

    Works for both ``ConvDecoder`` and the skip-free tail of
    ``UNetDecoder`` — identical params layout (``convs[i]``/``bns[i]``).
    ``final_act``: "sigmoid" (ConvAE/UNET) or "linear" (UNETRes residual
    head, ``final_sigmoid=False``)."""
    layers = decoder.layers
    n_layers = len(layers)
    geoms = []
    acts = []
    w_parts = []
    b_parts = []
    for i in range(start, n_layers):
        spec = layers[i]
        k_h, k_w = spec.kernel_hw
        cin = int(spec.get_input_dimensions()[0])
        cout = int(spec.get_output_dimensions()[0])
        i_hh = int(spec.get_input_dimensions()[1])
        i_ww = int(spec.get_input_dimensions()[2])
        o_h, o_w = _stage_geometry(i_hh, i_ww, k_h, k_w)
        w = params["convs"][i]["w"].astype(jnp.float32)
        b = params["convs"][i]["b"].astype(jnp.float32)
        if i != n_layers - 1:
            bn_p = params["bns"][i]
            bn_s = state["bns"][i]
            inv = jax.lax.rsqrt(bn_s["var"].astype(jnp.float32) + BN_EPS)
            g = inv * bn_p["scale"].astype(jnp.float32)  # (cout,)
            w = w * g  # broadcast over HWIO's O dim
            b = (b - bn_s["mean"].astype(jnp.float32)) * g + bn_p[
                "bias"
            ].astype(jnp.float32)
            acts.append("relu")
        else:
            acts.append(final_act)
        geoms.append((int(k_h), int(k_w), cin, cout, i_hh, i_ww, o_h, o_w))
        w_parts.append(w.reshape(-1))
        b_parts.append(b.reshape(-1))
    return (
        tuple(geoms),
        tuple(acts),
        jnp.concatenate(w_parts),
        jnp.concatenate(b_parts),
    )


def tail_start_index(decoder) -> int | None:
    """First stage index from which the fused tail kernel applies, or None.

    Requirements per tail stage: stride 2, no output_padding, kernel <=
    ``_MAX_K``, input channels <= ``_MAX_TAIL_CIN``; final image within the
    VMEM guard.  The returned tail always reaches the last stage.
    """
    layers = decoder.layers
    if not layers:
        return None
    last = layers[-1]
    o_c, o_hh, o_ww = last.get_output_dimensions()
    if o_hh * o_ww > _MAX_OUT_PIXELS:
        return None
    start = None
    for i, spec in enumerate(layers):
        k_h, k_w = spec.kernel_hw
        ok = (
            spec.get_stride() == 2
            and not spec.get_output_padding()
            and max(int(k_h), int(k_w)) <= _MAX_K
            and int(spec.get_input_dimensions()[0]) <= _MAX_TAIL_CIN
        )
        if ok:
            if start is None:
                start = i
        else:
            start = None
    return start


def decoder_apply_fused_tail(
    decoder, params, state, z, start=None, interpret=False,
    denorm=None, nchw_out=False, out_dtype="float32",
):
    """Eval-mode ConvDecoder.apply with the tail stages fused in Pallas.

    Bit-compatible contract: matches ``decoder.apply(..., train=False)`` to
    f32 rounding (the kernel is plain f32 VPU math; the XLA path's output
    differs only by its conv precision mode).

    ``denorm=(lo, range)`` (traced f32 scalars) folds the output
    denormalisation ``lo + range*y`` into the kernel's final activation —
    the product apply path's own affine, which XLA cannot fuse across the
    Pallas call boundary.  ``nchw_out=True`` returns the kernel's native
    NCHW layout (the product apply's final layout) without the NHWC hop.

    ``out_dtype="bfloat16"`` (opt-in, serving only) writes the output in
    bf16 — the kernel sits at its f32 output-write floor (BASELINE.md
    round 4: the tail is 80.8% of apply device time, at its measured HBM
    write bound), so halving the output bytes breaks that floor for
    consumers that accept ~2e-3 relative error (OUTSIDE the <=1e-5 parity
    contract; the default f32 path is untouched).
    """
    if start is None:
        start = tail_start_index(decoder)
    assert start is not None, "unsupported decoder geometry for fused tail"

    from ...ops.convops import conv_transpose2d, dense
    from ...nn.modules import bn_apply

    c, y, x = decoder.unflat_dims
    h = jax.nn.relu(dense(z, params["fc1"]["w"], params["fc1"]["b"]))
    h = dense(h, params["fc2"]["w"], params["fc2"]["b"])
    h = h.reshape(h.shape[0], y, x, c)
    p_flat = None
    for i in range(start):
        spec = decoder.layers[i]
        h = conv_transpose2d(
            h,
            params["convs"][i]["w"],
            stride=spec.get_stride(),
            output_padding=spec.get_output_padding(),
        )
        if i == start - 1:
            # the LAST head stage's bias+BN+ReLU runs inside the kernel
            # as a per-channel input affine (`pre`): XLA's standalone
            # elementwise pass on the full-batch tail input measured
            # 8.1% of forward device time at b8192 (BASELINE.md round 4)
            p_flat = _pre_affine_flat(
                params["convs"][i]["b"], params["bns"][i], state["bns"][i]
            )
        else:
            h = h + params["convs"][i]["b"]
            h, _ = bn_apply(
                params["bns"][i], state["bns"][i], h, False, axes=(0, 1, 2)
            )
            h = jax.nn.relu(h)

    geoms, acts, w_flat, b_flat = fold_tail_params(
        decoder, params, state, start
    )
    x_nchw = jnp.transpose(h, (0, 3, 1, 2)).astype(jnp.float32)
    out = _run_tail(
        x_nchw, w_flat, b_flat, geoms, acts, interpret=interpret,
        d_flat=_denorm_flat(denorm), p_flat=p_flat, ilv=_ilv_mode(),
        out_dtype=out_dtype,
    )
    return out if nchw_out else _nchw_to_nhwc(out)


def _pre_affine_flat(bias, bn_p, bn_s):
    """Fold (conv bias + eval BatchNorm) into flat (gamma..., beta...):
    relu(x*gamma + beta) == relu(bn(x + bias)) — same fold as
    ``fold_tail_params`` applies to the tail stages' weights."""
    inv = jax.lax.rsqrt(bn_s["var"].astype(jnp.float32) + BN_EPS)
    g = inv * bn_p["scale"].astype(jnp.float32)
    b = (
        bias.astype(jnp.float32) - bn_s["mean"].astype(jnp.float32)
    ) * g + bn_p["bias"].astype(jnp.float32)
    return jnp.concatenate([g, b])


def _denorm_flat(denorm):
    if denorm is None:
        return None
    lo, rng = denorm
    return jnp.stack(
        [jnp.asarray(lo, jnp.float32), jnp.asarray(rng, jnp.float32)]
    )


def _nchw_to_nhwc(out):
    """NCHW -> NHWC; for C == 1 a reshape (free) instead of a transpose —
    profiler traces showed the materialised copy of the full-resolution
    output costing ~15% of apply device time."""
    n, c, h, w = out.shape
    if c == 1:
        return out.reshape(n, h, w, 1)
    return jnp.transpose(out, (0, 2, 3, 1))


# --------------------------------------------------------------------------
# UNET-family tail (unet.py:114-163 decoder stack, skip-free trailing stages)
# --------------------------------------------------------------------------

def _unet_stage_has_skip(decoder, i) -> bool:
    n_layers = len(decoder.layers)
    if i == n_layers - 1:
        return False
    if decoder.compat_concat:
        return i < len(decoder.skip_shapes)
    si, _ = decoder._stage_skip(i)
    return si is not None


def unet_tail_start_index(decoder) -> int | None:
    """First ``UNetDecoder`` stage from which the fused tail applies.

    Per-stage rules beyond the ConvAE ones (``tail_start_index``): the
    stage must not consume a skip (attention-gated concat stages,
    ``unet.py:155-161``, are not expressible in the kernel) and must have
    zero conv padding (the reference passes spec.output_padding as ConvT
    *padding*, ``unet.py:140``; auto specs have 0).  For the flagship
    16x16->256x256 auto spec the only skip lands at 7x7, so every stage
    from 15x15 up fuses — the ~95%-of-HBM-traffic tail."""
    layers = decoder.layers
    if not layers:
        return None
    o_c, o_hh, o_ww = layers[-1].get_output_dimensions()
    if o_hh * o_ww > _MAX_OUT_PIXELS:
        return None
    start = None
    for i, spec in enumerate(layers):
        k_h, k_w = spec.kernel_hw
        ok = (
            spec.get_stride() == 2
            and tuple(spec.output_padding_hw) == (0, 0)
            and max(int(k_h), int(k_w)) <= _MAX_K
            and int(spec.get_input_dimensions()[0]) <= _MAX_TAIL_CIN
            and not _unet_stage_has_skip(decoder, i)
        )
        if ok:
            if start is None:
                start = i
        else:
            start = None
    return start


def unet_decoder_apply_fused_tail(
    decoder, params, state, z, skips, start=None, interpret=False,
    denorm=None, nchw_out=False, out_dtype="float32",
):
    """Eval-mode ``UNetDecoder.apply`` with the skip-free tail fused.

    Head stages (FC pyramid + skip-consuming stages) replicate
    ``UNetDecoder.apply(train=False)`` exactly (dropout is a no-op in
    eval); the tail runs in the Pallas kernel with folded BatchNorm.
    Bit-compatible to f32 rounding, same contract as the ConvAE twin
    (incl. the ``denorm``/``nchw_out`` product-apply fusion)."""
    if start is None:
        start = unet_tail_start_index(decoder)
    assert start is not None, "unsupported UNET decoder geometry for fused tail"

    # pre-kernel stages: the decoder's own eval head, limited to [0, start)
    # (single implementation — this used to be a hand-maintained copy).
    # The last head stage's BN+ReLU folds into the kernel's input affine
    # (its conv bias is already applied inside apply_head, before the
    # attention/concat/fuse ops, so only the BN folds here).
    p_flat = None
    if start > 0:
        h, _ = decoder.apply_head(params, state, z, skips, train=False,
                                  n_stages=start, skip_final_bn_relu=True)
        bn_s = state["bns"][start - 1]
        p_flat = _pre_affine_flat(
            jnp.zeros_like(bn_s["mean"]), params["bns"][start - 1], bn_s
        )
    else:
        h, _ = decoder.apply_head(params, state, z, skips, train=False,
                                  n_stages=start)

    final_act = "sigmoid" if decoder.final_sigmoid else "linear"
    geoms, acts, w_flat, b_flat = fold_tail_params(
        decoder, params, state, start, final_act=final_act
    )
    x_nchw = jnp.transpose(h, (0, 3, 1, 2)).astype(jnp.float32)
    out = _run_tail(
        x_nchw, w_flat, b_flat, geoms, acts, interpret=interpret,
        d_flat=_denorm_flat(denorm), p_flat=p_flat, ilv=_ilv_mode(),
        out_dtype=out_dtype,
    )
    return out if nchw_out else _nchw_to_nhwc(out)
