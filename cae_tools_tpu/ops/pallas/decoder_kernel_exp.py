"""EXPERIMENTAL fused decoder-tail variants (perf A/B only).

The production kernel (``decoder_kernel.py``) interleaves every stage's
parity planes in-kernel with 0/1 MXU matmuls and writes the full-res
image.  Profiler traces show the *final* stage's interleave matmuls are
the single largest MXU cost (the planes are full-resolution there), and
the NHWC->NCHW input transpose plus output relayouts cost ~26% of apply
device time.  These variants test cheaper final-stage strategies:

- ``full``      — production behaviour (control; same math, separate
                  trace so A/B runs never touch the production cache).
- ``rowsplit``  — final stage keeps the column interleave (MXU) but
                  skips the row interleave: kernel emits (2, m_h, o_w)
                  row-parity planes per channel; the wrapper interleaves
                  rows with a free-ish XLA transpose+reshape (row-granular
                  relayout, 1 KB rows) fused with the final activation.
- ``planes``    — final stage emits all four (a, b) parity planes; the
                  wrapper does a full XLA depth-to-space + activation.
- ``rowshuf``   — EVERY stage: column interleave stays an MXU matmul,
                  row interleave becomes an in-VMEM sublane shuffle
                  (``stack(axis=1)+reshape``) — the 0/1 row-expansion
                  matmul is pure row selection, so a relayout can replace
                  ~half the interleave MXU FLOPs (~33 MFLOP/img at the
                  final stage) if Mosaic lowers the shuffle well.
- ``shuffle``   — EVERY stage: both interleaves as in-VMEM shuffles
                  (rows: sublane stack+reshape; cols: lane
                  stack(axis=2)+reshape) — no interleave matmuls at all.
                  NOTE: compiles in interpret mode only; Mosaic rejects
                  the lane interleave's shape cast on real TPU
                  ("infer-vector-layout: unsupported shape cast
                  (32,32,2)->(32,64)", measured 2026-08-18).

Measured verdicts (BASELINE.md "Final-stage kernel strategy A/B"): every
variant loses to or ties the production kernel — rowsplit −14%,
planes −20%, gpack ±0, rowshuf ±0 (7.12 vs 7.13 us/img; the 0/1
row-expansion matmul was already free), shuffle uncompilable.  The
production kernel's in-kernel MXU interleave stands.

All variants share an optional ``gpack`` (images per grid step): the
grid shrinks by G and the kernel unrolls G images per step, amortizing
per-step prologue/epilogue latency.

Math is f32 end-to-end in every variant (same parity contract as the
production kernel).  Nothing imports this module except the A/B harness
(``scripts/kernel_ab.py``) and its test.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decoder_kernel import (
    _expand_mats,
    _nchw_to_nhwc,
    _plane_rows,
    _taps,
    fold_tail_params,
    tail_start_index,
)


def _stage_parity_planes(chans, w_ref, b_ref, w_off, b_off, geom):
    """Per-output-channel parity planes P[(a, b)] of one ConvT stage.

    Identical tap math to the production ``_stage_fused`` but stops
    before the interleave; bias is NOT applied (plane-wise later)."""
    k_h, k_w, cin, cout, i_h, i_w, o_h, o_w = geom
    m_h = _plane_rows(o_h)
    m_w = _plane_rows(o_w)
    pad_b = max(0, m_h - i_h)
    pad_r = max(0, m_w - i_w)
    padded = [jnp.pad(c, ((1, pad_b), (1, pad_r))) for c in chans]

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
        out.append(planes)
    return out


def _interleave_cols(p0, p1, f0, f1):
    return jnp.dot(p0, f0, preferred_element_type=jnp.float32) + jnp.dot(
        p1, f1, preferred_element_type=jnp.float32
    )


def _interleave_rows(p0, p1, e0, e1):
    return jnp.dot(e0, p0, preferred_element_type=jnp.float32) + jnp.dot(
        e1, p1, preferred_element_type=jnp.float32
    )


def _interleave_cols_shuf(p0, p1, o_w):
    """out[:, 2n+b] = p_b[:, n] as a lane interleave: stack on a new minor
    axis and collapse — exact (no arithmetic), vs the matmul's f32 MXU
    passes.  Trailing garbage column (odd o_w) sliced off."""
    m_h, m_w = p0.shape
    y = jnp.stack([p0, p1], axis=2).reshape(m_h, 2 * m_w)
    return y[:, :o_w]


def _interleave_rows_shuf(c0, c1, o_h):
    """out[2n+a, :] = c_a[n, :] as a sublane interleave."""
    m_h, o_w = c0.shape
    y = jnp.stack([c0, c1], axis=1).reshape(2 * m_h, o_w)
    return y[:o_h]


def _act(y, act):
    if act == "relu":
        return jnp.maximum(y, 0.0)
    if act == "sigmoid":
        return jax.nn.sigmoid(y)
    return y


def _tail_kernel_exp(x_ref, w_ref, b_ref, *refs, geoms, acts, variant, gpack):
    out_ref = refs[-1]
    n_stages = len(geoms)
    for g in range(gpack):
        chans = [x_ref[g, c] for c in range(geoms[0][2])]
        w_off = b_off = 0
        for si, (geom, act) in enumerate(zip(geoms, acts)):
            k_h, k_w, cin, cout = geom[:4]
            last = si == n_stages - 1
            pl_out = _stage_parity_planes(
                chans, w_ref, b_ref, w_off, b_off, geom
            )
            er_ref, fc_ref = refs[2 * si], refs[2 * si + 1]
            if last and variant == "planes":
                for co, planes in enumerate(pl_out):
                    for a in range(2):
                        for b in range(2):
                            out_ref[g, co * 4 + a * 2 + b] = (
                                planes[(a, b)] + b_ref[b_off + co]
                            )
            elif last and variant == "rowsplit":
                f0, f1 = fc_ref[0], fc_ref[1]
                for co, planes in enumerate(pl_out):
                    bias = b_ref[b_off + co]
                    out_ref[g, co, 0] = (
                        _interleave_cols(planes[(0, 0)], planes[(0, 1)],
                                         f0, f1) + bias
                    )
                    out_ref[g, co, 1] = (
                        _interleave_cols(planes[(1, 0)], planes[(1, 1)],
                                         f0, f1) + bias
                    )
            else:
                f0, f1 = fc_ref[0], fc_ref[1]
                o_h, o_w = geom[6], geom[7]
                if variant == "shuffle":
                    icols = lambda p0, p1: _interleave_cols_shuf(p0, p1, o_w)
                else:
                    icols = lambda p0, p1: _interleave_cols(p0, p1, f0, f1)
                if variant in ("shuffle", "rowshuf"):
                    irows = lambda c0, c1: _interleave_rows_shuf(c0, c1, o_h)
                else:
                    irows = lambda c0, c1: _interleave_rows(
                        c0, c1, er_ref[0], er_ref[1]
                    )
                nxt = []
                for co, planes in enumerate(pl_out):
                    c0 = icols(planes[(0, 0)], planes[(0, 1)])
                    c1 = icols(planes[(1, 0)], planes[(1, 1)])
                    y = irows(c0, c1)
                    y = _act(y + b_ref[b_off + co], act)
                    nxt.append(y)
                if last:
                    for co, y in enumerate(nxt):
                        out_ref[g, co] = y
                else:
                    chans = nxt
            w_off += k_h * k_w * cin * cout
            b_off += cout


@functools.partial(
    jax.jit, static_argnames=("geoms", "acts", "variant", "gpack", "interpret")
)
def _run_tail_exp(x_nchw, w_flat, b_flat, geoms, acts, variant="full",
                  gpack=1, interpret=False):
    n = x_nchw.shape[0]
    assert n % gpack == 0, "caller pads the batch to a multiple of gpack"
    cin0, i_h, i_w = geoms[0][2], geoms[0][4], geoms[0][5]
    cout_last = geoms[-1][3]
    o_h, o_w = geoms[-1][6], geoms[-1][7]
    m_h, m_w = _plane_rows(o_h), _plane_rows(o_w)
    kernel = functools.partial(
        _tail_kernel_exp, geoms=geoms, acts=acts, variant=variant,
        gpack=gpack,
    )

    ef_arrays = []
    ef_specs = []
    for (k_h, k_w, _ci, _co, ih, iw, oh, ow) in geoms:
        er = _expand_mats(_plane_rows(oh), oh)
        fc = np.transpose(_expand_mats(_plane_rows(ow), ow), (0, 2, 1))
        ef_arrays += [jnp.asarray(er), jnp.asarray(fc)]
        ef_specs += [
            pl.BlockSpec(er.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(fc.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]

    if variant == "planes":
        out_block = (gpack, 4 * cout_last, m_h, m_w)
    elif variant == "rowsplit":
        out_block = (gpack, cout_last, 2, m_h, o_w)
    else:
        out_block = (gpack, cout_last, o_h, o_w)
    zeros = (0,) * (len(out_block) - 1)

    out = pl.pallas_call(
        kernel,
        grid=(n // gpack,),
        in_specs=[
            pl.BlockSpec((gpack, cin0, i_h, i_w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            *ef_specs,
        ],
        out_specs=pl.BlockSpec(out_block, lambda i: (i, *zeros),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n,) + out_block[1:], jnp.float32),
        interpret=interpret,
    )(x_nchw, w_flat, b_flat, *ef_arrays)

    final_act = acts[-1]
    if variant == "planes":
        out = _act(out, final_act)
        out = out.reshape(n, cout_last, 2, 2, m_h, m_w)
        out = jnp.transpose(out, (0, 1, 4, 2, 5, 3))
        out = out.reshape(n, cout_last, 2 * m_h, 2 * m_w)
        return out[:, :, :o_h, :o_w]
    if variant == "rowsplit":
        out = _act(out, final_act)
        out = jnp.transpose(out, (0, 1, 3, 2, 4))
        out = out.reshape(n, cout_last, 2 * m_h, o_w)
        return out[:, :, :o_h, :]
    return out


def decoder_apply_fused_tail_exp(
    decoder, params, state, z, variant="full", gpack=1, start=None,
    interpret=False,
):
    """``decoder_apply_fused_tail`` twin running an experimental variant.

    Same contract (NHWC output, f32 math); pads the batch to a multiple
    of ``gpack`` and slices back."""
    if start is None:
        start = tail_start_index(decoder)
    assert start is not None

    from ...nn.modules import bn_apply
    from ...ops.convops import conv_transpose2d, dense

    c, y, x = decoder.unflat_dims
    h = jax.nn.relu(dense(z, params["fc1"]["w"], params["fc1"]["b"]))
    h = dense(h, params["fc2"]["w"], params["fc2"]["b"])
    h = h.reshape(h.shape[0], y, x, c)
    for i in range(start):
        spec = decoder.layers[i]
        h = (
            conv_transpose2d(
                h, params["convs"][i]["w"], stride=spec.get_stride(),
                output_padding=spec.get_output_padding(),
            )
            + params["convs"][i]["b"]
        )
        h, _ = bn_apply(
            params["bns"][i], state["bns"][i], h, False, axes=(0, 1, 2)
        )
        h = jax.nn.relu(h)

    geoms, acts, w_flat, b_flat = fold_tail_params(
        decoder, params, state, start
    )
    x_nchw = jnp.transpose(h, (0, 3, 1, 2)).astype(jnp.float32)
    n = x_nchw.shape[0]
    n_pad = ((n + gpack - 1) // gpack) * gpack
    if n_pad != n:
        x_nchw = jnp.pad(x_nchw, ((0, n_pad - n), (0, 0), (0, 0), (0, 0)))
    out = _run_tail_exp(
        x_nchw, w_flat, b_flat, geoms, acts, variant=variant, gpack=gpack,
        interpret=interpret,
    )[:n]
    return _nchw_to_nhwc(out)
