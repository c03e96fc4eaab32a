"""Convolution primitives in TPU-native NHWC/HWIO layout.

These wrap ``lax.conv_general_dilated`` with the exact geometry semantics of
the reference's torch layers (``models/encoder.py:43-45`` Conv2d VALID
strided; ``models/decoder.py:44-45`` ConvTranspose2d with ``output_padding``)
so that layer specs solved by :mod:`cae_tools_tpu.models.sizer` produce
identical shapes, and weights imported from reference checkpoints produce
identical outputs.

Layout conventions (TPU-native, distinct from the reference's NCHW/OIHW):
 * activations: ``(N, H, W, C)``
 * conv kernels: ``(kh, kw, C_in, C_out)`` (HWIO)
 * transposed-conv kernels are stored as the HWIO kernel of the equivalent
   forward conv on the dilated input (i.e. already spatially flipped relative
   to torch's ``(C_in, C_out, kh, kw)`` layout — see ``nn/torchio.py``).

XLA lowers both primitives onto the MXU; f32 accumulation is requested via
``preferred_element_type`` so bf16 inputs still accumulate exactly.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_DIMNUMS = ("NHWC", "HWIO", "NHWC")

# Module-level precision for conv/matmul ops.  Measured on TPU v5e against
# the torch-CPU f32 reference (16x16->256x256 ConvAE forward):
#   highest: 1.1e-6 max err, 1.00x speed   (6-pass bf16)
#   high:    1.4e-6 max err, 1.66x speed   (3-pass bf16) <- default
#   default: 9.3e-5 max err, 2.93x speed   (1-pass bf16, above 1e-5 target)
# "high" keeps the <=1e-5 output-parity contract with a 66% throughput win.
_PRECISION = lax.Precision.HIGH


def set_precision(precision):
    """Set global op precision: 'default' | 'high' | 'highest' or a lax.Precision."""
    global _PRECISION
    if isinstance(precision, str):
        precision = {
            "default": lax.Precision.DEFAULT,
            "high": lax.Precision.HIGH,
            "highest": lax.Precision.HIGHEST,
        }[precision]
    _PRECISION = precision


def get_precision():
    return _PRECISION


def _pair(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


def _match_operand(x, w):
    """Cast activations down to a narrower weight dtype.

    bf16 parameter storage (``BaseModel.set_apply_dtype``) keeps weights at
    rest in bf16; the MXU then takes a bf16xbf16 pass with f32 accumulation
    (``preferred_element_type``) — numerically the 1-pass DEFAULT fast path,
    with half the weight HBM traffic.
    """
    if x.dtype != w.dtype and jnp.dtype(w.dtype).itemsize < jnp.dtype(x.dtype).itemsize:
        return x.astype(w.dtype)
    return x


def conv2d(x, w, stride=1, padding="VALID"):
    """Strided conv, VALID padding by default (torch Conv2d padding=0).

    x: (N, H, W, Cin) ; w: (kh, kw, Cin, Cout) -> (N, H', W', Cout)
    """
    sh, sw = _pair(stride)
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    return lax.conv_general_dilated(
        _match_operand(x, w),
        w,
        window_strides=(sh, sw),
        padding=padding,
        dimension_numbers=_DIMNUMS,
        precision=_PRECISION,
        preferred_element_type=jnp.float32,
    )


def conv_transpose2d(x, w, stride=1, output_padding=0, padding=0):
    """Transposed conv matching torch ConvTranspose2d geometry.

    ``out = (in - 1)*stride - 2*padding + kernel + output_padding``

    Implemented as a conv over the lhs-dilated input: dilate x by ``stride``,
    pad spatially by ``(k-1-p, k-1-p+output_padding)``, then unit-stride
    conv with the (pre-flipped) HWIO kernel.

    x: (N, H, W, Cin) ; w: (kh, kw, Cin, Cout) -> (N, H', W', Cout)
    """
    sh, sw = _pair(stride)
    kh, kw = w.shape[0], w.shape[1]
    oph, opw = _pair(output_padding)
    ph, pw = _pair(padding)
    pad = [
        (kh - 1 - ph, kh - 1 - ph + oph),
        (kw - 1 - pw, kw - 1 - pw + opw),
    ]
    return lax.conv_general_dilated(
        _match_operand(x, w),
        w,
        window_strides=(1, 1),
        padding=pad,
        lhs_dilation=(sh, sw),
        dimension_numbers=_DIMNUMS,
        precision=_PRECISION,
        preferred_element_type=jnp.float32,
    )


def dense(x, w, b=None):
    """x @ w (+ b). w stored (in, out) — transposed from torch's (out, in)."""
    y = jnp.dot(
        _match_operand(x, w), w,
        precision=_PRECISION, preferred_element_type=jnp.float32,
    )
    if b is not None:
        y = y + b
    return y
