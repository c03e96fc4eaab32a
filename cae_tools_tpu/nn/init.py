"""Weight initialisers with torch-default statistics.

The reference relies on torch's default layer init for the encoder
(``encoder.py:43-57``) and on explicit kaiming/xavier init for the decoder
(``decoder.py:55-71``).  Training from scratch should start from the same
weight distributions; these replicate torch's formulas:

 * conv/linear default: ``kaiming_uniform_(a=sqrt(5))`` on the weight and
   ``U(-1/sqrt(fan_in), 1/sqrt(fan_in))`` on the bias
 * ``kaiming_normal_(mode='fan_out', nonlinearity='relu')``: N(0, 2/fan_out)
 * ``xavier_normal_``: N(0, 2/(fan_in+fan_out))

Fan computation follows torch's convention: for a weight tensor, fan_in =
dim1 * receptive_field, fan_out = dim0 * receptive_field, evaluated on the
*torch-layout* tensor — callers below pass the torch fans explicitly so the
HWIO storage layout doesn't change the statistics.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def kaiming_uniform_a5(rng, shape, fan_in, dtype=jnp.float32):
    """torch default weight init: kaiming_uniform with a=sqrt(5)."""
    gain = math.sqrt(2.0 / (1.0 + 5.0))  # leaky_relu gain with a^2 = 5
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(rng, shape, dtype, minval=-bound, maxval=bound)


def bias_uniform(rng, shape, fan_in, dtype=jnp.float32):
    """torch default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(rng, shape, dtype, minval=-bound, maxval=bound)


def kaiming_normal_fan_out_relu(rng, shape, fan_out, dtype=jnp.float32):
    std = math.sqrt(2.0 / fan_out)
    return std * jax.random.normal(rng, shape, dtype)


def xavier_normal(rng, shape, fan_in, fan_out, dtype=jnp.float32):
    std = math.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(rng, shape, dtype)
