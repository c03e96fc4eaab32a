"""Experimental decoder-tail variants (perf A/B) stay bit-identical to
the production fused kernel (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cae_tools_tpu.models.sizer import create_model_spec
from cae_tools_tpu.nn import modules as M
from cae_tools_tpu.ops import convops
from cae_tools_tpu.ops.pallas.decoder_kernel import decoder_apply_fused_tail
from cae_tools_tpu.ops.pallas.decoder_kernel_exp import (
    decoder_apply_fused_tail_exp,
)


@pytest.mark.parametrize("variant,gpack", [
    ("full", 1), ("rowsplit", 1), ("planes", 1),
    ("rowshuf", 1), ("shuffle", 1),
    ("rowsplit", 2),  # batch 3 -> exercises the gpack padding path
])
def test_exp_variant_matches_production(variant, gpack):
    convops.set_precision("highest")
    try:
        spec = create_model_spec(
            input_size=(16, 16), input_channels=1,
            output_size=(250, 254), output_channels=1,  # odd/even mix
        )
        dec = M.ConvDecoder(spec.output_layers, 16, 32)
        dp, ds = dec.init(jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        ds = jax.tree_util.tree_map(
            lambda a: a + 0.3 * jnp.asarray(
                np.abs(rng.normal(size=a.shape)).astype(np.float32))
            if a.dtype == jnp.float32 else a,
            ds,
        )
        z = jnp.asarray(
            np.random.default_rng(2).normal(size=(3, 16)).astype(np.float32)
        )
        ref = decoder_apply_fused_tail(dec, dp, ds, z, interpret=True)
        out = decoder_apply_fused_tail_exp(
            dec, dp, ds, z, variant=variant, gpack=gpack, interpret=True
        )
        assert out.shape == ref.shape
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    finally:
        convops.set_precision("high")
