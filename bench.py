"""Benchmark: apply + train throughput of the flagship ConvAE (and UNET
train) vs PyTorch-CPU.

Measures the BASELINE.json north-star config — batched inference of a
16x16 -> 256x256 convolutional autoencoder (encoder conv stack, FC
bottleneck, transposed-conv decoder, reference geometry from the auto
layer-spec solver) — on the default JAX device (TPU under the driver), and
the identical architecture built in torch on CPU as the reference baseline.
Also measures steady-state *training* throughput (forward+backward+Adam
step, the reference hot loop at ``conv_ae_model.py:328-341`` /
``unet.py:295-337``) for ConvAE and UNET, with a torch-CPU ConvAE train
baseline.

Prints a JSON result line:
    {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N, ...}
A fresh, strictly-richer line is re-emitted after every completed stage,
so whichever line a harness parses (first or last) is a valid record even
if the process is killed mid-run.

MEASUREMENT ISOLATION (v5e via the axon tunnel, measured 2026-08-16): the
moment a *second* distinct executable runs in a process, every subsequent
dispatch pays a permanent ~5 ms tax (train step: 81.9k img/s fresh ->
13.1k after one apply graph ran; freeing the other graph's buffers does
not restore it).  Any metric whose true step time is O(ms) is therefore
meaningless unless it is the FIRST executable its process ever ran.  This
driver re-invokes itself (``CAE_BENCH_ONLY=<metric>`` subprocesses) so
each fast-step metric gets a fresh process; the product is unaffected
(the compiled trainer dispatches one multi-epoch scan, and apply is one
``lax.map`` over the whole dataset).

BUDGET + STALL TOLERANCE (round 3): the tunnel exhibits transient
multi-minute stalls (the same cached 3x3-conv graph ran in 5.5 s, 15 s,
then hung >300 s within one hour) and 100-300+ s cold remote compiles —
this is what timed round 2's bench out (BENCH_r02 rc=124, nothing
printed).  Counters here: (a) torch-CPU baselines run FIRST (no tunnel);
(b) every subprocess gets its own wall-clock slice and is killed (not
waited on) when it exceeds it, its partial output still harvested;
(c) the headline metric runs before everything else and the JSON line is
emitted as soon as it exists; (d) a persistent XLA compilation cache
(.jax_cache/, survives across processes AND driver rounds) amortizes the
remote compiles; (e) a total budget (CAE_BENCH_BUDGET_S, default 1000 s)
gates each further metric, and whatever was measured is reported with
the rest listed in "skipped".
"""

import json
import os
import statistics
import sys
import time
from functools import partial

import numpy as np

# hardened baseline: fixed iteration count, variance reported
TORCH_ITERS = int(os.environ.get("CAE_BENCH_TORCH_ITERS", "20"))
# smoke-test overrides (CPU CI); the driver runs defaults on TPU.
# Batch 8192 amortizes the tunnel's ~3 ms/call dispatch to <7% of the
# fused apply's device time (measured scaling: 79k img/s @512, 114k
# @1024, 142k @2048, 156k @4096, 167k @8192 — vs the 187k img/s
# on-device HBM roofline, BASELINE.md "Achieved vs roofline").
_BATCH = int(os.environ.get("CAE_BENCH_BATCH", "8192"))
_ITERS = int(os.environ.get("CAE_BENCH_ITERS", "20"))
#: total wall-clock budget; stay well inside the driver's ~20 min timeout
_BUDGET_S = float(os.environ.get("CAE_BENCH_BUDGET_S", "1000"))
#: first-sweep slice for the headline child (it is also retried).
#: 240 s, not 420 (round-4 revision): a healthy cache-warm headline
#: child lands in 25-150 s; setup stalls are per-process and mostly do
#: NOT resolve by waiting (observed: 420 s slices burned with zero
#: output while the very same graph measured in ~90 s minutes earlier),
#: so a shorter first slice + retry sweeps buys more stall-lottery
#: draws for the same budget.
_HEADLINE_CAP_S = float(os.environ.get("CAE_BENCH_HEADLINE_CAP_S", "240"))
#: first-output watchdog for the suite children: a healthy suite child
#: streams its first member JSON line within ~15-100 s (warm program
#: load + one scan dispatch) in every recorded validation, while a
#: setup-stalled child never prints — each stalled draw burns exactly
#: this much budget.  165 saves 15 s per stalled draw vs the old 180
#: (the 2026-08-20 stress sample missed 3 members by ~120 s) while
#: keeping >60 s of margin for a slow-but-healthy session's first line
#: (killing a healthy child wastes the slice AND a warm re-load in the
#: fallback, so the margin errs generous; the bigger stress-mode saver
#: is CAE_BENCH_TIMING_CALLS=2 on fallback draws).
_FIRST_JSON_S = float(os.environ.get("CAE_BENCH_FIRST_JSON_S", "165"))


def _enable_cache():
    from cae_tools_tpu.utils.compile_cache import enable_compile_cache

    return enable_compile_cache()


def build_jax_forward(spec, latent, fc, batch, fused_tail=False,
                      bf16_weights=False, bf16_out=False):
    """Closure-style jitted forward.

    NOTE (measured on the axon-tunneled TPU, 2026-08-16): repeated jit
    calls whose *explicit argument handles* are all identical are memoized
    by the tunnel (~0.06 ms/call regardless of the graph), which silently
    turns a throughput loop into a dispatch benchmark.  Closing over the
    params and passing only ``x`` measures real execution.
    """
    import jax
    import jax.numpy as jnp

    from cae_tools_tpu.nn import modules as M

    enc = M.ConvEncoder(spec.input_layers, latent, fc)
    dec = M.ConvDecoder(spec.output_layers, latent, fc)
    ep, es = enc.init(jax.random.PRNGKey(0))
    dp, ds = dec.init(jax.random.PRNGKey(1))
    if bf16_weights:
        ep, es, dp, ds = cast_params_bf16((ep, es, dp, ds))

    if fused_tail:
        # the TPU product-default apply path, product-exact form: fused
        # Pallas decoder tail with the output denormalisation affine
        # folded into the kernel's final activation and native NCHW out
        # (ConvAEModel._forward_denorm_nchw_p).  Post-fusion trace
        # (BASELINE.md round 4): the NHWC bench form paid a jit ROOT
        # relayout copy (copy.6, 14% of device time) that the product
        # path never executes — nchw_out=True makes the kernel output
        # the ROOT directly.
        from cae_tools_tpu.ops.pallas.decoder_kernel import (
            decoder_apply_fused_tail,
        )

        interpret = jax.default_backend() != "tpu"
        # bf16_out: the opt-in serving output dtype (apply_cae
        # --output-dtype bfloat16) — halves the kernel's dominant HBM
        # cost, the full-resolution output write (~2e-3 rel error,
        # outside the parity contract)
        out_dtype = "bfloat16" if bf16_out else "float32"

        @jax.jit
        def forward(x):
            z, _ = enc.apply(ep, es, x, train=False)
            return decoder_apply_fused_tail(
                dec, dp, ds, z, interpret=interpret,
                denorm=(275.0, 30.0), nchw_out=True, out_dtype=out_dtype,
            )

    else:

        @jax.jit
        def forward(x):
            z, _ = enc.apply(ep, es, x, train=False)
            y, _ = dec.apply(dp, ds, z, train=False)
            return y

    x = jnp.asarray(
        np.random.default_rng(0).random((batch, 16, 16, 1), dtype=np.float32)
    )
    return forward, x


def cast_params_bf16(params):
    import jax
    import jax.numpy as jnp

    def cast(leaf):
        arr = jnp.asarray(leaf)
        if jnp.issubdtype(arr.dtype, jnp.floating):
            return arr.astype(jnp.bfloat16)
        return arr

    return jax.tree_util.tree_map(cast, params)


def build_jax_convae_train(spec, latent, fc, batch, k_steps, fused_tail=False):
    """K train steps inside one ``lax.scan`` dispatch — the product
    trainer's shape (train/loop.py run_epochs).

    Per-dispatch step timing is unusable on the tunneled TPU: donated
    carries cycle the same device buffers, which re-triggers the tunnel's
    identical-handle memoization (measured 0.5 ms/"step" vs 3.37 ms real),
    and non-donated loops pay the post-second-executable dispatch tax
    instead.  Scanning K steps per call amortizes the tax to <2% and makes
    memoization impossible (the carry and rng differ every call)."""
    import jax
    import jax.numpy as jnp
    import optax

    from cae_tools_tpu.nn import modules as M

    enc = M.ConvEncoder(spec.input_layers, latent, fc)
    dec = M.ConvDecoder(spec.output_layers, latent, fc)
    ep, es = enc.init(jax.random.PRNGKey(0))
    dp, ds = dec.init(jax.random.PRNGKey(1))
    params = {"e": ep, "d": dp}
    state = {"e": es, "d": ds}
    # reference optimizer: Adam + weight_decay (conv_ae_model.py:310)
    tx = optax.chain(optax.add_decayed_weights(1e-5), optax.adam(1e-3))
    opt_state = tx.init(params)

    if fused_tail:
        # the TPU product-default train loss since round 3: fused
        # ConvT+sigmoid+SSE Pallas pair with analytic VJP on the final
        # decoder stage (ops/pallas/train_tail.py) — never materializes a
        # full-resolution tensor in HBM
        from cae_tools_tpu.ops.pallas.train_tail import last_stage_sse

        interpret = jax.default_backend() != "tpu"
        o_c, o_h, o_w = spec.output_layers[-1].get_output_dimensions()
        denom = float(o_c * o_h * o_w)

        def loss_fn(params, state, x, y):
            z, es2 = enc.apply(params["e"], state["e"], x, train=True)
            h, ds2 = dec.apply_head(params["d"], state["d"], z, train=True)
            cp = params["d"]["convs"][-1]
            sse = last_stage_sse(cp["w"], cp["b"], h, y, interpret=interpret)
            return jnp.mean(sse) / denom, {"e": es2, "d": ds2}

    else:

        def loss_fn(params, state, x, y):
            z, es2 = enc.apply(params["e"], state["e"], x, train=True)
            out, ds2 = dec.apply(params["d"], state["d"], z, train=True)
            return jnp.mean((out - y) ** 2), {"e": es2, "d": ds2}

    @partial(jax.jit, donate_argnums=(0,))
    def run(carry, rng, x, y):
        def step_fn(c, r):
            params, state, opt_state = c
            (loss, state), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, state, x, y
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, state, opt_state), loss

        carry, losses = jax.lax.scan(
            step_fn, carry, jax.random.split(rng, k_steps)
        )
        return carry, losses[-1]

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, 16, 16, 1), dtype=np.float32))
    y = jnp.asarray(rng.random((batch, 256, 256, 1), dtype=np.float32))
    return run, (params, state, opt_state), (x, y)


def build_jax_unet_train(batch, k_steps, fused_tail=False, residual=False):
    """K UNET train steps per ``lax.scan`` dispatch (see convae twin).

    ``residual=True`` builds the UNETRes form: linear decoder head, the
    bilinear-up + 1x1-projected base estimate plus res_scale * residual
    (``models/unet_model.py::UNETRes``); fused uses the residual-stats
    kernel that keeps the whole head in VMEM."""
    import jax
    import jax.numpy as jnp
    import optax

    from cae_tools_tpu.models.sizer import create_model_spec
    from cae_tools_tpu.nn import modules as M
    from cae_tools_tpu.ops import losses as L

    spec = create_model_spec(
        input_size=(16, 16), input_channels=1,
        output_size=(256, 256), output_channels=1,
    )
    enc = M.UNetEncoder(spec.input_layers, 32, 128, dropout_rate=0.1)
    skip_shapes = [tuple(l.get_output_dimensions()) for l in spec.input_layers[:-1]]
    dec = M.UNetDecoder(
        spec.output_layers, 32, 128, dropout_rate=0.1,
        skip_shapes=skip_shapes, final_sigmoid=not residual,
    )
    ep, es = enc.init(jax.random.PRNGKey(0))
    dp, ds = dec.init(jax.random.PRNGKey(1))
    params = {"e": ep, "d": dp}
    if residual:
        params["bp"] = {
            "w": jnp.full((1, 1, 1, 1), 1.0, jnp.float32),
            "b": jnp.zeros((1,), jnp.float32),
        }
        params["rs"] = jnp.asarray(0.01, jnp.float32)
    state = {"e": es, "d": ds}
    tx = optax.adamw(1e-3, weight_decay=1e-5)
    opt_state = tx.init(params)

    if fused_tail:
        # the TPU product-default UNET train loss since round 3: fused
        # ConvT+sigmoid+masked-stats Pallas pair on the final decoder stage
        # (ops/pallas/train_tail.py) — the full-resolution output never
        # reaches HBM; masked MSE + Pearson come from 7 per-image moments.
        # UNETRes uses the residual form (whole residual head in VMEM).
        from cae_tools_tpu.ops.pallas.train_tail import (
            last_stage_masked_stats,
            last_stage_residual_stats,
        )

        interpret = jax.default_backend() != "tpu"
        ones_w = jnp.ones((batch,), jnp.float32)

        def loss_fn(params, state, rng, x, y):
            r1, r2 = jax.random.split(rng)
            (z, skips), es2 = enc.apply(
                params["e"], state["e"], x, True, rng=r1
            )
            h, ds2 = dec.apply_head(
                params["d"], state["d"], z, skips, True, rng=r2
            )
            cp = params["d"]["convs"][-1]
            m = jnp.ones((batch,) + y.shape[1:3] + (1,), jnp.float32)
            if residual:
                stats = last_stage_residual_stats(
                    cp["w"], cp["b"], params["rs"], params["bp"]["w"],
                    params["bp"]["b"], h, x, y, m, interpret=interpret,
                )
            else:
                stats = last_stage_masked_stats(
                    cp["w"], cp["b"], h, y, m, interpret=interpret
                )
            mse = L.masked_mse_from_stats(stats, ones_w)
            corr = jnp.mean(L.masked_pearson_from_stats(stats, ones_w))
            return mse + (1.0 - corr), {"e": es2, "d": ds2}

    else:

        def loss_fn(params, state, rng, x, y):
            r1, r2 = jax.random.split(rng)
            (z, skips), es2 = enc.apply(params["e"], state["e"], x, True, rng=r1)
            out, ds2 = dec.apply(params["d"], state["d"], z, skips, True, rng=r2)
            if residual:
                from cae_tools_tpu.ops import convops

                up = jax.image.resize(
                    x, (batch,) + y.shape[1:3] + (x.shape[3],), "bilinear"
                )
                base = convops.conv2d(up, params["bp"]["w"]) + params["bp"]["b"]
                out = base + params["rs"] * out
            mask = jnp.ones_like(out)
            mse = L.masked_mse(out, y, mask)
            corr = jnp.mean(L.masked_pearson(out, y, mask))
            return mse + (1.0 - corr), {"e": es2, "d": ds2}

    @partial(jax.jit, donate_argnums=(0,))
    def run(carry, rng, x, y):
        def step_fn(c, r):
            params, state, opt_state = c
            (loss, state), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, state, r, x, y
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, state, opt_state), loss

        carry, losses = jax.lax.scan(
            step_fn, carry, jax.random.split(rng, k_steps)
        )
        return carry, losses[-1]

    nprng = np.random.default_rng(0)
    x = jnp.asarray(nprng.random((batch, 16, 16, 1), dtype=np.float32))
    y = jnp.asarray(nprng.random((batch, 256, 256, 1), dtype=np.float32))
    return run, (params, state, opt_state), (x, y)


def build_jax_varae_train(batch, k_steps, fused_tail=False):
    """K VarAE train steps per ``lax.scan`` dispatch.

    The reference's VAE method (rebuilt per SURVEY §2.11; loss contract
    lambda_mse*MSE + lambda_kl*KL + lambda_ssim*(1 - MS-SSIM)).  On TPU
    the MS-SSIM value+grad runs in the fused Pallas kernels
    (``ops/pallas/msssim_kernel.py``) — this metric is the
    driver-recordable evidence for them.  ``fused_tail`` mirrors the
    product default since round 5 (``var_ae_model.py::_make_loss_fn``):
    the final ConvT+sigmoid+SSE and its analytic backward run in the
    *emitting* Pallas pair (``train_tail.last_stage_sse_emit``), which
    writes the full-resolution output once as the MS-SSIM kernels' input
    and folds their adjoint into the fused ConvT backprop."""
    import jax
    import jax.numpy as jnp
    import optax

    from cae_tools_tpu.nn import modules as M
    from cae_tools_tpu.ops import msssim as msssim_ops

    spec = _spec()
    enc = M.VarAEEncoder(spec.input_layers, _LATENT, _FC)
    dec = M.ConvDecoder(spec.output_layers, _LATENT, _FC)
    ep, es = enc.init(jax.random.PRNGKey(0))
    dp, ds = dec.init(jax.random.PRNGKey(1))
    params = {"e": ep, "d": dp}
    state = {"e": es, "d": ds}
    tx = optax.chain(optax.add_decayed_weights(1e-5), optax.adam(1e-3))
    opt_state = tx.init(params)

    if jax.default_backend() == "tpu":
        from cae_tools_tpu.ops.pallas import msssim_pallas as _msssim_fn
    else:
        _msssim_fn = msssim_ops.msssim

    if fused_tail:
        from cae_tools_tpu.ops.pallas.train_tail import last_stage_sse_emit

        o_c, o_h, o_w = dec.layers[-1].get_output_dimensions()
        denom = float(o_c * o_h * o_w)
        interpret = jax.default_backend() != "tpu"

        def loss_fn(params, state, rng, x, y):
            (mu, logvar), es2 = enc.apply(params["e"], state["e"], x, True)
            z = M.reparameterize(rng, mu, logvar)
            h, ds2 = dec.apply_head(params["d"], state["d"], z, True)
            cp = params["d"]["convs"][-1]
            sse, out = last_stage_sse_emit(
                cp["w"], cp["b"], h, y, interpret=interpret
            )
            mse = jnp.mean(sse) / denom
            kl = jnp.mean(
                -0.5 * jnp.sum(
                    1.0 + logvar - mu**2 - jnp.exp(logvar), axis=-1
                )
            )
            ssim = jnp.mean(
                _msssim_fn(out, y, data_range=1.0, average=False)
            )
            return mse + kl + (1.0 - ssim), {"e": es2, "d": ds2}

    else:

        def loss_fn(params, state, rng, x, y):
            (mu, logvar), es2 = enc.apply(params["e"], state["e"], x, True)
            z = M.reparameterize(rng, mu, logvar)
            out, ds2 = dec.apply(params["d"], state["d"], z, True)
            mse = jnp.mean((out - y) ** 2)
            kl = jnp.mean(
                -0.5 * jnp.sum(1.0 + logvar - mu**2 - jnp.exp(logvar), axis=-1)
            )
            ssim = jnp.mean(
                _msssim_fn(out, y, data_range=1.0, average=False)
            )
            return mse + kl + (1.0 - ssim), {"e": es2, "d": ds2}

    @partial(jax.jit, donate_argnums=(0,))
    def run(carry, rng, x, y):
        def step_fn(c, r):
            params, state, opt_state = c
            (loss, state), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, state, r, x, y
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, state, opt_state), loss

        carry, losses = jax.lax.scan(
            step_fn, carry, jax.random.split(rng, k_steps)
        )
        return carry, losses[-1]

    nprng = np.random.default_rng(0)
    x = jnp.asarray(nprng.random((batch, 16, 16, 1), dtype=np.float32))
    y = jnp.asarray(nprng.random((batch, 256, 256, 1), dtype=np.float32))
    return run, (params, state, opt_state), (x, y)


def build_jax_srcnn_train(batch, k_steps):
    """K SRCNNRes train steps per ``lax.scan`` dispatch.

    The reference accepts ``--method srcnn_res`` but never shipped the
    model (``base_model.py:142-143`` hints at it); the rebuilt capability
    (``models/srcnn_res_model.py``) is bilinear-up + 1x1 base projection +
    9-5-5 conv residual with an MSE loss.  Full-resolution 64-channel
    activations bound the batch (b x 256 x 256 x 64 f32 = 16.8 GB at
    b1024): b128 (the measured throughput knee) keeps fwd+bwd inside
    HBM — b256 fits too but gains nothing (scripts/srcnn_knee.py)."""
    import jax
    import jax.numpy as jnp
    import optax

    from cae_tools_tpu.nn import modules as M

    net = M.SRCNNRes((1, 16, 16), (1, 256, 256))
    params, state = net.init(jax.random.PRNGKey(0))
    tx = optax.chain(optax.add_decayed_weights(1e-5), optax.adam(1e-3))
    opt_state = tx.init(params)

    def loss_fn(params, x, y):
        out, _ = net.apply(params, state, x, train=True)
        return jnp.mean((out - y) ** 2)

    @partial(jax.jit, donate_argnums=(0,))
    def run(carry, rng, x, y):
        def step_fn(c, r):
            params, opt_state = c
            loss, grads = jax.value_and_grad(loss_fn)(params, x, y)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        carry, losses = jax.lax.scan(
            step_fn, carry, jax.random.split(rng, k_steps)
        )
        return carry, losses[-1]

    nprng = np.random.default_rng(0)
    x = jnp.asarray(nprng.random((batch, 16, 16, 1), dtype=np.float32))
    y = jnp.asarray(nprng.random((batch, 256, 256, 1), dtype=np.float32))
    return run, (params, opt_state), (x, y)


def build_jax_gan_train(batch, k_steps, n_critic=1):
    """K ResUNetGAN two-player steps per ``lax.scan`` dispatch.

    Mirrors the compiled WGAN-GP step of ``train/gan.py::GANTrainer``
    (reference intent markers: ``unet.py:277-293`` gradient-penalty
    leftover): per step, ``n_critic`` critic updates (Wasserstein loss +
    lambda_gp * gradient penalty, Adam(b1=0, b2=0.9)) on a stop-gradient
    generator sample, then one generator update with the UNET content
    loss (masked MSE + Pearson) plus lambda_adv * -E[D(G(x))].  The
    generator is the UNETRes residual form; the critic is the conditional
    PatchGAN (``nn.modules.PatchCritic``)."""
    import jax
    import jax.numpy as jnp
    import optax

    from cae_tools_tpu.models.sizer import create_model_spec
    from cae_tools_tpu.nn import modules as M
    from cae_tools_tpu.ops import convops
    from cae_tools_tpu.ops import losses as L

    spec = create_model_spec(
        input_size=(16, 16), input_channels=1,
        output_size=(256, 256), output_channels=1,
    )
    enc = M.UNetEncoder(spec.input_layers, 32, 128, dropout_rate=0.1)
    skip_shapes = [tuple(l.get_output_dimensions()) for l in spec.input_layers[:-1]]
    dec = M.UNetDecoder(
        spec.output_layers, 32, 128, dropout_rate=0.1,
        skip_shapes=skip_shapes, final_sigmoid=False,
    )
    critic = M.PatchCritic(
        image_shape=(1, 256, 256), cond_channels=1, base_channels=32
    )
    ep, es = enc.init(jax.random.PRNGKey(0))
    dp, ds = dec.init(jax.random.PRNGKey(1))
    g_params = {
        "e": ep, "d": dp,
        "bp": {
            "w": jnp.full((1, 1, 1, 1), 1.0, jnp.float32),
            "b": jnp.zeros((1,), jnp.float32),
        },
        "rs": jnp.asarray(0.01, jnp.float32),
    }
    state = {"e": es, "d": ds}
    d_params = critic.init(jax.random.PRNGKey(7))
    g_tx = optax.adamw(1e-3, weight_decay=1e-5)
    d_tx = optax.adam(1e-3, b1=0.0, b2=0.9)
    g_opt, d_opt = g_tx.init(g_params), d_tx.init(d_params)
    lam_adv, lam_gp = 1e-3, 10.0

    def net_apply(gp_, x, rng):
        r1, r2 = jax.random.split(rng)
        (z, skips), _ = enc.apply(gp_["e"], state["e"], x, True, rng=r1)
        out, _ = dec.apply(gp_["d"], state["d"], z, skips, True, rng=r2)
        up = jax.image.resize(
            x, (x.shape[0], 256, 256, x.shape[3]), "bilinear"
        )
        base = convops.conv2d(up, gp_["bp"]["w"]) + gp_["bp"]["b"]
        return base + gp_["rs"] * out

    def critic_apply(dp_, img, x):
        cond = jax.image.resize(
            x, (x.shape[0], 256, 256, x.shape[3]), "bilinear"
        )
        return critic.apply(dp_, img, cond=cond)

    @partial(jax.jit, donate_argnums=(0,))
    def run(carry, rng, x, y):
        def step_fn(c, r):
            g_params, d_params, g_opt, d_opt = c
            keys = jax.random.split(r, 2 + 2 * n_critic)
            r_g, r_fakes, r_gps = keys[1], keys[2:2 + n_critic], keys[2 + n_critic:]

            for i in range(n_critic):
                fake = jax.lax.stop_gradient(net_apply(g_params, x, r_fakes[i]))

                def d_loss_fn(dp_):
                    wdist = jnp.mean(critic_apply(dp_, y, x)) - jnp.mean(
                        critic_apply(dp_, fake, x)
                    )
                    gp = L.gradient_penalty(
                        r_gps[i],
                        lambda img: critic_apply(dp_, img, x),
                        y,
                        fake,
                    )
                    return -wdist + lam_gp * gp

                d_grads = jax.grad(d_loss_fn)(d_params)
                d_updates, d_opt = d_tx.update(d_grads, d_opt, d_params)
                d_params = optax.apply_updates(d_params, d_updates)

            def g_loss_fn(gp_):
                out = net_apply(gp_, x, r_g)
                m = jnp.ones_like(out)
                mse = L.masked_mse(out, y, m)
                corr = jnp.mean(L.masked_pearson(out, y, m))
                adv = -jnp.mean(critic_apply(d_params, out, x))
                return mse + (1.0 - corr) + lam_adv * adv

            loss, grads = jax.value_and_grad(g_loss_fn)(g_params)
            g_updates, g_opt = g_tx.update(grads, g_opt, g_params)
            g_params = optax.apply_updates(g_params, g_updates)
            return (g_params, d_params, g_opt, d_opt), loss

        carry, losses = jax.lax.scan(
            step_fn, carry, jax.random.split(rng, k_steps)
        )
        return carry, losses[-1]

    nprng = np.random.default_rng(0)
    x = jnp.asarray(nprng.random((batch, 16, 16, 1), dtype=np.float32))
    y = jnp.asarray(nprng.random((batch, 256, 256, 1), dtype=np.float32))
    return run, (g_params, d_params, g_opt, d_opt), (x, y)


def build_jax_unet_forward(batch, fused_tail=False):
    """Eval-mode UNET forward (the production downscaling model).

    ``fused_tail``: run the skip-free trailing decoder stages in the
    fused Pallas kernel (the on-TPU product default since round 3)."""
    import jax
    import jax.numpy as jnp

    from cae_tools_tpu.models.sizer import create_model_spec
    from cae_tools_tpu.nn import modules as M

    spec = create_model_spec(
        input_size=(16, 16), input_channels=1,
        output_size=(256, 256), output_channels=1,
    )
    enc = M.UNetEncoder(spec.input_layers, 32, 128, dropout_rate=0.1)
    skip_shapes = [tuple(l.get_output_dimensions()) for l in spec.input_layers[:-1]]
    dec = M.UNetDecoder(
        spec.output_layers, 32, 128, dropout_rate=0.1,
        skip_shapes=skip_shapes,
    )
    ep, es = enc.init(jax.random.PRNGKey(0))
    dp, ds = dec.init(jax.random.PRNGKey(1))

    if fused_tail:
        from cae_tools_tpu.ops.pallas.decoder_kernel import (
            unet_decoder_apply_fused_tail,
        )

        interpret = jax.default_backend() != "tpu"

        # product-exact form (UNETModel apply, unet_model.py:216): fused
        # denorm affine + native NCHW output — avoids the jit ROOT
        # relayout copy the NHWC bench form paid (BASELINE.md round 4)
        @jax.jit
        def forward(x):
            (z, skips), _ = enc.apply(ep, es, x, False)
            return unet_decoder_apply_fused_tail(
                dec, dp, ds, z, skips, interpret=interpret,
                denorm=(275.0, 30.0), nchw_out=True,
            )

    else:

        @jax.jit
        def forward(x):
            (z, skips), _ = enc.apply(ep, es, x, False)
            out, _ = dec.apply(dp, ds, z, skips, False)
            return out

    x = jnp.asarray(
        np.random.default_rng(0).random((batch, 16, 16, 1), dtype=np.float32)
    )
    return forward, x


def build_torch_forward(spec, latent, fc, batch):
    import torch
    import torch.nn as tnn

    layers = []
    for l in spec.input_layers:
        layers += [
            tnn.Conv2d(
                l.input_dimensions[0],
                l.output_dimensions[0],
                kernel_size=l.kernel_size,
                stride=l.stride,
            ),
            tnn.BatchNorm2d(l.output_dimensions[0]),
            tnn.ReLU(True),
        ]
    c, y, x = spec.input_layers[-1].output_dimensions
    encoder = tnn.Sequential(
        *layers,
        tnn.Flatten(start_dim=1),
        tnn.Linear(c * y * x, fc),
        tnn.ReLU(True),
        tnn.Linear(fc, latent),
    )
    c2, y2, x2 = spec.output_layers[0].input_dimensions
    dec_layers = []
    for l in spec.output_layers:
        dec_layers.append(
            tnn.ConvTranspose2d(
                l.input_dimensions[0],
                l.output_dimensions[0],
                kernel_size=l.kernel_size,
                stride=l.stride,
                output_padding=l.output_padding,
            )
        )
        if l is not spec.output_layers[-1]:
            dec_layers += [tnn.BatchNorm2d(l.output_dimensions[0]), tnn.ReLU(True)]
    decoder = tnn.Sequential(
        tnn.Linear(latent, fc),
        tnn.ReLU(True),
        tnn.Linear(fc, c2 * y2 * x2),
        tnn.Unflatten(dim=1, unflattened_size=(c2, y2, x2)),
        *dec_layers,
        tnn.Sigmoid(),
    )
    model = tnn.Sequential(encoder, decoder)
    xb = torch.rand((batch, 1, 16, 16))
    return model, xb


def _force(out):
    """Force completion via a host copy of one element.

    ``block_until_ready`` alone is not trusted on this host: the axon
    plugin's CPU wrapper was observed returning from it before the
    computation finished (8 x 35 ms forwards "completed" in 0.8 ms).  A
    scalar device->host read cannot lie."""
    import jax

    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(leaf.ravel()[0])


def time_jax(fn, x, iters):
    import jax

    out = fn(x)
    _force(out)  # compile + warm
    _force(fn(x))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
    _force(out)
    return time.perf_counter() - t0


def time_jax_apply_scan(forward, x, k, calls=2):
    """Best-of-``calls`` seconds per apply, K applies per scan dispatch.

    One executable and ONE dispatch per timed sample: ``forward`` runs K
    times inside a ``lax.scan`` whose carry is the current output (every
    iteration's full-resolution result is materialized into the carry
    buffer — the loop cannot be dead-code-eliminated and the per-image
    HBM write semantics of a real apply are preserved) and whose
    per-step input is scaled by a step-distinct factor (the body is not
    loop-invariant, so it cannot be hoisted out of the loop).  This is
    the product apply's own dispatch shape (``BaseModel.apply`` = one
    ``lax.map`` dispatch per dataset) and is immune to the tunnel's
    per-call hazards (BASELINE.md "measurement isolation"): memoized
    identical-handle calls (fresh host-built input per timed call) and
    the post-second-executable dispatch tax that scales with call I/O
    (paid once per dispatch, amortized over K applies to <2-3%) — which
    is what lets MULTIPLE apply metrics share one child process
    (``apply_suite``) instead of paying a fresh tunnel handshake each.
    """
    import jax
    import jax.numpy as jnp

    calls = _TIMING_CALLS or calls

    out_sd = jax.eval_shape(forward, x)
    scales = 1.0 + jnp.arange(k, dtype=jnp.float32) * 1e-4

    @jax.jit
    def run(xx):
        def step(_, s):
            return forward(xx * s), None

        y, _ = jax.lax.scan(
            step, jnp.zeros(out_sd.shape, out_sd.dtype), scales
        )
        return y

    # fresh host-built handle per call (hazard 1: identical handles are
    # memoized by the tunnel)
    x_host = np.asarray(x)
    xs = [jnp.asarray(x_host + np.float32(1e-6 * (i + 1)))
          for i in range(calls)]
    _force(run(x))  # compile/load + warm
    times = []
    for x_i in xs:
        t0 = time.perf_counter()
        _force(run(x_i))
        times.append(time.perf_counter() - t0)
    return min(times) / k


#: override the per-metric timing-dispatch count (0 = per-timer default).
#: The parent sets 2 for all_suite fallback draws: in an endemic-stall
#: session every second counts, and dropping the third scan dispatch
#: costs ~nothing statistically (scan timing is already dispatch-tax
#: immune) while saving 2-8 s x ~20 metrics of budget.
_TIMING_CALLS = int(os.environ.get("CAE_BENCH_TIMING_CALLS", "0"))


def time_jax_train_scan(run, carry, data, k_steps, calls=3):
    """Median seconds per train step from `calls` K-step scan dispatches."""
    import jax

    calls = _TIMING_CALLS or calls
    rng = jax.random.PRNGKey(0)
    carry, _ = run(carry, rng, *data)  # compile + warm
    _force(carry)
    times = []
    for i in range(calls):
        r = jax.random.fold_in(rng, i + 1)
        t0 = time.perf_counter()
        carry, _ = run(carry, r, *data)
        _force(carry)
        times.append(time.perf_counter() - t0)
    return statistics.median(times) / k_steps


def time_torch_forward(model, xb, iters, max_wall_s=60.0):
    import torch

    model.eval()
    times = []
    t_start = time.perf_counter()
    with torch.no_grad():
        model(xb)  # warm
        for _ in range(iters):
            t0 = time.perf_counter()
            model(xb)
            times.append(time.perf_counter() - t0)
            # time-box: the budget clock is already running; a slow host
            # must cost the baseline samples, not the TPU metrics
            if len(times) >= 3 and time.perf_counter() - t_start > max_wall_s:
                break
    return times


def time_torch_train(model, xb, yb, iters, max_wall_s=120.0):
    import torch

    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3, weight_decay=1e-5)
    lossf = torch.nn.MSELoss()
    times = []
    t_start = time.perf_counter()
    for i in range(iters + 1):
        t0 = time.perf_counter()
        opt.zero_grad()
        loss = lossf(model(xb), yb)
        loss.backward()
        opt.step()
        if i > 0:  # first iteration is warmup
            times.append(time.perf_counter() - t0)
        if len(times) >= 3 and time.perf_counter() - t_start > max_wall_s:
            break
    return times


def ips_stats(times, batch):
    """images/sec from per-iter times: median rate + relative spread."""
    med = statistics.median(times)
    spread = (max(times) - min(times)) / med if med else 0.0
    return batch / med, spread


def _spec():
    from cae_tools_tpu.models.sizer import create_model_spec

    return create_model_spec(
        input_size=(16, 16), input_channels=1,
        output_size=(256, 256), output_channels=1,
        stride=2, kernel_size=3,
    )


# --------------------------------------------------------------------------
# roofline columns: static analytic FLOPs/bytes per image per metric, so the
# artifact itself says where each measured rate sits vs the v5e ceilings
# (HBM-bound at X% of peak bandwidth / MXU at Y% of the precision-ladder
# effective peak) instead of BASELINE.md prose.  Pure python (sizer only):
# the parent process must never touch the tunnel.
# --------------------------------------------------------------------------
_V5E_HBM_GBPS = 819.0       # HBM bandwidth ceiling, TPU v5e
_V5E_BF16_TFLOPS = 197.0    # MXU bf16 peak (f32 accumulate)
#: conv passes per precision mode — effective MXU peak = bf16 peak / passes
#: (HIGH = 3-pass bf16 error compensation, HIGHEST = 6-pass; convops.py)
_PREC_PASSES = {"default": 1, "high": 3, "highest": 6}


def _khw(layer):
    k = layer.kernel_size
    return (k, k) if isinstance(k, int) else tuple(k)


def _convae_stats(spec, latent, fc):
    """Per-image analytic stats of the ConvAE graph.

    ``fwd_flops``: 2*k_h*k_w*cin*cout*(out pixels) per conv stage (input
    pixels for ConvT — each input position contributes k^2 taps) + the FC
    pyramid.  ``acts``: intermediate activation element counts in forward
    order (excluding input/output).  ``tail_start``: first decoder stage
    the fused Pallas tail covers — mirror of the kernel's
    ``tail_start_index`` rule (stride 2, no output_padding, k <= 4,
    cin <= 8; ops/pallas/decoder_kernel.py:49-52) without importing it.
    """
    flops = 0
    acts = []
    params = 0
    for l in spec.input_layers:
        ci, _, _ = l.input_dimensions
        co, ho, wo = l.output_dimensions
        kh, kw = _khw(l)
        flops += 2 * kh * kw * ci * co * ho * wo
        params += kh * kw * ci * co + 3 * co  # w + b + BN scale/bias
        acts.append(co * ho * wo)
    c, y, x = spec.input_layers[-1].output_dimensions
    flops += 2 * (c * y * x * fc + fc * latent)
    params += c * y * x * fc + fc + fc * latent + latent
    acts += [fc, latent]
    c2, y2, x2 = spec.output_layers[0].input_dimensions
    flops += 2 * (latent * fc + fc * c2 * y2 * x2)
    params += latent * fc + fc + fc * c2 * y2 * x2 + c2 * y2 * x2
    acts += [fc, c2 * y2 * x2]
    tail_start = None
    for i, l in enumerate(spec.output_layers):
        ci = l.input_dimensions[0]
        kh, kw = _khw(l)
        ok = (
            l.stride == 2 and not l.output_padding
            and max(kh, kw) <= 4 and ci <= 8
        )
        if ok:
            if tail_start is None:
                tail_start = i
        else:
            tail_start = None
        co, ho, wo = l.output_dimensions
        ii, hi, wi = l.input_dimensions
        flops += 2 * kh * kw * ci * co * hi * wi
        params += kh * kw * ci * co + 3 * co
        if l is not spec.output_layers[-1]:
            acts.append(co * ho * wo)
    in_e = 16 * 16
    out_e = spec.output_layers[-1].output_dimensions[1] * \
        spec.output_layers[-1].output_dimensions[2]
    # elems of each decoder stage OUTPUT (for the fused-tail byte model)
    dec_out_elems = [
        l.output_dimensions[0] * l.output_dimensions[1] * l.output_dimensions[2]
        for l in spec.output_layers
    ]
    return {
        "fwd_flops": flops, "acts": acts, "params": params,
        "in_e": in_e, "out_e": out_e, "tail_start": tail_start,
        "dec_out_elems": dec_out_elems,
    }


def _srcnn_stats():
    """SRCNNRes (nn/modules.py:366): bilinear up + 1x1 base + 9-5-5
    residual head at full output resolution, cin = cout = 1."""
    px = 256 * 256
    n1, n2 = 64, 32
    flops = 2 * px * (81 * 1 * n1 + 25 * n1 * n2 + 25 * n2 * 1) \
        + 2 * px * 1 * 1 * 2  # base 1x1 conv + residual add
    acts = [px, px, n1 * px, n2 * px, px]  # up, base, h1, h2, res
    return {"fwd_flops": flops, "acts": acts, "params": 81 * n1 + 25 * n1 * n2
            + 25 * n2 + n1 + n2 + 2, "in_e": 16 * 16, "out_e": px}


def _roofline_rows(rates):
    """metric -> roofline dict for every measured metric with a sound
    analytic model.  Byte models (f32 = 4 B unless noted):

    * apply XLA: in + out + 2x every intermediate activation (each one is
      written by its producer fusion and read by its consumer).
    * apply fused: tail-stage activations never reach HBM — in + out +
      2x encoder/FC/head acts (the tail's input IS a head activation,
      so its producer write + kernel read sit inside that 2x term).
    * train: fwd writes + bwd reads of every activation (2 round trips =
      4x acts) + x + 2x output/target + 8x params (grad + adam moments)
      amortized over the batch.
    * train fused tail: the final stage's output, sigmoid residual and
      loss-grad chain stay in VMEM — drop that stage's 4x round trip and
      one output read (the kernel reads y once).

    UNET rows reuse the ConvAE-spec conv core (same auto spec; skip
    concat/attention/Pearson extras excluded — noted in "model"), so
    their fractions are lower bounds.  train_gan has no sound static
    model and gets no row.  MXU fraction uses the precision ladder's
    effective peak (_PREC_PASSES); MS-SSIM FLOPs (VarAE) are excluded.
    """
    s = _convae_stats(_spec(), _LATENT, _FC)
    f32 = 4
    sum_acts = sum(s["acts"])
    head_acts = sum(s["acts"]) - sum(s["dec_out_elems"][s["tail_start"]:-1]) \
        if s["tail_start"] is not None else sum_acts
    ae_xla_bytes = f32 * (s["in_e"] + s["out_e"] + 2 * sum_acts)
    ae_fused_bytes = f32 * (s["in_e"] + s["out_e"] + 2 * head_acts)
    last_out = s["dec_out_elems"][-1]

    def train_bytes(batch, fused=False):
        acts4 = 4 * (sum_acts + last_out)
        if fused:
            acts4 -= 4 * last_out  # final stage output never hits HBM
        per_img = f32 * (s["in_e"] + 2 * s["out_e"]) + f32 * acts4
        return per_img + 8 * f32 * s["params"] / batch

    fwd = s["fwd_flops"]
    sr = _srcnn_stats()
    sr_train_bytes = f32 * (sr["in_e"] + 2 * sr["out_e"]
                            + 4 * sum(sr["acts"])) \
        + 8 * f32 * sr["params"] / _SRCNN_BATCH
    rows = {
        # metric: (flops/img, bytes/img, passes, model note)
        "apply_fused": (fwd, ae_fused_bytes, 3, "convae fused-tail apply"),
        "apply_fused_scan": (fwd, ae_fused_bytes, 3, "convae fused-tail apply"),
        "apply_fused_bf16out": (
            fwd, ae_fused_bytes - 2 * s["out_e"], 3,
            "convae fused-tail apply, bf16 output write"),
        "apply_xla_high": (fwd, ae_xla_bytes, 3, "convae XLA apply"),
        "apply_bf16": (fwd, ae_xla_bytes, 1, "convae XLA apply, 1-pass bf16"),
        "apply_bf16_weights": (
            fwd, ae_xla_bytes, 1, "convae XLA apply, bf16 weights"),
        "apply_unet": (
            fwd, ae_xla_bytes, 3, "conv core only (skips/attention excl.)"),
        "apply_unet_fused": (
            fwd, ae_fused_bytes, 3, "conv core only (skips/attention excl.)"),
        "train_convae": (
            3 * fwd, train_bytes(_TRAIN_BATCH), 3, "convae train step"),
        "train_convae_bf16": (
            3 * fwd, train_bytes(_TRAIN_BATCH), 1, "convae train, 1-pass bf16"),
        "train_convae_fused": (
            3 * fwd, train_bytes(_TRAIN_BATCH, fused=True), 3,
            "convae train, fused last stage"),
        "train_convae_fused_bf16": (
            3 * fwd, train_bytes(_TRAIN_BATCH, fused=True), 1,
            "convae train, fused last stage + 1-pass bf16 interior"),
        "train_unet": (
            3 * fwd, train_bytes(_UNET_BATCH), 3,
            "conv core only (skips/attention/Pearson excl.)"),
        "train_unet_fused": (
            3 * fwd, train_bytes(_UNET_BATCH, fused=True), 3,
            "conv core only (skips/attention/Pearson excl.)"),
        "train_unet_fused_bf16": (
            3 * fwd, train_bytes(_UNET_BATCH, fused=True), 1,
            "conv core only (skips/attention/Pearson excl.)"),
        "train_unetres": (
            3 * fwd, train_bytes(_UNET_BATCH), 3,
            "conv core only (residual head/skips excl.)"),
        "train_unetres_fused": (
            3 * fwd, train_bytes(_UNET_BATCH, fused=True), 3,
            "conv core only (residual head/skips excl.)"),
        "train_varae": (
            3 * fwd, train_bytes(_VARAE_BATCH), 3,
            "conv core only (MS-SSIM value+grad excl.)"),
        # emitting fused tail: the stage's 4x round trip collapses to the
        # two trips the SSIM term makes structural (out write, dout read)
        "train_varae_fused": (
            3 * fwd,
            train_bytes(_VARAE_BATCH, fused=True) + f32 * 2 * last_out,
            3, "conv core only, emitting fused tail (MS-SSIM excl.)"),
        "train_srcnn": (
            3 * sr["fwd_flops"], sr_train_bytes, 3, "srcnn_res train step"),
        "train_srcnn_bf16": (
            3 * sr["fwd_flops"], sr_train_bytes, 1,
            "srcnn_res train, 1-pass bf16"),
    }
    out = {}
    for metric, ips in rates.items():
        if metric not in rows or not ips:
            continue
        flops, nbytes, passes, note = rows[metric]
        tflops = ips * flops / 1e12
        gbps = ips * nbytes / 1e9
        eff_peak = _V5E_BF16_TFLOPS / passes
        out[metric] = {
            "flops_per_img": round(flops / 1e6, 3),      # MFLOP
            "bytes_per_img": round(nbytes / 1024, 1),    # KiB
            "tflops": round(tflops, 3),
            "hbm_gbps": round(gbps, 1),
            "mxu_frac": round(tflops / eff_peak, 4),
            "hbm_frac": round(gbps / _V5E_HBM_GBPS, 4),
            "arith_intensity": round(flops / nbytes, 1),
            "model": note,
        }
    return out


#: fast-step metrics; each runs as the FIRST executable of its own process
#: (see docstring), as (precision, builder kwargs) apply variants or trains
_LATENT, _FC = 32, 128
# Train batches: occupancy-bound regime, so larger batch is ~free
# throughput (measured scaling, img/s: ConvAE 15-19k @b64 -> 29.9k @b128
# -> 34.0k @b256; UNET 7-9k @b32 -> 13.0k @b64 -> 21.2k @b128).  The
# large scan graphs cost 800-1500 s to remote-compile COLD but live in
# the persistent cache (.jax_cache/), so the per-metric slice only has
# to cover a cache hit — which is already true of the b64 graphs too.
# (The round-2 b128 "213k img/s" per-step reading was a
# donation-memoization artifact and is retracted — see BASELINE.md.)
_TRAIN_BATCH = min(512, _BATCH)
_UNET_BATCH = min(256, _BATCH)
_VARAE_BATCH = min(256, _BATCH)
#: torch-CPU train baseline batch — deliberately NOT _TRAIN_BATCH: oneDNN's
#: ConvTranspose2d backward degrades catastrophically at large batch on
#: this host (measured 0.25 s/iter at b64 vs 120-160 s/iter at b512 —
#: ~60x fewer img/s), which would eat the whole bench budget inside the
#: baseline.  img/s is batch-insensitive in the sane regime, so bench at
#: the reference's own batch-64 scale where torch is at its best.
_TORCH_TRAIN_BATCH = int(os.environ.get("CAE_BENCH_TORCH_TRAIN_BATCH", "64"))
#: steps per timed scan dispatch for the train metrics
_TRAIN_SCAN_STEPS = int(os.environ.get("CAE_BENCH_SCAN_STEPS", "64"))
#: pure-XLA apply baselines (xla_high / bf16 / bf16_weights / unet) bench
#: at batch 4096, NOT 8192 (round 4): XLA apply throughput is saturated by
#: 4096 (measured 76.2k img/s @4096 vs 77.9k @8192 UNET, 72.7-76.2k vs
#: 76.2k ConvAE — 2-5%, inside the tunnel's run variance), while the warm
#: program load that dominates each child's slice is 5x cheaper (measured
#: 2026-08-19: first call 57.8 s @4096 vs 299.9 s @8192, both cache-warm)
#: — the round-3 artifact's five skipped metrics were exactly these
#: children stalling past their slices at b8192.  The fused paths keep
#: b8192 (they load reliably; the headline is unchanged); the fused-vs-XLA
#: ratio is batch-stable (2.05x at matched b4096, 2.15x at matched b8192,
#: BASELINE.md scaling table).
_XLA_BATCH = int(os.environ.get("CAE_BENCH_XLA_BATCH", str(min(4096, _BATCH))))
#: extension-model train batches (round 4): SRCNNRes materializes
#: b x 256 x 256 x 64 f32 activations (fwd+bwd) — b128 is the knee;
#: the GAN two-player step runs ~4 full-res generator/critic passes + a
#: gradient-penalty double-grad per step — b128.
#: SRCNN knee measured round 5 (scripts/srcnn_knee.py, one-process scan
#: sweep): HIGH 582@b64 -> 1186@b128 -> 1185@b256; 1-pass bf16 1633@b64
#: -> 2932@b128 -> 2943@b256 img/s — both curves double to b128 then go
#: flat, so the default sits at the knee.
_SRCNN_BATCH = min(int(os.environ.get("CAE_BENCH_SRCNN_BATCH", "128")), _BATCH)
_GAN_BATCH = min(128, _BATCH)

#: apply metrics measured inside the ONE ``apply_suite`` child (round 4):
#: run #3 of the ordering experiment showed stalls are per-process
#: (an endemic-stall session stalled EVERY fresh child ~300 s while the
#: train_suite child's 13 sequential program loads inside one process
#: never stalled), so the apply baselines share a process too —
#: scan-dispatch timing makes that safe (see time_jax_apply_scan)
_APPLY_SUITE = (
    "apply_fused_scan",     # scan-timed twin of the headline (b8192)
    "apply_xla_high",       # ConvAE XLA comparison baseline (b4096)
    "apply_bf16",           # 1-pass bf16 XLA fast path (b4096)
    "apply_bf16_weights",   # + bf16 weight storage (b4096)
    "apply_unet",           # UNET pure-XLA baseline (b4096)
    "apply_unet_fused",     # UNET fused Pallas tail (b8192)
    "apply_fused_bf16out",  # fused tail + bf16 output write (b8192, r5)
)
#: applies per scan dispatch: sized so one dispatch runs 5-10 s of
#: device work — the once-per-dispatch tunnel tax (<=~0.6 s at these
#: I/O sizes) amortizes to <2-3%
_APPLY_SCAN_K = {
    "apply_fused_scan": 96,
    "apply_xla_high": 96,
    "apply_bf16": 192,
    "apply_bf16_weights": 192,
    "apply_unet": 96,
    "apply_unet_fused": 96,
    "apply_fused_bf16out": 96,
}
_APPLY_SCAN_K_OVERRIDE = int(os.environ.get("CAE_BENCH_APPLY_SCAN_K", "0"))


def measure_one(metric: str) -> dict:
    """Measure a single metric in THIS process (must be called fresh).

    Returns the metric's result dict; the CAE_BENCH_ONLY child entry
    point prints it as one JSON line on completion, which the parent
    harvests (a child killed mid-run reports nothing — the parent's
    stall tolerance then skips or retries the metric).

    ``train_suite`` measures ALL train metrics sequentially in this one
    process, printing each result line the moment it lands: per-child
    tunnel setup (handshake + program load) costs 100-200 s on slow days,
    and the scan-amortized train timings are immune to the dispatch tax
    (docstring point 2: ~5 ms flat on an 8 MB carry = 1-2% of a 64-step
    scan), so one process for seven train metrics is both cheaper and
    safe — unlike the fast apply metrics, which stay one-per-process."""
    _enable_cache()
    if metric in ("train_suite", "apply_suite", "all_suite"):
        # CAE_BENCH_HAVE: metrics the parent already harvested on an
        # earlier sweep — a retried suite child only measures the gaps.
        # ``all_suite`` is the fallback child (VERDICT r4 #1): EVERY
        # metric, apply baselines and the headline included, measured
        # sequentially in ONE long-lived process — stalls concentrate in
        # per-process tunnel setup (BASELINE.md ordering run #3: an
        # endemic-stall session stalled every fresh child ~300 s while
        # in-process sequential program loads never stalled), so one
        # process that wins its setup lottery can land everything
        # missing.  apply_fused (single-call wall timing) is first in
        # the order, so when it is missing it is still the first
        # executable of the process — the only validity condition its
        # timing method has.
        skip = {
            m
            for v in ("CAE_BENCH_SKIP", "CAE_BENCH_HAVE")
            for m in os.environ.get(v, "").split(",") if m
        }
        members = _SUITE_MEMBERS[metric]
        for m in members:
            if m in skip:
                continue
            t_m = time.monotonic()
            try:
                got = measure_one(m)
            except Exception as exc:  # one bad member must not kill the rest
                import traceback

                print(f"# bench-child: {m} failed: {exc!r}",
                      file=sys.stderr, flush=True)
                traceback.print_exc()
                continue
            got[m + "_measure_s"] = round(time.monotonic() - t_m, 1)
            print(json.dumps(got), flush=True)
        return {metric + "_done": 1}
    from cae_tools_tpu.ops import convops

    spec = _spec()
    iters = _ITERS
    if metric in ("train_convae", "train_convae_bf16", "train_convae_fused",
                  "train_convae_fused_bf16"):
        # bf16 variants: the 1-pass bf16 conv path ("default" precision)
        # through the same train scan — measured 1.97x the HIGH path
        # (63.2k vs 32.0k img/s @b256); opt-in via --precision default.
        # fused_bf16 stacks it with the fused tail: bf16 interior convs,
        # f32 fused final stage + loss (the fast production recipe).
        convops.set_precision(
            "default" if metric.endswith("_bf16") else "high"
        )
        k = _TRAIN_SCAN_STEPS
        run, carry, data = build_jax_convae_train(
            spec, _LATENT, _FC, _TRAIN_BATCH, k,
            fused_tail=metric.startswith("train_convae_fused"),
        )
        ips = _TRAIN_BATCH / time_jax_train_scan(run, carry, data, k)
        return {metric: ips}
    if metric in ("train_unet", "train_unet_fused", "train_unet_fused_bf16",
                  "train_unetres", "train_unetres_fused"):
        # own process (scan timing amortizes any dispatch tax to <2%, and a
        # stalled UNET compile must not take the ConvAE number down with it).
        # fused_bf16 = the fast production recipe (--precision default +
        # fused tail): bf16 interior convs, f32 fused final stage + loss.
        convops.set_precision(
            "default" if metric.endswith("_bf16") else "high"
        )
        k = _TRAIN_SCAN_STEPS
        urun, ucarry, udata = build_jax_unet_train(
            _UNET_BATCH, k,
            fused_tail="_fused" in metric,
            residual="unetres" in metric,
        )
        unet_ips = _UNET_BATCH / time_jax_train_scan(urun, ucarry, udata, k)
        return {metric: unet_ips}
    if metric in ("train_varae", "train_varae_fused"):
        convops.set_precision("high")
        k = _TRAIN_SCAN_STEPS
        vrun, vcarry, vdata = build_jax_varae_train(
            _VARAE_BATCH, k, fused_tail=metric.endswith("_fused")
        )
        varae_ips = _VARAE_BATCH / time_jax_train_scan(vrun, vcarry, vdata, k)
        return {metric: varae_ips}
    if metric in ("train_srcnn", "train_srcnn_bf16"):
        # SRCNNRes is the one FLOP-bound model in the suite (~22 GFLOP/img
        # train; arith intensity ~200 FLOP/B) — the precision ladder moves
        # its MXU peak directly, so the 1-pass bf16 A/B is a first-class
        # metric here (VERDICT r4 #3), unlike the HBM-bound AE family
        # where it only trims operand traffic.
        convops.set_precision(
            "default" if metric.endswith("_bf16") else "high"
        )
        k = _TRAIN_SCAN_STEPS
        srun, scarry, sdata = build_jax_srcnn_train(_SRCNN_BATCH, k)
        return {metric: _SRCNN_BATCH / time_jax_train_scan(srun, scarry, sdata, k)}
    if metric == "train_gan":
        convops.set_precision("high")
        k = max(8, _TRAIN_SCAN_STEPS // 4)  # heavy two-player step
        grun, gcarry, gdata = build_jax_gan_train(_GAN_BATCH, k)
        return {metric: _GAN_BATCH / time_jax_train_scan(grun, gcarry, gdata, k)}
    if metric in _APPLY_SUITE:
        # scan-timed since round 4 (one dispatch per timed sample; see
        # time_jax_apply_scan) so the whole set shares one apply_suite
        # child.  fused twins at the b8192 headline scale; the pure-XLA
        # comparison baselines at the saturated b4096 (5x cheaper warm
        # program load, see _XLA_BATCH).
        convops.set_precision(
            "default" if metric.startswith("apply_bf16") else "high"
        )
        k = _APPLY_SCAN_K_OVERRIDE or _APPLY_SCAN_K[metric]
        if metric in ("apply_unet", "apply_unet_fused"):
            b = min(8192, _BATCH) if metric == "apply_unet_fused" else _XLA_BATCH
            forward, x = build_jax_unet_forward(
                b, fused_tail=metric == "apply_unet_fused"
            )
        else:
            fused_b8192 = metric in ("apply_fused_scan", "apply_fused_bf16out")
            b = min(8192, _BATCH) if fused_b8192 else _XLA_BATCH
            kwargs = {
                "apply_fused_scan": {"fused_tail": True},
                "apply_fused_bf16out": {"fused_tail": True, "bf16_out": True},
                "apply_xla_high": {},
                "apply_bf16": {},
                "apply_bf16_weights": {"bf16_weights": True},
            }[metric]
            forward, x = build_jax_forward(spec, _LATENT, _FC, b, **kwargs)
        return {metric: b / time_jax_apply_scan(forward, x, k)}
    # the headline: the fused product path at b8192, single-call wall
    # timing in a fresh process (the round-2/3 basis; keeps the headline
    # series comparable — its scan-timed twin is apply_fused_scan)
    assert metric == "apply_fused", metric
    convops.set_precision("high")
    forward, x = build_jax_forward(
        spec, _LATENT, _FC, _BATCH, fused_tail=True
    )
    ips = _BATCH * iters / time_jax(forward, x, iters)
    return {metric: ips}


def _metric_done(metric: str, rates: dict) -> bool:
    if metric in ("train_suite", "apply_suite", "all_suite"):
        skip = {
            m for m in os.environ.get("CAE_BENCH_SKIP", "").split(",") if m
        }
        return all(
            m in rates or m in skip for m in _SUITE_MEMBERS[metric]
        )
    return metric in rates


def _run_subprocess(metric: str, timeout_s: float, have=(),
                    first_json_s: float | None = None,
                    extra_env: dict | None = None) -> dict:
    """Run one metric in a fresh process with a hard wall-clock slice.

    The child's stdout is read line-by-line as it appears: the moment the
    requested metric's JSON line lands, the child is killed — a child
    that measures successfully but then stalls in teardown (observed on
    the tunnel: result printed, exit hung >250 s) must not burn the rest
    of its slice.  On timeout the child is killed and whatever JSON lines
    it already printed are harvested, so a stalled second sub-metric
    cannot take down an already-measured first one.

    ``first_json_s``: first-output watchdog.  Tunnel stalls concentrate
    in per-process setup (handshake/init, BASELINE.md ordering run #3) —
    a setup-stalled child prints NOTHING, while a healthy suite child
    streams its first member line within ~15-100 s (warm load + one scan
    dispatch).  Killing a child that has produced no JSON line by this
    deadline converts a dead 400 s slice into budget for another stall-
    lottery draw in a fresh process (stalls are per-process, so a retry
    re-rolls)."""
    import subprocess
    import sys
    import threading

    import tempfile

    env = dict(os.environ)
    env["CAE_BENCH_ONLY"] = metric
    if extra_env:
        env.update(extra_env)
    if have:  # a retried suite child only measures the gaps
        env["CAE_BENCH_HAVE"] = ",".join(sorted(have))
    # child stderr goes to a spool file: normally discarded, but when the
    # metric lands MISSING its tail is surfaced — a genuine code error
    # (ImportError, shape bug) must be distinguishable from a tunnel stall
    err_spool = tempfile.TemporaryFile(mode="w+", errors="replace")
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)],
        env=env, text=True,
        stdout=subprocess.PIPE, stderr=err_spool,
    )
    rates = {}
    done = threading.Event()
    # members the parent already holds count toward "suite done" (the
    # child was told to skip them via CAE_BENCH_HAVE and will not
    # re-emit them), but are NOT returned as this child's measurements
    had = dict.fromkeys(have, 1.0)

    def reader():
        try:
            for line in proc.stdout:
                line = line.strip()
                if line.startswith("{"):
                    try:
                        rates.update(json.loads(line))
                    except json.JSONDecodeError:
                        continue
                    if _metric_done(metric, {**had, **rates}):
                        done.set()  # measured: stop paying for teardown
                        return
        except Exception:
            pass
        finally:
            done.set()

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    deadline = time.monotonic() + timeout_s
    stalled = False
    if first_json_s is not None and first_json_s < timeout_s:
        if not done.wait(timeout=first_json_s) and not rates:
            stalled = True
            print(
                f"# bench: {metric} produced no output in "
                f"{first_json_s:.0f}s (setup stall), killed early for retry",
                file=sys.stderr, flush=True,
            )
    if not stalled and not done.wait(
        timeout=max(0.0, deadline - time.monotonic())
    ):
        print(f"# bench: {metric} exceeded {timeout_s:.0f}s slice, killed",
              file=sys.stderr, flush=True)
    proc.kill()
    proc.wait()
    t.join(timeout=5)
    if not _metric_done(metric, {**had, **rates}):
        try:
            err_spool.seek(0)
            tail = [ln.rstrip() for ln in err_spool.read().splitlines()
                    if ln.strip()][-12:]
            if tail:
                print(
                    f"# bench: {metric} child rc={proc.returncode} "
                    "stderr tail:\n  " + "\n  ".join(tail),
                    file=sys.stderr, flush=True,
                )
        except Exception:
            pass
    err_spool.close()
    return rates


#: train metrics, flagship order — measured inside ONE ``train_suite``
#: child (see measure_one) so the per-child tunnel setup is paid once
_TRAIN_METRICS = (
    "train_convae_fused",  # product-default train loss (fused last stage)
    "train_convae",        # XLA-HIGH train loss (the fused path's baseline)
    "train_convae_fused_bf16",  # fused tail + 1-pass bf16 interior convs
    "train_unet_fused",  # UNET product-default train loss (fused last stage)
    "train_unet_fused_bf16",  # fused tail + 1-pass bf16 interior convs
    "train_unet",        # UNET XLA train loss (the fused path's baseline)
    # never-driver-recorded metrics come before the recorded tail: if a
    # tunnel stall truncates the suite's slice, the loss falls on metrics
    # that already have a driver-recorded value.  train_convae_bf16 has
    # been skipped three rounds running (VERDICT r4 #1) — it now runs
    # seventh, not last; train_srcnn_bf16 is new in round 5 (the
    # precision-ladder A/B on the one FLOP-bound model).
    "train_convae_bf16",  # 1-pass bf16 train path (--precision default)
    "train_srcnn_bf16",   # SRCNN 1-pass bf16 A/B (FLOP-bound model)
    "train_varae_fused",  # emitting fused tail + Pallas MS-SSIM (round 5)
    "train_srcnn",    # SRCNNRes residual super-resolver (MSE, adam_l2)
    "train_gan",      # ResUNetGAN two-player WGAN-GP step (n_critic=1)
    "train_unetres_fused",  # UNETRes residual head fused in-kernel
    "train_unetres",        # UNETRes XLA twin
    "train_varae",    # Pallas MS-SSIM value+grad in the loss
)

#: suite name -> members.  ``all_suite`` (the fallback child) leads with
#: the headline (single-call timing is valid only as the process's first
#: executable), then the apply baselines — historically the stall-lottery
#: victims (skipped 3 rounds running) — then the train metrics.
_SUITE_MEMBERS = {
    "train_suite": _TRAIN_METRICS,
    "apply_suite": _APPLY_SUITE,
    "all_suite": ("apply_fused",) + _APPLY_SUITE + _TRAIN_METRICS,
}

#: metrics in priority order; the first is the headline.  Round-4 shape:
#: THREE children total.  The round-3 artifact skipped 5 apply metrics
#: because each ran in its own fresh process and the per-process tunnel
#: setup is where stalls concentrate (measured: an endemic-stall session
#: stalled EVERY fresh child ~300 s while the train_suite child's 13
#: sequential warm program loads inside one process never stalled).  So
#: the apply baselines now share one ``apply_suite`` child, made safe by
#: scan-dispatch timing (time_jax_apply_scan amortizes the
#: post-second-executable dispatch tax to <2-3%).  Only the headline
#: keeps its dedicated first-executable fresh process: its single-call
#: wall timing is the round-2/3-comparable series.
_METRICS = (
    "apply_fused",   # headline: fused product apply, fresh process
    "apply_suite",   # all apply baselines + fused twins, one child
    "train_suite",   # all train metrics, one child
)
#: slice for the apply_suite child: 6 members × (warm program load 20-60 s
#: + one or two 5-10 s scan dispatches); retries are capped per missing
#: member instead
_APPLY_SUITE_CAP_S = float(os.environ.get("CAE_BENCH_APPLY_SUITE_CAP_S", "420"))
#: per-missing-member retry slice (warm load + measure is 25-70 s)
_RETRY_PER_MEMBER_S = float(os.environ.get("CAE_BENCH_RETRY_PER_MEMBER_S", "130"))
_ALL_KEYS = ("apply_fused", "train_convae_fused", "train_convae",
             "train_convae_fused_bf16",
             "train_unet_fused", "train_unet_fused_bf16", "train_unet",
             "train_unetres_fused", "train_unetres", "train_varae",
             "train_varae_fused",
             "train_convae_bf16", "train_srcnn", "train_srcnn_bf16",
             "train_gan",
             "apply_unet_fused", "apply_unet",
             "apply_xla_high", "apply_bf16", "apply_bf16_weights",
             "apply_fused_scan", "apply_fused_bf16out")


def _build_result(rates, torch_stats, elapsed_s):
    """Full result dict from whatever has been measured so far.

    Every emitted line is a complete, parseable record: headline falls
    back to the best available apply rate; unmeasured metrics are listed
    under "skipped" instead of being absent-but-implied."""
    torch_ips, torch_spread, torch_train_ips, torch_train_spread = torch_stats
    headline = rates.get("apply_fused") or rates.get("apply_xla_high") or 0.0
    result = {
        "metric": "apply_convae_16x16_to_256x256_images_per_sec",
        "value": round(headline, 2),
        "unit": "images/sec",
        "vs_baseline": round(headline / torch_ips, 2) if torch_ips else 0.0,
        "headline_path": ("fused_pallas_tail" if rates.get("apply_fused")
                          else "xla_high" if rates.get("apply_xla_high")
                          else "none"),
        "baseline_torch_cpu_images_per_sec": round(torch_ips, 2),
        "baseline_torch_cpu_spread": round(torch_spread, 3),
        "batch": _BATCH,
        "train_batch": _TRAIN_BATCH,
        "train_unet_batch": _UNET_BATCH,
        "train_varae_batch": _VARAE_BATCH,
        "train_srcnn_batch": _SRCNN_BATCH,
        "train_gan_batch": _GAN_BATCH,
        # apply_unet (pure-XLA baseline) runs at _XLA_BATCH since round 4;
        # only the fused twin keeps the b8192 headline scale
        "apply_unet_batch": _XLA_BATCH,
        "apply_unet_fused_batch": min(8192, _BATCH),
        "apply_xla_batch": _XLA_BATCH,
        "torch_train_batch": _TORCH_TRAIN_BATCH,
        "train_convae_torch_cpu_images_per_sec": round(torch_train_ips, 2),
        "train_convae_torch_cpu_spread": round(torch_train_spread, 3),
        "elapsed_s": round(elapsed_s, 1),
        "skipped": [k for k in _ALL_KEYS if k not in rates],
    }
    names = {
        "apply_xla_high": "xla_high_images_per_sec",
        "apply_bf16": "bf16_fast_path_images_per_sec",
        "apply_bf16_weights": "bf16_weights_fast_path_images_per_sec",
        "train_convae": "train_convae_images_per_sec",
        "train_convae_fused": "train_convae_fused_images_per_sec",
        "train_convae_fused_bf16": "train_convae_fused_bf16_images_per_sec",
        "train_convae_bf16": "train_convae_bf16_images_per_sec",
        "train_unet": "train_unet_images_per_sec",
        "train_unet_fused": "train_unet_fused_images_per_sec",
        "train_unet_fused_bf16": "train_unet_fused_bf16_images_per_sec",
        "train_unetres": "train_unetres_images_per_sec",
        "train_unetres_fused": "train_unetres_fused_images_per_sec",
        "train_varae": "train_varae_images_per_sec",
        "train_varae_fused": "train_varae_fused_images_per_sec",
        "train_srcnn": "train_srcnn_images_per_sec",
        "train_srcnn_bf16": "train_srcnn_bf16_images_per_sec",
        "train_gan": "train_gan_images_per_sec",
        "apply_unet_fused": "apply_unet_fused_images_per_sec",
        "apply_unet": "apply_unet_images_per_sec",
        "apply_fused_scan": "apply_fused_scan_images_per_sec",
        "apply_fused_bf16out": "apply_fused_bf16out_images_per_sec",
    }
    for key, name in names.items():
        if key in rates:
            result[name] = round(rates[key], 2)
    if "train_convae" in rates and torch_train_ips:
        result["train_convae_vs_torch_cpu"] = round(
            rates["train_convae"] / torch_train_ips, 2
        )
    if "train_convae_fused" in rates and torch_train_ips:
        result["train_convae_fused_vs_torch_cpu"] = round(
            rates["train_convae_fused"] / torch_train_ips, 2
        )
    # fused-vs-XLA ratios from same-method (scan-timed) pairs: the
    # headline `value` is single-call wall timing and must NOT be
    # ratioed against the scan-timed baselines
    for name, num, den in (
        ("apply_fused_vs_xla_high", "apply_fused_scan", "apply_xla_high"),
        ("apply_unet_fused_vs_xla", "apply_unet_fused", "apply_unet"),
        ("train_convae_fused_vs_xla", "train_convae_fused", "train_convae"),
        ("train_unet_fused_vs_xla", "train_unet_fused", "train_unet"),
        # the two round-5 A/Bs: bf16 output write vs the f32 floor, and
        # the precision ladder on the FLOP-bound SRCNN step
        ("apply_bf16out_vs_fused", "apply_fused_bf16out", "apply_fused_scan"),
        ("train_srcnn_bf16_vs_high", "train_srcnn_bf16", "train_srcnn"),
        ("train_varae_fused_vs_xla", "train_varae_fused", "train_varae"),
    ):
        if rates.get(num) and rates.get(den):
            result[name] = round(rates[num] / rates[den], 2)
    # roofline columns (VERDICT r4 #3): the artifact itself carries each
    # metric's implied bandwidth/MFU fractions vs the v5e ceilings
    roof = _roofline_rows(rates)
    if roof:
        result["roofline"] = roof
        result["roofline_peaks"] = {
            "hbm_gbps": _V5E_HBM_GBPS,
            "mxu_bf16_tflops": _V5E_BF16_TFLOPS,
            "passes_per_precision": _PREC_PASSES,
        }
    return result


def main():
    only = os.environ.get("CAE_BENCH_ONLY")
    if only:
        print(json.dumps(measure_one(only)), flush=True)
        return

    t0 = time.monotonic()

    def remaining():
        return _BUDGET_S - (time.monotonic() - t0)

    _enable_cache()  # config only; the parent never compiles

    # ---- torch-CPU baselines FIRST: no tunnel involvement, ~1 min ----------
    spec = _spec()
    torch_ips, torch_spread = 0.0, 0.0
    for tb in (32, min(128, _BATCH)):
        torch_model, xb = build_torch_forward(spec, _LATENT, _FC, tb)
        rate, spread = ips_stats(time_torch_forward(torch_model, xb, TORCH_ITERS), tb)
        if rate > torch_ips:
            torch_ips, torch_spread = rate, spread

    import torch as _torch

    torch_train_model, xb = build_torch_forward(
        spec, _LATENT, _FC, _TORCH_TRAIN_BATCH
    )
    yb = _torch.rand((_TORCH_TRAIN_BATCH, 1, 256, 256))
    torch_train_ips, torch_train_spread = ips_stats(
        time_torch_train(torch_train_model, xb, yb, TORCH_ITERS),
        _TORCH_TRAIN_BATCH,
    )
    print(
        f"# bench: torch baselines done in {time.monotonic() - t0:.0f}s "
        f"(apply {torch_ips:.0f} img/s, train {torch_train_ips:.0f} img/s "
        f"@b{_TORCH_TRAIN_BATCH})",
        flush=True,
    )
    torch_stats = (torch_ips, torch_spread, torch_train_ips, torch_train_spread)

    # ---- TPU metrics, headline first, budget-gated, emit-as-you-go ---------
    # Three passes: tunnel stalls are transient (a cache-warm child
    # normally finishes in 15-90 s but occasionally hangs past any cap),
    # so after the priority sweep any still-missing metric gets up to two
    # more chances with whatever budget remains.
    rates = {}
    skip = {
        m for m in os.environ.get("CAE_BENCH_SKIP", "").split(",") if m
    }

    def suite_members(metric):
        if metric == "train_suite":
            return _TRAIN_METRICS
        if metric == "apply_suite":
            return _APPLY_SUITE
        return (metric,)

    # ---- sweep 0: the proven healthy-session shape (headline fresh
    # process, then the two suite children).  A healthy cache-warm
    # session lands everything here in ~400-500 s (BASELINE.md round-4
    # validations).  Endemic-stall detection: setup stalls are
    # per-process AND correlated within a session — if the first two
    # children both produce nothing, skip straight to the fallback loop
    # instead of burning the train_suite's big slice on a third lottery
    # ticket that session statistics say will also stall.
    zero_output_children = 0
    for metric in _METRICS:
        if _metric_done(metric, rates) or metric in skip:
            continue
        if zero_output_children >= 2:
            print("# bench: two setup-stalled children — endemic-stall "
                  "session, skipping to the all_suite fallback",
                  flush=True)
            break
        first_json = None
        if metric == "train_suite":
            # one child, all train metrics scan-timed: most of its slice
            # is per-graph program load; results stream out as lines, so
            # a truncated child still lands its early members.  The
            # first-output watchdog kills a setup-stalled child early
            # (it would otherwise burn the whole slice printing nothing
            # — observed 422 s, round-4 validation).
            cap = max(2 * _HEADLINE_CAP_S, 0.45 * _BUDGET_S)
            first_json = _FIRST_JSON_S
        elif metric == "apply_suite":
            cap = _APPLY_SUITE_CAP_S
            first_json = _FIRST_JSON_S
        else:
            # the headline's single JSON line IS its first output, so
            # the cap doubles as its watchdog
            cap = _HEADLINE_CAP_S
        if remaining() < 120:
            break
        have = [m for m in suite_members(metric) if m in rates]
        t_m = time.monotonic()
        got = _run_subprocess(
            metric, min(cap, max(60.0, remaining() - 20)), have=have,
            first_json_s=first_json,
        )
        rates.update(got)
        if not got:
            zero_output_children += 1
        print(
            f"# bench: {metric} "
            f"{'ok' if _metric_done(metric, rates) else 'MISSING'} "
            f"in {time.monotonic() - t_m:.0f}s "
            f"(sweep 0, {remaining():.0f}s left)",
            flush=True,
        )
        print(json.dumps(_build_result(rates, torch_stats,
                                       time.monotonic() - t0)), flush=True)

    # ---- fallback sweeps (VERDICT r4 #1): fold EVERY unmeasured metric
    # into ONE long-lived all_suite child per sweep, measured
    # sequentially with scan-dispatch timing (the headline single-call
    # runs first when missing).  Budgeted first-class: each child gets
    # all remaining budget (the _FIRST_JSON_S first-output watchdog, not the
    # cap, is what bounds a setup-stalled draw), so an endemic-stall
    # session spends its budget on fresh lottery draws and the first
    # winning draw measures everything that is still missing.
    def all_missing():
        return [k for k in _ALL_KEYS if k not in rates and k not in skip]

    fallback_draw = 0
    while all_missing() and remaining() > 100:
        fallback_draw += 1
        have = [m for m in _SUITE_MEMBERS["all_suite"] if m in rates]
        t_m = time.monotonic()
        got = _run_subprocess(
            "all_suite", max(60.0, remaining() - 20), have=have,
            first_json_s=_FIRST_JSON_S,
            # endemic-stall budget mode: 2 timing dispatches per metric
            # (saves 2-8 s x ~20 metrics; the 2026-08-20 stress sample
            # missed its last 3 members by ~120 s of the 1000 s budget).
            # An explicit user CAE_BENCH_TIMING_CALLS wins.
            extra_env=(
                {}
                if "CAE_BENCH_TIMING_CALLS" in os.environ
                else {"CAE_BENCH_TIMING_CALLS": "2"}
            ),
        )
        rates.update(got)
        print(
            f"# bench: all_suite fallback draw {fallback_draw} landed "
            f"{len(got)} metric(s) in {time.monotonic() - t_m:.0f}s; "
            f"missing: {','.join(all_missing()) or 'none'} "
            f"({remaining():.0f}s left)",
            flush=True,
        )
        print(json.dumps(_build_result(rates, torch_stats,
                                       time.monotonic() - t0)), flush=True)

    # final (possibly identical) line for single-line consumers
    print(json.dumps(_build_result(rates, torch_stats, time.monotonic() - t0)),
          flush=True)


if __name__ == "__main__":
    main()
