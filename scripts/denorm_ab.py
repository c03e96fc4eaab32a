"""A/B the product-apply denorm placement on the real TPU.

Usage (each variant in its OWN fresh process — BASELINE.md "measurement
isolation" hazard 2: the first executable of a process is the only
dispatch-tax-free one):

    python scripts/denorm_ab.py kernel   # denorm folded into the Pallas tail
    python scripts/denorm_ab.py xla      # fused tail, denorm affine in XLA
    python scripts/denorm_ab.py serve    # exported bundle predict (parity + rate)

Times the full product apply graph (lax.map over chunks of the fused
forward + denorm + NCHW), batch 512 x 16 chunks (8192 images/dispatch),
median of 5 dispatches, ending with a scalar device read.
"""

import os
import sys
import time

import numpy as np

CHUNK = int(os.environ.get("AB_CHUNK", "512"))
CHUNKS = int(os.environ.get("AB_CHUNKS", "16"))
CALLS = int(os.environ.get("AB_CALLS", "5"))


def build_model():
    from cae_tools_tpu.models.conv_ae_model import ConvAEModel
    from cae_tools_tpu.models.sizer import create_model_spec
    from cae_tools_tpu.nn import modules as M

    spec = create_model_spec(
        input_size=(16, 16), input_channels=1,
        output_size=(256, 256), output_channels=1,
    )
    mt = ConvAEModel.__new__(ConvAEModel)
    import jax

    mt.input_shape = (1, 16, 16)
    mt.output_shape = (1, 256, 256)
    mt.encoded_dim_size, mt.fc_size = 32, 128
    mt.batch_size = CHUNK
    mt.apply_chunk_size = CHUNK
    mt.mesh = None
    mt._apply_cache = {}
    mt.encoder = M.ConvEncoder(spec.input_layers, 32, 128)
    mt.decoder = M.ConvDecoder(spec.output_layers, 32, 128)
    ep, es = mt.encoder.init(jax.random.PRNGKey(0))
    dp, ds = mt.decoder.init(jax.random.PRNGKey(1))
    mt.params = {"encoder": ep, "decoder": dp}
    mt.state = {"encoder": es, "decoder": ds}
    return mt


def timed_predict(mt, lo=271.0, hi=296.0):
    import jax

    x = np.random.default_rng(0).random(
        (CHUNK * CHUNKS, 16, 16, 1), np.float32
    )
    out = mt._predict_denorm_nchw(x, lo, hi)  # compile + warm
    assert out.shape == (CHUNK * CHUNKS, 1, 256, 256)
    times = []
    for _ in range(CALLS):
        t0 = time.perf_counter()
        out = mt._predict_denorm_nchw(x, lo, hi)
        _ = float(out.ravel()[0])  # scalar host read = real completion
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    n = CHUNK * CHUNKS
    print(
        f"# {n} imgs/dispatch, median {med*1e3:.1f} ms over {CALLS} calls "
        f"-> {n/med:,.0f} img/s (min {n/max(times):,.0f}, "
        f"max {n/min(times):,.0f})"
    )
    return out


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "kernel"
    # import the package FIRST: its __init__ restores a JAX_PLATFORMS env
    # request that the host sitecustomize overrides (CLAUDE.md gotcha);
    # touching the backend before that pins it to the TPU tunnel
    from cae_tools_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax

    print(f"# mode={mode} backend={jax.default_backend()}")
    mt = build_model()

    if mode == "kernel":
        assert mt._use_fused_decoder()
        timed_predict(mt)
    elif mode == "xla":
        # fused tail forward, but the denorm affine + NCHW hop in XLA
        # (the pre-round-3 product path): bypass the model's override
        from cae_tools_tpu.models.base import BaseModel

        mt._forward_denorm_nchw_p = (
            lambda p, s, x, lo, rng: BaseModel._forward_denorm_nchw_p(
                mt, p, s, x, lo, rng
            )
        )
        assert mt._use_fused_decoder()
        timed_predict(mt)
    elif mode == "serve":
        import tempfile

        from cae_tools_tpu.serve import export_model, load_bundle

        mt.normalisation_parameters = [
            {"lowres": 270.0}, {"lowres": 300.0}, 271.0, 296.0,
        ]
        mt.normalise_input = True
        mt.normalise_output = True
        mt.input_spec = [{"name": "lowres", "shape": [1, 16, 16]}]
        mt.output_spec = {"name": "hires", "shape": [1, 256, 256]}
        with tempfile.TemporaryDirectory() as td:
            export_model(mt, td + "/bundle", batch_size=CHUNK)
            sm = load_bundle(td + "/bundle")
            raw = 270.0 + np.random.default_rng(1).random(
                (CHUNK * 4, 16, 16, 1)
            ).astype(np.float32) * 30.0
            out = sm.predict(raw)  # warm
            # parity vs the product apply on the same normalised input
            norm = (raw - 270.0) / 30.0
            ref = mt._predict_denorm_nchw(norm, 271.0, 296.0)
            err = float(np.abs(out - ref).max())
            times = []
            for _ in range(CALLS):
                t0 = time.perf_counter()
                out = sm.predict(raw)
                times.append(time.perf_counter() - t0)
            med = sorted(times)[len(times) // 2]
            n = raw.shape[0]
            print(
                f"# serve: {n} imgs ({n//CHUNK} dispatches), median "
                f"{med*1e3:.1f} ms -> {n/med:,.0f} img/s; "
                f"parity vs product apply max|err|={err:.2e}"
            )
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
