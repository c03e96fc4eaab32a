"""Layer-spec solver golden tests.

The solver defines ``spec.json`` — its geometry must match the reference
(``model_sizer.py:112-162``) exactly.  Golden values here are hand-computed
from the conv arithmetic and cross-checked against torch's own shape rules.
"""

import json

import numpy as np
import pytest
import torch

from cae_tools_tpu.models.sizer import LayerSpec, ModelSpec, create_model_spec


def torch_chain_shapes(spec):
    """Run zeros through torch Conv2d/ConvTranspose2d built from a spec."""
    x = torch.zeros((1,) + tuple(spec.input_layers[0].input_dimensions))
    for layer in spec.input_layers:
        conv = torch.nn.Conv2d(
            layer.input_dimensions[0],
            layer.output_dimensions[0],
            kernel_size=layer.kernel_size,
            stride=layer.stride,
        )
        x = conv(x)
        assert tuple(x.shape[1:]) == tuple(layer.output_dimensions), (
            layer,
            x.shape,
        )
    y = torch.zeros((1,) + tuple(spec.output_layers[0].input_dimensions))
    for layer in spec.output_layers:
        conv = torch.nn.ConvTranspose2d(
            layer.input_dimensions[0],
            layer.output_dimensions[0],
            kernel_size=layer.kernel_size,
            stride=layer.stride,
            output_padding=layer.output_padding,
        )
        y = conv(y)
        assert tuple(y.shape[1:]) == tuple(layer.output_dimensions), (
            layer,
            y.shape,
        )


def test_circle_16_to_256_geometry():
    spec = create_model_spec(
        input_size=(16, 16), input_channels=1, output_size=(256, 256),
        output_channels=1, stride=2, kernel_size=3,
    )
    enc = [(l.input_dimensions, l.output_dimensions) for l in spec.input_layers]
    # 16 -> 7 -> 3 (next would be 1 < limit 3)
    assert enc == [((1, 16, 16), (2, 7, 7)), ((2, 7, 7), (4, 3, 3))]
    # decoder built backwards from 256: kernel inflated so (256-k)%2==0 -> k=4
    dec_out = [l.output_dimensions for l in spec.output_layers]
    assert dec_out[-1] == (1, 256, 256)
    # channel doubling walking backwards
    chans = [l.input_dimensions[0] for l in spec.output_layers]
    assert chans == sorted(chans, reverse=True)
    torch_chain_shapes(spec)


def test_nonsquare_geometry_circle2():
    spec = create_model_spec(
        input_size=(24, 20), input_channels=1, output_size=(280, 256),
        output_channels=1, stride=2, kernel_size=3,
    )
    assert spec.output_layers[-1].output_dimensions == (1, 280, 256)
    # non-square effective kernels recorded as (ky, kx) tuples when needed
    torch_chain_shapes(spec)


def test_layer_counts_respected():
    spec = create_model_spec(
        input_size=(64, 64), input_channels=3, output_size=(256, 256),
        output_channels=1, stride=2, kernel_size=3,
        input_layer_count=2, output_layer_count=3,
    )
    assert len(spec.input_layers) == 2
    assert len(spec.output_layers) == 3
    torch_chain_shapes(spec)


def test_tidal_6_to_256_geometry():
    spec = create_model_spec(
        input_size=(6, 6), input_channels=2, output_size=(256, 256),
        output_channels=1, stride=2, kernel_size=3,
    )
    assert spec.input_layers[0].input_dimensions == (2, 6, 6)
    assert spec.output_layers[-1].output_dimensions == (1, 256, 256)
    torch_chain_shapes(spec)


def test_json_roundtrip_format():
    spec = create_model_spec(
        input_size=(16, 16), input_channels=1, output_size=(256, 256),
        output_channels=1,
    )
    blob = json.dumps(spec.save())
    spec2 = ModelSpec()
    spec2.load(json.loads(blob))
    assert spec2.save() == spec.save()
    # field names are the reference checkpoint contract
    entry = spec.save()["input_layers"][0]
    assert set(entry.keys()) == {
        "is_input",
        "kernel_size",
        "stride",
        "output_padding",
        "input_dimensions",
        "output_dimensions",
    }


def _load_reference_sizer():
    """Import the actual reference solver module (pure python, no deps)."""
    import importlib.util
    import os

    path = "/root/reference/src/cae_tools/models/model_sizer.py"
    if not os.path.exists(path):
        pytest.skip("reference snapshot not mounted")
    spec = importlib.util.spec_from_file_location("ref_model_sizer", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_spec_json_golden_vs_reference_solver():
    """Byte-for-byte ``spec.json`` equality against the reference solver
    run directly from the snapshot, across a fuzzed geometry grid
    (``model_sizer.py:112-162`` is the spec.json interop contract)."""
    ref = _load_reference_sizer()
    rng = np.random.default_rng(2024)
    cases = [
        # the four shipped data-spec geometries
        dict(input_size=(16, 16), output_size=(256, 256)),
        dict(input_size=(6, 6), input_channels=2, output_size=(256, 256)),
        dict(input_size=(24, 20), output_size=(280, 256)),
        dict(input_size=(16, 16), output_size=(256, 256), kernel_size=5),
    ]
    for _ in range(40):  # fuzz
        cases.append(dict(
            input_size=(int(rng.integers(6, 48)), int(rng.integers(6, 48))),
            input_channels=int(rng.integers(1, 5)),
            output_size=(int(rng.integers(32, 300)), int(rng.integers(32, 300))),
            output_channels=int(rng.integers(1, 3)),
            stride=int(rng.integers(1, 4)),
            kernel_size=int(rng.integers(2, 6)),
            input_layer_count=int(rng.integers(1, 4)) if rng.random() < 0.5 else None,
            output_layer_count=int(rng.integers(1, 5)) if rng.random() < 0.5 else None,
        ))
    for kw in cases:
        ours = json.dumps(create_model_spec(**kw).save())
        theirs = json.dumps(ref.create_model_spec(**kw).save())
        assert ours == theirs, kw


def test_spec_json_file_golden_vs_reference(tmp_path):
    """The spec.json our ConvAE writes is byte-identical to the file the
    reference solver's save() would produce for the same geometry."""
    ref = _load_reference_sizer()
    ours = create_model_spec(
        input_size=(16, 16), input_channels=1,
        output_size=(256, 256), output_channels=1,
    )
    ref_spec = ref.create_model_spec(
        input_size=(16, 16), input_channels=1,
        output_size=(256, 256), output_channels=1,
    )
    p_ours = tmp_path / "ours.json"
    p_ref = tmp_path / "ref.json"
    p_ours.write_text(json.dumps(ours.save()))
    p_ref.write_text(json.dumps(ref_spec.save()))
    assert p_ours.read_bytes() == p_ref.read_bytes()
    # and the reference loader round-trips our file
    loaded = ref.ModelSpec()
    loaded.load(json.loads(p_ours.read_text()))
    assert json.dumps(loaded.save()) == p_ours.read_text()


def test_nonsquare_kernel_saved_as_list():
    ls = LayerSpec(False, (5, 4), 2, (2, 10, 10), (1, 23, 22), 0)
    saved = ls.save()
    assert saved["kernel_size"] == [5, 4]
    ls2 = LayerSpec()
    ls2.load(saved)
    assert ls2.kernel_size == (5, 4)
    assert ls2.kernel_hw == (5, 4)
