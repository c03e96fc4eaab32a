"""Automatic layer-spec solver.

Produces the per-layer convolution geometry for the encoder/decoder stacks.
The JSON serialisation and the solving algorithm must agree exactly with the
reference implementation (``models/model_sizer.py:16-162``): a saved
``spec.json`` fully determines the network architecture at load time, and
model folders must be interchangeable between the reference and this
framework.

Semantics (derived from the reference's behavior, re-stated):

* Encoder side: starting from the input image size, repeatedly apply a
  VALID-padded strided conv ``size' = (size - k) // s + 1``, doubling the
  channel count each layer, until either the requested layer count is reached
  or the next output would have ``min(h, w) < limit``.  At least one layer is
  always produced.
* Decoder side: built backwards from the target output size.  For each layer
  the kernel is inflated per-axis until a strided transposed conv inverts the
  size exactly, i.e. ``(size - k_eff) % s == 0``; non-square effective
  kernels are recorded as ``(ky, kx)`` tuples.  Channels double walking
  backwards from the output channel count.
"""

from __future__ import annotations


class LayerSpec:
    """Geometry of one conv (encoder) or transposed-conv (decoder) layer.

    JSON field names and meaning match reference ``model_sizer.py:49-67``.
    """

    def __init__(
        self,
        is_input: bool = True,
        kernel_size=3,
        stride: int = 2,
        input_dimensions=None,
        output_dimensions=None,
        output_padding: int = 0,
    ):
        self.is_input = is_input
        self.kernel_size = kernel_size  # int or (ky, kx) tuple
        self.stride = stride
        self.input_dimensions = input_dimensions  # (chan, y, x)
        self.output_dimensions = output_dimensions  # (chan, y, x)
        self.output_padding = output_padding

    # accessors kept for API parity with the reference class
    def get_kernel_size(self):
        return self.kernel_size

    def get_stride(self):
        return self.stride

    def get_input_dimensions(self):
        return self.input_dimensions

    def get_output_dimensions(self):
        return self.output_dimensions

    def get_output_padding(self):
        return self.output_padding

    @property
    def kernel_hw(self):
        """Kernel size normalised to an (ky, kx) tuple."""
        k = self.kernel_size
        return tuple(k) if isinstance(k, (tuple, list)) else (k, k)

    @property
    def output_padding_hw(self):
        p = self.output_padding
        return tuple(p) if isinstance(p, (tuple, list)) else (p, p)

    def save(self) -> dict:
        return {
            "is_input": self.is_input,
            "kernel_size": list(self.kernel_size)
            if isinstance(self.kernel_size, tuple)
            else self.kernel_size,
            "stride": self.stride,
            "output_padding": self.output_padding,
            "input_dimensions": list(self.input_dimensions),
            "output_dimensions": list(self.output_dimensions),
        }

    def load(self, obj: dict) -> "LayerSpec":
        self.is_input = obj["is_input"]
        k = obj["kernel_size"]
        self.kernel_size = tuple(k) if isinstance(k, list) else k
        self.stride = obj["stride"]
        self.output_padding = obj["output_padding"]
        self.input_dimensions = tuple(obj["input_dimensions"])
        self.output_dimensions = tuple(obj["output_dimensions"])
        return self

    def __repr__(self):
        head = (
            "\tInput Convolutional Layer:\n"
            if self.is_input
            else "\tOutput Convolutional Layer:\n"
        )
        s = head
        s += f"\t\tkernel_size={self.kernel_size}  stride={self.stride}\n"
        if self.output_padding:
            s += f"\t\toutput_padding=({self.output_padding})\n"
        s += f"\t\t{self.input_dimensions} => {self.output_dimensions}\n"
        return s


class ModelSpec:
    """Ordered encoder ("input") and decoder ("output") layer specs.

    JSON layout matches reference ``model_sizer.py:82-100``.
    """

    def __init__(self, input_layer_specs=None, output_layer_specs=None):
        self.input_layers = list(input_layer_specs or [])
        self.output_layers = list(output_layer_specs or [])

    def get_input_layers(self):
        return self.input_layers

    def get_output_layers(self):
        return self.output_layers

    def save(self) -> dict:
        return {
            "input_layers": [l.save() for l in self.input_layers],
            "output_layers": [l.save() for l in self.output_layers],
        }

    def load(self, obj: dict) -> "ModelSpec":
        self.input_layers = [LayerSpec().load(o) for o in obj["input_layers"]]
        self.output_layers = [LayerSpec().load(o) for o in obj["output_layers"]]
        return self

    def __repr__(self):
        s = "Input Layers:\n"
        for layer in self.input_layers:
            s += str(layer)
        s += "Output Layers:\n"
        for layer in self.output_layers:
            s += str(layer)
        return s


def _conv_out(size: int, kernel: int, stride: int) -> int:
    """VALID-padded strided conv output length (torch Conv2d padding=0)."""
    return (size - (kernel - 1) - 1) // stride + 1


def create_model_spec(
    input_size=(7, 7),
    input_channels=1,
    output_size=(28, 28),
    output_channels=1,
    stride=2,
    kernel_size=3,
    limit=3,
    input_layer_count=None,
    output_layer_count=None,
) -> ModelSpec:
    """Solve encoder/decoder layer geometry (reference ``model_sizer.py:112-162``)."""

    # ---- encoder stack: shrink the input until `limit` or layer count hit
    input_layers = []
    size_y, size_x = input_size
    channels = input_channels
    while True:
        in_dims = (int(channels), int(size_y), int(size_x))
        next_y = _conv_out(size_y, kernel_size, stride)
        next_x = _conv_out(size_x, kernel_size, stride)
        if input_layers:
            hit_count = (
                input_layer_count is not None
                and len(input_layers) >= input_layer_count
            )
            if hit_count or min(next_x, next_y) < limit:
                break
        channels *= 2
        out_dims = (int(channels), int(next_y), int(next_x))
        input_layers.append(
            LayerSpec(True, kernel_size, stride, in_dims, out_dims)
        )
        size_y, size_x = next_y, next_x

    reduced_y, reduced_x = size_y, size_x

    # ---- decoder stack: built backwards from the output size; per-axis
    # kernel inflation so the strided transposed conv inverts exactly
    output_layers = []
    size_y, size_x = output_size
    channels = output_channels
    while True:
        if output_layers:
            hit_count = (
                output_layer_count is not None
                and len(output_layers) >= output_layer_count
            )
            if hit_count or size_x <= reduced_x or size_y <= reduced_y:
                break

        out_dims = (int(channels), int(size_y), int(size_x))

        k_x = kernel_size
        while (size_x - (k_x - 1) - 1) % stride != 0:
            k_x += 1
        k_y = kernel_size
        while (size_y - (k_y - 1) - 1) % stride != 0:
            k_y += 1
        k_eff = (k_y, k_x) if k_x != k_y else k_x

        prev_y = _conv_out(size_y, k_y, stride)
        prev_x = _conv_out(size_x, k_x, stride)

        channels *= 2
        in_dims = (int(channels), int(prev_y), int(prev_x))
        output_layers.insert(0, LayerSpec(False, k_eff, stride, in_dims, out_dims))
        size_y, size_x = prev_y, prev_x

    return ModelSpec(input_layers, output_layers)
