"""cae_tools_tpu — a TPU-native (JAX/XLA/Pallas) framework for image->image
transformation of Earth-observation data, with the capabilities of the
reference `surftemp/cae_tools` library (see SURVEY.md).

Capabilities: convolutional / variational / UNet autoencoders and a linear
baseline mapping a low-res (N, channel, y, x) field to a high-res one,
trained with pjit-compiled epoch loops over a `jax.sharding.Mesh`,
applied to netCDF datasets, evaluated into HTML reports, and tracked in a
sqlite model database.  Parity surface: reference `src/cae_tools/__init__.py:1`.
"""

VERSION = "0.1.0"
__version__ = VERSION
