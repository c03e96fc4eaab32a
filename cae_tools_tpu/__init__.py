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

# Honor an explicit JAX_PLATFORMS environment request.  Some environments
# (e.g. this image's sitecustomize TPU hook) force-register a platform and
# pin jax's config regardless of the user's env var; restore user intent
# here, before the first backend initialisation.
import os as _os

_requested = _os.environ.get("JAX_PLATFORMS")
if _requested:
    try:
        import jax as _jax

        if (_jax.config.jax_platforms or "") != _requested:
            _jax.config.update("jax_platforms", _requested)
    except Exception:  # pragma: no cover - backend already initialised
        pass
del _os, _requested
