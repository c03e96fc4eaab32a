"""Serving: ahead-of-time exported inference bundles.

The reference has no serving story — deployment means shipping the whole
training framework plus torch and re-running ``apply_cae`` (reference
``cli/apply_cae.py:28-92``).  Here a trained model folder can be exported
once into a *serving bundle*: a serialized ``jax.export`` artifact of the
full raw-input -> denormalised-output graph (input normalisation + forward
+ output denormalisation + NCHW layout, all fused on device) plus the
weights and a JSON manifest.  Loading a bundle needs only jax + numpy —
none of the model classes, torch interop, or netCDF machinery.
"""

from .bundle import ServingModel, load_bundle  # noqa: F401
from .export import build_serving_fn, export_bundle, export_model  # noqa: F401
