"""Select the dataset backend: real xarray when installed, else xrlite.

All framework modules import ``xr`` from here rather than importing xarray
directly, so the framework runs identically in environments with and without
the xarray/netCDF4 stack.
"""

try:  # pragma: no cover - depends on environment
    import xarray as xr

    HAVE_XARRAY = True
except ModuleNotFoundError:  # pragma: no cover
    from .data import xrlite as xr

    HAVE_XARRAY = False

__all__ = ["xr", "HAVE_XARRAY"]
