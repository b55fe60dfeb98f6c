"""Minimal netCDF4-compatible shim backed by scipy.io.netcdf_file.

The reference framework hard-requires the netCDF4 package (HDF5-backed)
for Exodus IO; this image ships only scipy's pure-Python NetCDF3
reader/writer. The reference's mesh fixtures are CDF-2 (NetCDF3 64-bit
offset) and its writer uses only NetCDF3-compatible features
(dimensions, f8/i4/S1 variables, attributes, one unlimited time
dimension), so a thin adapter suffices to run it unmodified:

    import benchmarks.netcdf4_shim as shim
    sys.modules["netCDF4"] = shim

Only the API surface the reference's cmad/io/exodus.py touches is
implemented.
"""
from __future__ import annotations

import numpy as np
from scipy.io import netcdf_file

_TYPECODES = {
    "f8": "d", "f4": "f", "i4": "i", "i8": "i", "S1": "c", "c": "c",
}


def _nc3_attr(value):
    """NetCDF3 has no 64-bit ints: coerce int attrs to int32."""
    if isinstance(value, (int, np.integer)) and not isinstance(value, bool):
        return np.int32(value)
    return value


class Variable:
    def __init__(self, var):
        object.__setattr__(self, "_var", var)

    def __getitem__(self, key):
        out = self._var[key]
        return np.asarray(out)

    def __setitem__(self, key, value):
        self._var[key] = value

    def getncattr(self, name):
        return getattr(self._var, name)

    def setncattr(self, name, value):
        setattr(self._var, name, _nc3_attr(value))

    def __setattr__(self, name, value):
        setattr(self._var, name, _nc3_attr(value))

    def __getattr__(self, name):
        return getattr(self._var, name)

    def set_auto_mask(self, flag):  # netCDF4 API; scipy never masks
        pass


class _Dim:
    """len()-able dimension record (netCDF4.Dimension look-alike)."""

    def __init__(self, ds, name):
        self._ds, self._name = ds, name

    def __len__(self):
        size = self._ds._f.dimensions[self._name]
        if size is None:  # unlimited: current record count
            for var in self._ds._f.variables.values():
                if var.dimensions and var.dimensions[0] == self._name:
                    return int(var.data.shape[0])
            return 0
        return int(size)

    def isunlimited(self):
        return self._ds._f.dimensions[self._name] is None


class _DimMap:
    def __init__(self, ds):
        self._ds = ds

    def __contains__(self, name):
        return name in self._ds._f.dimensions

    def __getitem__(self, name):
        if name not in self._ds._f.dimensions:
            raise KeyError(name)
        return _Dim(self._ds, name)

    def keys(self):
        return self._ds._f.dimensions.keys()


class _VarMap:
    def __init__(self, ds):
        self._ds = ds

    def __contains__(self, name):
        return name in self._ds._f.variables

    def __getitem__(self, name):
        return Variable(self._ds._f.variables[name])

    def keys(self):
        return self._ds._f.variables.keys()

    def items(self):
        return ((k, Variable(v)) for k, v in self._ds._f.variables.items())


class Dataset:
    def __init__(self, path, mode="r", format=None):  # noqa: A002
        # scipy writes CDF-2; any requested HDF5 "format" degrades to it
        object.__setattr__(self, "_f", netcdf_file(
            path, mode="w" if mode == "w" else "r",
            mmap=False, version=2))
        object.__setattr__(self, "dimensions", _DimMap(self))
        object.__setattr__(self, "variables", _VarMap(self))

    def __getitem__(self, name):
        return Variable(self._f.variables[name])

    def createDimension(self, name, size):
        if size is None and self._f._dims:
            # scipy insists the record dim be created first, but the
            # NetCDF3 format itself does not care where it sits in the
            # dim list — register it directly
            self._f.dimensions[name] = None
            self._f._dims.append(name)
            return
        self._f.createDimension(name, size)

    def createVariable(self, name, datatype, dimensions=()):
        tc = _TYPECODES.get(str(datatype), str(datatype))
        return Variable(self._f.createVariable(name, tc, tuple(dimensions)))

    def setncattr(self, name, value):
        setattr(self._f, name, _nc3_attr(value))

    def getncattr(self, name):
        return getattr(self._f, name)

    def __setattr__(self, name, value):
        setattr(self._f, name, _nc3_attr(value))

    def sync(self):
        self._f.sync()

    def close(self):
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


def stringtochar(arr):
    return np.asarray(arr, dtype="S1")


def chartostring(arr):
    return np.asarray(arr)
