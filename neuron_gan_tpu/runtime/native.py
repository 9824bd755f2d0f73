"""ctypes bindings for the native preprocessing runtime (preproc.cpp).

The shared library is built on demand (`python -m neuron_gan_tpu.runtime.build`)
and loaded lazily; every entry point has a numpy fallback so the framework is
fully functional without a compiler.
"""

import ctypes
import os

import numpy as np

_LIB = None
_LIB_TRIED = False
_SO_PATH = os.path.join(os.path.dirname(__file__), 'libngpreproc.so')


def _load():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    if not os.path.exists(_SO_PATH):
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
        lib.multi_otsu_hist.restype = ctypes.c_int
        lib.multi_otsu_hist.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_double)]
        lib.noise_stats_u8.restype = ctypes.c_longlong
        lib.noise_stats_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_longlong, ctypes.c_double,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double)]
        _LIB = lib
    except (OSError, AttributeError):
        # AttributeError: a stale .so missing one of the symbols — fall
        # back to numpy rather than crashing dataset preprocessing
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _load() is not None


def multi_otsu_hist(hist, centers, classes=4):
    """Thresholds (classes-1,) from a histogram; native when built."""
    lib = _load()
    hist = np.ascontiguousarray(hist, dtype=np.float64)
    centers = np.ascontiguousarray(centers, dtype=np.float64)
    if lib is not None:
        out = np.empty(classes - 1, dtype=np.float64)
        rc = lib.multi_otsu_hist(
            hist.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            centers.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            len(hist), classes,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        if rc == 0:
            return out
    # numpy fallback: reuse the DP from the dataset module
    from neuron_gan_tpu.data.neuron_dataset import _multiotsu_from_hist
    return _multiotsu_from_hist(hist, centers, classes)


def noise_stats_u8(img_u8, thresh):
    """(mean, std) of pixels 0 < v < thresh of a uint8 image — the
    reference's background-noise statistics (NeuronDataset.py:94-97),
    dispatched from ``NeuronDataset._process_one``.  uint8 only: the
    callers gate on dtype rather than silently value-wrapping wider data
    through a cast."""
    img = np.ascontiguousarray(img_u8)
    assert img.dtype == np.uint8, f'noise_stats_u8 needs uint8, got {img.dtype}'
    lib = _load()
    if lib is not None:
        mean = ctypes.c_double()
        std = ctypes.c_double()
        lib.noise_stats_u8(
            img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), img.size,
            float(thresh), ctypes.byref(mean), ctypes.byref(std))
        return mean.value, std.value
    sel = img[(img > 0) & (img < thresh)]
    if sel.size == 0:
        return 0.0, 0.0
    return float(sel.mean()), float(sel.std())
