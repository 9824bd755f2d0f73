"""Torch-free reader for PyTorch ``.pth`` checkpoint files.

The reference saves training state with ``torch.save`` (utils.py:170): a zip
archive containing ``<name>/data.pkl`` (a pickle of the checkpoint dict whose
tensors are rebuilt from "persistent" storage references) and raw
little-endian storage payloads under ``<name>/data/<key>``.  This module
parses that format with zipfile + a whitelisted Unpickler — no torch import —
so the TPU framework can ingest ``gen_dis_default.pth`` (and any training
checkpoint) standalone.

Safety: ``find_class`` only admits the classes torch checkpoints of this
shape actually contain (tensor rebuild helpers, storage type tags,
OrderedDict, numpy array reconstruction).  Anything else raises.
"""

import io
import pickle
import zipfile
from collections import OrderedDict

import numpy as np

_DTYPES = {
    'FloatStorage': np.float32,
    'DoubleStorage': np.float64,
    'HalfStorage': np.float16,
    'LongStorage': np.int64,
    'IntStorage': np.int32,
    'ShortStorage': np.int16,
    'CharStorage': np.int8,
    'ByteStorage': np.uint8,
    'BoolStorage': np.bool_,
    'BFloat16Storage': None,  # handled specially below
}


class _StorageRef:
    """Marker produced by persistent_load: a typed view into the zip payload."""

    def __init__(self, dtype_name, key, numel):
        self.dtype_name = dtype_name
        self.key = key
        self.numel = numel


class _StorageTag:
    """Stand-in for torch.FloatStorage etc. encountered as pickle globals."""

    def __init__(self, name):
        self.name = name


class _TorchDtypeTag:
    """Stand-in for torch.dtype objects (e.g. torch.float32) in newer pickles."""

    def __init__(self, name):
        self.name = name


def _bf16_to_f32(raw: bytes) -> np.ndarray:
    u16 = np.frombuffer(raw, dtype=np.uint16)
    u32 = u16.astype(np.uint32) << 16
    return u32.view(np.float32)


def _rebuild_tensor_v2(storage, storage_offset, size, stride, requires_grad,
                       backward_hooks, metadata=None):
    arr = storage['array']
    if storage_offset:
        arr = arr[storage_offset:]
    itemsize = arr.itemsize
    byte_strides = tuple(s * itemsize for s in stride)
    out = np.lib.stride_tricks.as_strided(arr, shape=tuple(size),
                                          strides=byte_strides)
    return np.array(out)  # own the memory


def _rebuild_parameter(tensor, requires_grad, backward_hooks):
    return tensor


class _Unpickler(pickle.Unpickler):
    def __init__(self, file, read_storage):
        super().__init__(file)
        self._read_storage = read_storage

    def persistent_load(self, pid):
        kind = pid[0]
        if kind != 'storage':
            raise pickle.UnpicklingError(f'unsupported persistent id: {pid!r}')
        tag, key, _location, numel = pid[1], pid[2], pid[3], pid[4]
        if isinstance(tag, _StorageTag):
            name = tag.name
        elif isinstance(tag, _TorchDtypeTag):
            name = tag.name
        else:
            raise pickle.UnpicklingError(f'unsupported storage tag: {tag!r}')
        raw = self._read_storage(key)
        if name in ('BFloat16Storage', 'bfloat16'):
            arr = _bf16_to_f32(raw)
        else:
            short = {'float32': 'FloatStorage', 'float64': 'DoubleStorage',
                     'float16': 'HalfStorage', 'int64': 'LongStorage',
                     'int32': 'IntStorage', 'int16': 'ShortStorage',
                     'int8': 'CharStorage', 'uint8': 'ByteStorage',
                     'bool': 'BoolStorage'}.get(name, name)
            np_dtype = _DTYPES.get(short)
            if np_dtype is None:
                raise pickle.UnpicklingError(f'unsupported storage dtype: {name}')
            arr = np.frombuffer(raw, dtype=np_dtype)
        return {'array': arr, 'numel': numel}

    def find_class(self, module, name):
        if module == 'torch._utils' and name == '_rebuild_tensor_v2':
            return _rebuild_tensor_v2
        if module == 'torch._utils' and name == '_rebuild_parameter':
            return _rebuild_parameter
        if module == 'collections' and name == 'OrderedDict':
            return OrderedDict
        if module == 'torch' and name.endswith('Storage'):
            return _StorageTag(name)
        if module == 'torch' and name in ('float32', 'float64', 'float16',
                                          'int64', 'int32', 'bfloat16'):
            return _TorchDtypeTag(name)
        if module == 'torch.storage' and name == 'TypedStorage':
            return _StorageTag  # not instantiated in practice
        # numpy arrays (the reference stores loss series as numpy,
        # utils.py:150-153)
        if module == 'numpy.core.multiarray' and name == '_reconstruct':
            return np.core.multiarray._reconstruct  # type: ignore[attr-defined]
        if module == 'numpy._core.multiarray' and name == '_reconstruct':
            import numpy._core.multiarray as m
            return m._reconstruct
        if module in ('numpy', 'numpy.core.numeric') and name == 'ndarray':
            return np.ndarray
        if module == 'numpy' and name == 'dtype':
            return np.dtype
        if module == '_codecs' and name == 'encode':
            # used by numpy's __reduce__ to carry raw bytes
            import _codecs
            return _codecs.encode
        if module in ('builtins', '__builtin__') and name in ('bytes', 'bytearray'):
            import builtins
            return getattr(builtins, name)
        raise pickle.UnpicklingError(
            f'blocked unpickle of {module}.{name} (whitelist)')


def load_pth(path):
    """Load a torch zip-format ``.pth`` into plain Python + numpy objects.

    Scalars saved as 0-d tensors come back as 0-d numpy arrays.
    """
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_names = [n for n in names if n.endswith('/data.pkl') or n == 'data.pkl']
        if not pkl_names:
            raise ValueError(
                f'{path} is not a torch zip checkpoint (no data.pkl); '
                'legacy tar-format .pth files are not supported')
        pkl_name = pkl_names[0]
        prefix = pkl_name[: -len('data.pkl')]

        def read_storage(key):
            return zf.read(f'{prefix}data/{key}')

        with zf.open(pkl_name) as f:
            data = f.read()
        return _Unpickler(io.BytesIO(data), read_storage).load()
