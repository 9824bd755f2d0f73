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
    # Bounds-check the strided view against the storage before as_strided:
    # a corrupted/crafted checkpoint could otherwise read process memory
    # past the buffer (this loader advertises safe parsing of untrusted
    # files — the unpickler whitelist alone doesn't cover tensor geometry).
    sizes = tuple(int(s) for s in size)
    strides = tuple(int(s) for s in stride)
    if len(sizes) != len(strides) or any(s < 0 for s in sizes + strides):
        raise ValueError(f'invalid tensor geometry in checkpoint: '
                         f'size={sizes} stride={strides}')
    if 0 in sizes:
        return np.zeros(sizes, dtype=arr.dtype)
    extent = 1 + sum(st * (sz - 1) for st, sz in zip(strides, sizes))
    if extent > arr.size:
        raise ValueError(f'tensor extent {extent} elements exceeds storage '
                         f'of {arr.size} (size={sizes} stride={strides} '
                         f'offset={storage_offset})')
    itemsize = arr.itemsize
    byte_strides = tuple(s * itemsize for s in strides)
    out = np.lib.stride_tricks.as_strided(arr, shape=sizes,
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


# --------------------------------------------------------------------------
# Torch-free writer
# --------------------------------------------------------------------------

class TensorValue:
    """Marks a numpy array to be serialized as a torch *tensor* (vs a plain
    numpy array) when writing a ``.pth`` with :func:`save_pth`."""

    def __init__(self, array):
        self.array = np.ascontiguousarray(np.asarray(array))


_STORAGE_BY_DTYPE = {
    np.dtype(np.float32): 'FloatStorage',
    np.dtype(np.float64): 'DoubleStorage',
    np.dtype(np.float16): 'HalfStorage',
    np.dtype(np.int64): 'LongStorage',
    np.dtype(np.int32): 'IntStorage',
    np.dtype(np.int16): 'ShortStorage',
    np.dtype(np.int8): 'CharStorage',
    np.dtype(np.uint8): 'ByteStorage',
    np.dtype(np.bool_): 'BoolStorage',
}


class _PthPickler(pickle._Pickler):
    """Pickler that emits torch's tensor encoding without importing torch.

    A :class:`TensorValue` is written as
    ``torch._utils._rebuild_tensor_v2(<persistent storage>, 0, size, stride,
    False, OrderedDict())`` — exactly what ``torch.save`` produces — by
    writing the GLOBAL / BINPERSID / REDUCE opcodes directly (the referenced
    classes live in torch, which we do not import, so pickle's own
    ``save_global`` resolution cannot be used).  Subclasses the pure-Python
    pickler: the C implementation's ``save`` is not overridable.
    """

    def __init__(self, file, storages):
        # protocol 2: matches torch.save and keeps GLOBAL opcodes text-based
        super().__init__(file, protocol=2)
        self._storages = storages  # list of (key, bytes) appended in order

    def _write_global(self, module, name):
        self.write(pickle.GLOBAL + module.encode('ascii') + b'\n'
                   + name.encode('ascii') + b'\n')

    def save(self, obj, save_persistent_id=True):
        if isinstance(obj, TensorValue):
            memo_entry = self.memo.get(id(obj))
            if memo_entry is not None:  # same tensor object: share the storage
                self.write(self.get(memo_entry[0]))
            else:
                self._save_tensor(obj)
            return
        super().save(obj, save_persistent_id)

    def _save_tensor(self, t):
        arr = t.array
        storage_name = _STORAGE_BY_DTYPE.get(arr.dtype)
        if storage_name is None:
            raise TypeError(f'unsupported tensor dtype for .pth: {arr.dtype}')
        key = str(len(self._storages))
        self._storages.append((key, arr.tobytes()))
        # torch._utils._rebuild_tensor_v2(storage, 0, size, stride, False,
        #                                 OrderedDict())
        self._write_global('torch._utils', '_rebuild_tensor_v2')
        self.write(pickle.MARK)                       # args tuple opens
        # arg 0: persistent storage ref
        # ('storage', torch.<T>Storage, key, 'cpu', numel) -> BINPERSID
        self.write(pickle.MARK)
        super().save('storage')
        self._write_global('torch', storage_name)
        super().save(key)
        super().save('cpu')
        super().save(int(arr.size))
        self.write(pickle.TUPLE)
        self.write(pickle.BINPERSID)
        # args 1..5
        super().save(0)                               # storage_offset
        super().save(tuple(int(s) for s in arr.shape))
        stride = tuple(int(s) // arr.itemsize for s in arr.strides)
        super().save(stride)
        super().save(False)                           # requires_grad
        super().save(OrderedDict())                   # backward_hooks
        self.write(pickle.TUPLE)                      # args tuple closes
        self.write(pickle.REDUCE)
        self.memoize(t)


def save_pth(path, obj, archive_name='archive'):
    """Write ``obj`` as a torch zip-format ``.pth`` without importing torch.

    Wrap arrays that must load as torch *tensors* in :class:`TensorValue`;
    plain numpy arrays / scalars / containers pickle as themselves (the
    reference stores its loss series as numpy arrays, utils.py:150-153).
    The output is readable by ``torch.load`` and by :func:`load_pth`.
    """
    buf = io.BytesIO()
    storages = []
    _PthPickler(buf, storages).dump(obj)
    with zipfile.ZipFile(path, 'w', compression=zipfile.ZIP_STORED) as zf:
        zf.writestr(f'{archive_name}/data.pkl', buf.getvalue())
        for key, raw in storages:
            zf.writestr(f'{archive_name}/data/{key}', raw)
        zf.writestr(f'{archive_name}/version', '3\n')
        zf.writestr(f'{archive_name}/byteorder', 'little')
    return path


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
