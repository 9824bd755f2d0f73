"""Host-side dataset loading (one-time), TPU-resident thereafter.

Reference pipeline (data/NeuronDataset.py:45-167): per image —
  1. decode with PIL;
  2. 4-class multi-Otsu threshold on the raw array; noise pixels are
     ``0 < v < thresh[0]``; record their mean/std (:92-97);
  3. pad by ``image_size // 4`` with zeros (:70-71, :101);
  4. replace zero pixels with Gaussian noise drawn from that image's
     background statistics (:13-20, :104);
  5. convert to float in [0, 1] (ToTensor).

The reference then keeps preloaded tensors in RAM and (in its 'device' mode)
moves them all to the accelerator once (:183-184).  Here the processed stack
is produced once on the host as a single (N, P, P, 1) float32 array and
handed to JAX — it lives in HBM for the whole run; all per-step augmentation
is jitted (see data/augment.py).

``threshold_multiotsu`` is a dependency-free port of
skimage.filters.threshold_multiotsu (the reference's only skimage use,
NeuronDataset.py:8, :93): maximize between-class variance over bin
partitions via dynamic programming on cumulative histogram moments.
"""

import os

import numpy as np


def threshold_multiotsu(image: np.ndarray, classes: int = 4, nbins: int = 256):
    """Multi-Otsu thresholds (classes-1 values), histogram-DP formulation.

    Maximizes sum over classes of w_k * mu_k^2 (equivalently between-class
    variance) where bins partition into ``classes`` contiguous groups.
    Dispatches to the native C++ runtime when built.
    """
    vals = image.ravel()
    vmin, vmax = vals.min(), vals.max()
    if vmin == vmax:
        return np.full(classes - 1, vmin, dtype=np.float64)

    if np.issubdtype(image.dtype, np.integer) and (int(vmax) - int(vmin)) < nbins:
        # integer data with small range: one bin per integer value
        centers = np.arange(int(vmin), int(vmax) + 1, dtype=np.float64)
        hist = np.bincount((vals.astype(np.int64) - int(vmin)),
                           minlength=centers.size).astype(np.float64)
    else:
        hist, edges = np.histogram(vals, bins=nbins, range=(vmin, vmax))
        hist = hist.astype(np.float64)
        centers = (edges[:-1] + edges[1:]) / 2.0

    from neuron_gan_tpu.runtime import native, native_available
    if native_available():
        return native.multi_otsu_hist(hist, centers, classes)
    return _multiotsu_from_hist(hist, centers, classes)


def _multiotsu_from_hist(hist, centers, classes):
    """numpy DP over a prepared histogram (shared with the native fallback)."""
    n = centers.size
    p = hist / hist.sum()
    # cumulative moments: P[i..j] and S[i..j] via prefix sums
    cp = np.concatenate([[0.0], np.cumsum(p)])
    cs = np.concatenate([[0.0], np.cumsum(p * centers)])

    def seg_score(i, j):
        """w * mu^2 of bins [i, j] inclusive; -inf for empty weight."""
        w = cp[j + 1] - cp[i]
        s = cs[j + 1] - cs[i]
        with np.errstate(divide='ignore', invalid='ignore'):
            val = np.where(w > 0, (s * s) / np.where(w > 0, w, 1.0), 0.0)
        return val

    # score[i, j] for all segments (n x n upper-triangular)
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing='ij')
    score = seg_score(ii, jj)

    # DP over number of segments: f[k][j] = best score of splitting bins
    # [0..j] into k+1 segments; arg tracks the split point.
    k_classes = classes
    f = np.full((k_classes, n), -np.inf)
    arg = np.zeros((k_classes, n), dtype=np.int64)
    f[0] = score[0]
    # score_next[i, j] = score of segment [i+1 .. j]
    score_next = np.vstack([score[1:], np.full((1, n), -np.inf)])
    lower = np.arange(n)[:, None] >= np.arange(n)[None, :]  # i >= j invalid
    for k in range(1, k_classes):
        # f[k][j] = max_{i<j} f[k-1][i] + score[i+1, j]
        cmat = f[k - 1][:, None] + score_next
        cmat[lower] = -np.inf
        arg[k] = np.argmax(cmat, axis=0)
        f[k] = cmat[arg[k], np.arange(n)]

    # Backtrack split points
    thresholds = []
    j = n - 1
    for k in range(k_classes - 1, 0, -1):
        i = int(arg[k][j])
        thresholds.append(centers[i])
        j = i
    thresholds = np.array(thresholds[::-1], dtype=np.float64)
    return thresholds


def replace_zero_with_noise(arr: np.ndarray, noise_mean, noise_std, rng):
    """Fill zero pixels with N(mean, std) noise (reference NeuronDataset.py:13-20).

    Like the reference (which writes noise back into the integer PIL image),
    noise is cast to the array dtype before insertion.
    """
    out = arr.copy()
    is_zero = out == 0
    noise = noise_std * rng.standard_normal(out.shape) + noise_mean
    out[is_zero] = noise[is_zero].astype(out.dtype)
    return out


def _to_unit_float(arr: np.ndarray) -> np.ndarray:
    """ToTensor scaling: uint8 -> /255, uint16 -> /65535, float passthrough."""
    if arr.dtype == np.uint8:
        return arr.astype(np.float32) / 255.0
    if arr.dtype == np.uint16:
        return arr.astype(np.float32) / 65535.0
    if np.issubdtype(arr.dtype, np.integer):
        return arr.astype(np.float32) / float(np.iinfo(arr.dtype).max)
    return arr.astype(np.float32)


class NeuronDataset:
    """Loads every image in a directory into one padded, noise-filled stack.

    Attributes mirror the reference where meaningful: ``image_size`` is the
    current output resolution (progressive growth calls ``set_image_size``,
    reference NeuronDataset.py:149-164 — here it just records the target; the
    actual resize happens inside the jitted augmentation).

    Large datasets: when the processed float32 stack would exceed
    ``preload_limit_mb`` (the reference preloads only below 100 MB,
    NeuronDataset.py:74-82, and otherwise re-reads per item from disk), the
    stack is materialized once into an on-disk ``.npy`` cache and opened as a
    read-only memmap — host RAM stays bounded during the build and training
    reads pages on demand.  The cache is keyed on the file list, mtimes and
    pad, so it survives across runs and rebuilds when the directory changes.

    Images of unequal sizes are accepted: each is zero-padded (after the
    reference's ``image_size // 4`` border) up to the largest square frame,
    and the per-image background-noise fill then covers the extra border.
    """

    def __init__(self, directory: str, image_size: int = 512,
                 augmentations: bool = True, im_translation: float = 0.0,
                 seed: int = 0, preload_limit_mb: float = 100.0):
        if not os.path.exists(directory):
            raise ValueError('The dataset path {} does not exist.'.format(directory))
        self.dir = directory
        self.image_size = image_size
        self.image_size_max = image_size
        self.augmentations = augmentations
        self.im_translation = im_translation
        self.seed = seed
        # noise-stats backend, decided once per dataset build (part of the
        # cache key; per-image non-uint8 frames still take the numpy path)
        from neuron_gan_tpu.runtime import native_available
        self._stats_impl = 'native' if native_available() else 'numpy'

        self.filenames = sorted(
            os.path.join(directory, f) for f in os.listdir(directory)
            if not f.startswith('.')
            and os.path.isfile(os.path.join(directory, f)))
        if not self.filenames:
            raise ValueError(f'No images found in {directory}')

        pad = image_size // 4
        n = len(self.filenames)

        # Cheap header-only probe of every frame (PIL reads lazily).
        from PIL import Image
        sizes = []
        for filename in self.filenames:
            with Image.open(filename) as img:
                w, h = img.size
            sizes.append((h, w))
        frame = max(max(h, w) for h, w in sizes) + 2 * pad
        self.padded_size = frame

        self.images_noise_mean = np.empty(n)
        self.images_noise_std = np.empty(n)

        est_bytes = n * frame * frame * 4
        self.preloaded = est_bytes <= preload_limit_mb * 2 ** 20
        if self.preloaded:
            self.images = np.empty((n, frame, frame, 1), np.float32)
            self._fill_stack(self.images, frame)
        else:
            try:
                self.images = self._open_or_build_cache(frame)
            except OSError as exc:
                # read-only dataset mounts can't host the memmap cache —
                # fall back to the in-RAM path rather than failing
                print(f'dataset cache unavailable ({exc}); '
                      'loading the full stack into RAM instead')
                self.preloaded = True
                self.images = np.empty((n, frame, frame, 1), np.float32)
                self._fill_stack(self.images, frame)

    # ------------------------------------------------------------- processing
    def _process_one(self, index: int, frame: int) -> np.ndarray:
        """One image: decode, Otsu noise stats, pad, noise-fill, to [0,1]."""
        from PIL import Image
        with Image.open(self.filenames[index]) as img:
            arr = np.array(img)
        if arr.ndim == 3:  # collapse to single channel like the 1-color config
            arr = arr[..., 0]
        thresh = threshold_multiotsu(arr, classes=4)
        if self._stats_impl == 'native' and arr.dtype == np.uint8:
            # one C pass instead of mask + fancy-index + two reductions;
            # the mean is bit-identical to numpy's (exact integer sums in
            # double), the std differs ~1e-15 in final rounding — which is
            # why _cache_key records the backend (runtime/preproc.cpp)
            from neuron_gan_tpu.runtime import noise_stats_u8
            mean, std = noise_stats_u8(arr, float(thresh[0]))
            self.images_noise_mean[index] = mean
            self.images_noise_std[index] = std
        else:
            is_noise = np.logical_and(arr > 0, arr < thresh[0])
            noise_vals = arr[is_noise]
            self.images_noise_mean[index] = (noise_vals.mean()
                                             if noise_vals.size else 0.0)
            self.images_noise_std[index] = (noise_vals.std()
                                            if noise_vals.size else 0.0)

        # reference border pad, then center in the common frame
        h, w = arr.shape
        top = (frame - h) // 2
        left = (frame - w) // 2
        padded = np.pad(arr, ((top, frame - h - top), (left, frame - w - left)),
                        mode='constant', constant_values=0)
        # per-image RNG stream: identical output whether the stack is built
        # in RAM or streamed into the cache (and independent of order)
        rng = np.random.default_rng([self.seed, index])
        filled = replace_zero_with_noise(padded, self.images_noise_mean[index],
                                         self.images_noise_std[index], rng)
        return _to_unit_float(filled)[..., None]

    def _fill_stack(self, out, frame: int):
        for i in range(len(self.filenames)):
            out[i] = self._process_one(i, frame)

    # ---------------------------------------------------------------- caching
    def _cache_key(self, frame: int):
        entries = [(os.path.basename(f), os.path.getmtime(f), os.path.getsize(f))
                   for f in self.filenames]
        # frame = max image dim + 2*pad, so it pins the padded geometry.
        # 'stats' pins which noise-stats backend built the stack: the native
        # std differs from numpy's at ~1e-15 (runtime/preproc.cpp), so a
        # stack cached under one backend is rebuilt rather than silently
        # reused when the environment gains/loses the native library.
        return {'frame': frame, 'seed': self.seed, 'files': entries,
                'stats': self._stats_impl}

    def _open_or_build_cache(self, frame: int):
        import json
        cache_dir = os.path.join(self.dir, '.neuron_gan_cache')
        os.makedirs(cache_dir, exist_ok=True)
        stack_path = os.path.join(cache_dir, 'stack.npy')
        meta_path = os.path.join(cache_dir, 'stack.json')
        key = self._cache_key(frame)

        if os.path.exists(stack_path) and os.path.exists(meta_path):
            with open(meta_path) as fh:
                meta = json.load(fh)
            if meta.get('key') == json.loads(json.dumps(key)):
                self.images_noise_mean = np.array(meta['noise_mean'])
                self.images_noise_std = np.array(meta['noise_std'])
                return np.load(stack_path, mmap_mode='r')

        # Build incrementally: one decoded image in RAM at a time.
        out = np.lib.format.open_memmap(
            stack_path, mode='w+', dtype=np.float32,
            shape=(len(self.filenames), frame, frame, 1))
        self._fill_stack(out, frame)
        out.flush()
        del out
        with open(meta_path, 'w') as fh:
            json.dump({'key': key,
                       'noise_mean': self.images_noise_mean.tolist(),
                       'noise_std': self.images_noise_std.tolist()}, fh)
        return np.load(stack_path, mmap_mode='r')

    def __len__(self):
        return len(self.filenames)

    def set_image_size(self, size: int):
        assert size <= self.image_size_max, \
            'The image size ({}) must be < {}.'.format(size, self.image_size_max)
        self.image_size = size
