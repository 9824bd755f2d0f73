"""Sample grids and training plots.

``save_image_grid`` replicates torchvision.utils.save_image semantics
(reference utils.py:602-610): tile into a √N x √N grid with 2px padding,
min-max normalize over the whole batch when ``normalize=True``, then
``mul(255).add(0.5).clamp`` and write a PNG via PIL.

``gen_samples``/``plot_gen_samples`` mirror reference utils.py:346-355 and
:568-610: seeded hypersphere latents (identical across checkpoints), no-grad
generator forward, nearest-upsample to image_size_max when mid-growth.
"""

import os

import numpy as np

import jax

from neuron_gan_tpu.models import generator_pg
from neuron_gan_tpu.ops.resize import resize_nearest
from neuron_gan_tpu.utils.latents import sample_latent_vec, sample_latent_vec_seeded


def make_grid(images_nhwc, nrow=8, padding=2, pad_value=0.0, normalize=False):
    """images: (N, H, W, C) -> (GH, GW, C) float grid."""
    imgs = np.asarray(images_nhwc, dtype=np.float32)
    if normalize:
        lo, hi = imgs.min(), imgs.max()
        if hi - lo > 1e-12:
            imgs = (imgs - lo) / (hi - lo)
        else:
            imgs = np.zeros_like(imgs)
    n, h, w, c = imgs.shape
    ncol = nrow
    nrows = int(np.ceil(n / ncol))
    gh = nrows * (h + padding) + padding
    gw = ncol * (w + padding) + padding
    grid = np.full((gh, gw, c), pad_value, np.float32)
    for i in range(n):
        r, col = divmod(i, ncol)
        y = padding + r * (h + padding)
        x = padding + col * (w + padding)
        grid[y:y + h, x:x + w] = imgs[i]
    return grid


def save_image_grid(images_nhwc, filename, nrow=8, normalize=True):
    from PIL import Image
    grid = make_grid(images_nhwc, nrow=nrow, normalize=normalize)
    arr = np.clip(grid * 255.0 + 0.5, 0, 255).astype(np.uint8)
    if arr.shape[-1] == 1:
        arr = arr[..., 0]
        img = Image.fromarray(arr, mode='L')
    else:
        img = Image.fromarray(arr)
    os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
    img.save(filename)


# One module-level jitted forward: a fresh jax.jit per call would start
# with an empty trace cache, retracing the generator at every checkpoint /
# SWD evaluation of a long run.
_generator_fwd = jax.jit(generator_pg, static_argnames=('cfg', 'phase'))


def gen_samples(g_params, cfg, growth, n_images=16, seed=None, key=None,
                z=None):
    """Latents (seeded / keyed / caller-provided ``z``) -> generator
    forward.  Returns (images, z)."""
    if z is None:
        if seed is not None:
            z = sample_latent_vec_seeded((n_images, cfg.latent_dim), seed=seed)
        else:
            key = key if key is not None else jax.random.PRNGKey(0)
            z = sample_latent_vec(key, (n_images, cfg.latent_dim))
    alpha = growth.alpha if growth.fading else None
    images = _generator_fwd(g_params, z, cfg=cfg, phase=growth.phase,
                            alpha=alpha)
    return images, z


def plot_gen_samples(g_params, cfg, growth, n_images=16, seed=None,
                     filename=None, eval_noise=None):
    images, _ = gen_samples(g_params, cfg, growth, n_images, seed=seed,
                            z=eval_noise)
    n_images = images.shape[0]
    images = np.asarray(images)
    # Upsample mid-growth samples to the final resolution (nearest — the
    # reference uses F.interpolate's default mode, utils.py:598-600).
    if images.shape[1] != cfg.image_size_max:
        images = np.asarray(resize_nearest(images, cfg.image_size_max))
    n_rows = int(np.round(np.sqrt(n_images)))
    if filename is not None:
        save_image_grid(images, filename, nrow=n_rows, normalize=True)
    return images


def plot_scores(loss_real, loss_fake, filename, g_loss=None, d_loss=None):
    """Score curves PNG (reference utils.py:649-665)."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    fig = plt.figure()
    plt.plot(loss_real, label='Real images (<D(x)>_x)')
    plt.plot(loss_fake, label='Fake images (<D(G(z))>_z)')
    if g_loss is not None and len(g_loss):
        plt.plot(g_loss, label='Generator')
    if d_loss is not None and len(d_loss):
        plt.plot(d_loss, label='Discriminator')
    plt.legend(loc='upper left')
    plt.xlabel('Epoch')
    plt.savefig(filename)
    plt.close(fig)


def plot_swd(records, filename):
    """Sample-quality curve PNG from SWD monitor records.

    ``records`` is a list of dicts with keys ``epoch``, ``swd_mean``,
    ``levels`` (finest band first) and ``resolution`` (the training-time
    quality series written by train.py's ``swd_period`` monitor — a
    beyond-reference addition; the metric is neuron_gan_tpu/metrics.py).
    Resolution changes (growth transitions) are marked: SWD values are only
    comparable within one resolution regime.
    """
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    if not records:
        return
    epochs = [r['epoch'] for r in records]
    fig = plt.figure()
    plt.plot(epochs, [r['swd_mean'] for r in records], marker='o',
             label='SWD mean (all bands)')
    plt.plot(epochs, [r['levels'][0] for r in records], marker='.',
             label='SWD finest band')
    prev_res = None
    for r in records:
        if prev_res is not None and r['resolution'] != prev_res:
            plt.axvline(r['epoch'], color='gray', ls=':', lw=0.8)
        prev_res = r['resolution']
    plt.legend(loc='upper right')
    plt.xlabel('Epoch')
    plt.ylabel('Sliced Wasserstein distance (lower is better)')
    plt.savefig(filename)
    plt.close(fig)


def calculate_grad_norm_hist(grads_tree, grad_min=-30, log_scale=True):
    """|grad| values flattened (+log10), with mean/std (reference utils.py:249-275)."""
    leaves = [np.abs(np.asarray(g)).ravel() for g in jax.tree.leaves(grads_tree)]
    vals = np.concatenate(leaves) if leaves else np.array([])
    if log_scale:
        vals = np.log10(np.maximum(vals, 10.0 ** grad_min))
    else:
        vals = np.maximum(vals, grad_min)
    if vals.size:
        return vals, float(vals.mean()), float(vals.std())
    return vals, float('nan'), float('nan')


def plot_grad_norm(gen_grads, dis_grads, filename=None):
    """Histograms of log10 |grad| for both nets (reference utils.py:619-645).

    The reference histograms the .grad left on parameters after the last
    backward; the functional equivalent takes explicit gradient pytrees
    (the train driver computes one fresh gradient at checkpoint time).
    """
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(8, 5))
    gvals, gmean, gstd = calculate_grad_norm_hist(gen_grads)
    ax1.hist(gvals, alpha=0.75)
    ax1.set_title('Generator, $\\mu$={:.2}, $\\sigma$={:.2}'.format(gmean, gstd))
    ax1.set_xlabel('Parameter gradient norm (Logged)')
    ax1.set_ylabel('Counts')
    dvals, dmean, dstd = calculate_grad_norm_hist(dis_grads)
    ax2.hist(dvals, alpha=0.75)
    ax2.set_title('Discriminator, $\\mu$={:.2}, $\\sigma$={:.2}'.format(dmean, dstd))
    ax2.set_xlabel('Parameter gradient norm (Logged)')
    ax2.set_ylabel('Counts')
    fig.tight_layout()
    if filename is None:
        fig.show()
    else:
        fig.savefig(filename)
        plt.close(fig)


def n_params(tree):
    return sum(int(np.prod(np.shape(p))) for p in jax.tree.leaves(tree))


def plot_dataset(dataset, resolutions, filename_prefix='Dataset',
                 directory=None, augment=False, seed=0):
    """Save the dataset grid at multiple resolutions (reference
    data/NeuronDataset.py:209-220): crop+renorm(+optional augment)+resize per
    resolution, nearest-upsampled back to the max size for uniform tiles."""
    import jax.numpy as jnp
    from neuron_gan_tpu.data.augment import AugmentSpec, augment_batch
    if directory is None:
        from neuron_gan_tpu.configs import config
        directory = config.images_dir
    os.makedirs(directory, exist_ok=True)
    size_max = dataset.image_size_max
    stack = jnp.asarray(dataset.images)
    out_files = []
    for res in resolutions:
        spec = AugmentSpec(crop_size=size_max, out_size=int(res),
                           translation=dataset.im_translation, augment=augment)
        images = np.asarray(augment_batch(stack, jax.random.PRNGKey(seed), spec))
        if images.shape[1] != size_max:
            images = np.asarray(resize_nearest(images, size_max))
        path = os.path.join(directory,
                            '{}_{}x{}.png'.format(filename_prefix, res, res))
        save_image_grid(images, path, nrow=4, normalize=True)
        out_files.append(path)
    return out_files


def plot_image(image_hwc):
    """Show one image with a colorbar (reference utils.py:550-554)."""
    import matplotlib.pyplot as plt
    plt.clf()
    arr = np.asarray(image_hwc)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    plt.imshow(arr, cmap='gray')
    plt.colorbar()


def plot_sample(dataset, ind=None):
    """Show a random (augment-free) dataset sample (reference utils.py:558-564)."""
    n = len(dataset)
    if ind is None:
        ind = int(np.random.randint(0, n))
    elif ind > n - 1:
        raise ValueError('ind must be smaller than {}'.format(n))
    plot_image(dataset.images[ind])
