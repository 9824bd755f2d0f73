"""Progressively-growing GAN as phase-indexed pure functions (TPU-native).

Design vs the reference (models.py:272-616): the reference mutates module
topology at fade-in completion (popping blocks between ModuleLists,
models.py:368-377/:539-549).  Under XLA, shapes must be static per
compilation, so instead:

* the **full parameter pytree for every phase is allocated up front** —
  parameters are phase-independent, and blocks not yet reached simply get
  zero gradient;
* the forward is a pure function ``f(params, x, phase, alpha)`` with
  ``phase`` **static** (one XLA executable per (phase, fading?) pair) and
  ``alpha`` **traced** (fade-in advances with zero recompiles);
* growth becomes switching to the next compiled executable — the
  ``GrowthState`` dataclass replays the reference's growth state machine
  (increase_resolution / advance_transition / set_resolution,
  models.py:355-392) without touching parameters.

Architecture parity map (all shapes NHWC, weights HWIO):

* stem       = Linear_normalized(latent -> F0*init^2, bias=False) + Unflatten
               + LeakyReLU + PixelNorm + eq-Conv3x3(F0->F0, bias=False)
               + LeakyReLU + PixelNorm                  (models.py:295-316)
* G block i  = up2-bilinear then 2x [eq-Conv3x3 bias=False + LReLU + PixelNorm]
               mapping F[i] -> F[i+1]                   (models.py:245-268, 319-324)
* to_rgb[i]  = plain 1x1 conv (kaiming init, bias=False) + tanh
               (models.py:133-152)
* D block i  = AvgPool2 then 2x [eq-Conv3x3 bias=False + LReLU + PixelNorm]
               mapping Fd[i] -> Fd[i+1]                 (models.py:493-498)
* from_rgb[i]= plain 1x1 conv (kaiming init, with bias) (models.py:156-168)
* D head     = eq-Conv3x3(Fl->Fl, bias) + LReLU + PixelNorm
               + eq-Conv(init x init)(Fl->1, bias, VALID) + flatten
               (models.py:468-490; pure-conv critic, no sigmoid, and — like
               the reference — **no minibatch-stddev layer**)

Fade-in forward paths follow models.py:344-351 (G) and :516-524 (D).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from neuron_gan_tpu.ops import (
    conv2d,
    equalized_conv2d,
    equalized_linear,
    fade_in,
    init_conv2d,
    init_linear,
    leaky_relu,
    pixel_norm,
    upsample2_bilinear,
    avg_pool,
)


@dataclasses.dataclass(frozen=True)
class PGConfig:
    """Static architecture description shared by G and D."""
    n_gen_features: tuple
    n_dis_features: tuple
    latent_dim: int = 512
    image_size_init: int = 4
    n_colors: int = 1
    neg_slope: float = 0.2
    # 'float32' (reference-parity), 'bfloat16' (everything half-width), or
    # 'mixed': bfloat16 activations through the conv blocks (where the HBM
    # bytes are) with float32 kept where low precision measurably hurts GAN
    # training — the latent stem, PixelNorm statistics, the to_rgb tanh
    # image, and the critic head/score.
    compute_dtype: str = 'float32'
    # 'highest' keeps f32 convs in true f32 (XLA's default runs them as
    # low-precision passes, which breaks parity with the torch reference);
    # for speed, switch compute_dtype to 'bfloat16' instead of lowering this.
    precision: Optional[str] = 'highest'
    # Space-to-depth packed execution threshold: convs whose resolution is
    # >= this run in the 2x2-packed layout (4x channels, 1/4 spatial) with
    # exactly-transformed kernels — raises MXU lane occupancy on the
    # narrow-channel high-res layers (see ops/packed.py).  None disables.
    packed_min_res: Optional[int] = None
    # Use the Pallas fused LeakyReLU+PixelNorm kernel in unpacked blocks
    # (ops/pallas_kernels.py); off by default — XLA's fusion is competitive.
    use_pallas: bool = False
    # Pallas fused LeakyReLU + grouped-PixelNorm epilogue for PACKED blocks:
    # one HBM read/write per epilogue instead of the einsum chain's several
    # full passes (ops/pallas_kernels.py; GP-safe — the kernel is
    # second-order differentiable).  None = auto (resolved by
    # ``packed_pallas_epilogue`` below); explicit True/False overrides.
    pallas_epilogue: Optional[bool] = None
    # Fully fused conv3x3 + LeakyReLU + grouped-PixelNorm Pallas kernel for
    # the packed stride-1 block convs (ops/pallas_conv.py): the conv runs
    # inside the kernel, so the pre-activation z never touches HBM (the
    # round-2 epilogue-only kernel lost exactly because the opaque call
    # blocked XLA's epilogue-into-conv fusion).  GP-safe (second-order
    # differentiable).  None = auto (resolved by ``packed_pallas_conv``).
    pallas_conv: Optional[bool] = None
    # Fuse upsample + first block conv into one composed-kernel conv in the
    # packed generator path (ops/packed.py::up2_equalized_conv3x3): 4x fewer
    # MACs and no interleave chain, but float-reordered summation vs the
    # decomposed ops.  None = auto: fused iff precision is None (the fast
    # training path); the 'highest'-precision parity path keeps the exact
    # decomposition.
    fuse_up2_conv: Optional[bool] = None
    # Fuse the discriminator's level boundary (avg-pool + repack + first
    # block conv) into one stride-2 composed-kernel conv
    # (ops/packed.py::pool2_equalized_conv3x3): removes the s2d retiling
    # copy and the group-mean pass.  Same None-auto gating as fuse_up2_conv.
    fuse_pool_conv: Optional[bool] = None
    # Lift 64-channel packed stride-1 block convs to the full-lane 2x4
    # layout (ops/packed.py packed8_*), with the fused boundary kernels
    # emitting/accepting packed8 natively: +15.3% at 512^2, promoted to
    # the SHIPPING default by the round-4 6-seed stacked SWD study
    # (logs/lanes_ab_r4.jsonl; BASELINE.md "full-lane 2x4 packing").
    # 128 enables, 64/None keeps the 2x2 layout.  The dataclass default
    # stays None so the op-level parity surface is unchanged; the shipping
    # 128 default is applied at the config-module / flagship layer
    # (configs/config.py packed_lanes, neuron_gan_tpu/flagship.py) — users
    # constructing PGConfig directly opt in explicitly.
    packed_lanes: Optional[int] = None

    def __post_init__(self):
        object.__setattr__(self, 'n_gen_features', tuple(self.n_gen_features))
        object.__setattr__(self, 'n_dis_features', tuple(self.n_dis_features))
        assert len(self.n_gen_features) == len(self.n_dis_features)
        if self.packed_min_res is not None:
            assert self.packed_min_res > self.image_size_init, \
                'packed_min_res must exceed the stem/head resolution'
        assert self.packed_lanes in (None, 64, 128), \
            f'packed_lanes must be None, 64 or 128, got {self.packed_lanes}'

    @property
    def n_layers_max(self) -> int:
        return len(self.n_gen_features)

    @property
    def n_phases(self) -> int:
        """Number of resolution phases (0 .. n_layers_max-1)."""
        return self.n_layers_max

    @property
    def image_size_max(self) -> int:
        return self.image_size_init * 2 ** (self.n_layers_max - 1)

    def resolution(self, phase: int) -> int:
        return self.image_size_init * 2 ** phase

    def phase_of_resolution(self, res: int) -> int:
        p = int(math.log2(res / self.image_size_init))
        assert self.resolution(p) == res, f'{res} is not a phase resolution'
        return p

    @property
    def dtype(self):
        if self.compute_dtype == 'mixed':
            return jnp.dtype('bfloat16')
        return jnp.dtype(self.compute_dtype)

    @property
    def mixed(self) -> bool:
        return self.compute_dtype == 'mixed'

    @property
    def fused_up2(self) -> bool:
        if self.fuse_up2_conv is None:
            return self.precision is None
        return self.fuse_up2_conv

    @property
    def fused_pool(self) -> bool:
        if self.fuse_pool_conv is None:
            return self.precision is None
        return self.fuse_pool_conv

    @property
    def packed_pallas_epilogue(self) -> bool:
        """Resolved pallas_epilogue gate.  Auto (None) resolves to False:
        measured slower than the einsum formulation at the flagship 512^2
        config (f32 12.28 vs 15.88 steps/s, mixed 16.15 vs 19.60 — the
        opaque custom call blocks XLA's epilogue-into-conv fusion; see
        BASELINE.md "Pallas fused epilogue").  Explicit True uses
        interpret mode off-TPU (kernel unit tests)."""
        if self.pallas_epilogue is not None:
            return self.pallas_epilogue
        return False

    @property
    def packed_pallas_conv(self) -> bool:
        """Resolved pallas_conv gate.  Auto (None) resolves to False per
        the hardware measurement (BASELINE.md round-3 closed lever: 18.1
        vs 25.2 steps/s — the hand conv runs the MXU at ~25% occupancy
        and the z traffic it saves is ~40 us/step; XLA's composed conv +
        fused epilogue wins).  Explicit True enables it (interpret off-TPU);
        the parity path (precision='highest') never routes here
        regardless — the kernel is a fast-path formulation."""
        if self.pallas_conv is not None:
            return self.pallas_conv and self.precision is None
        return False


# --------------------------------------------------------------------------
# Parameter initialization (full pytree for all phases up front)
# --------------------------------------------------------------------------

def init_generator_pg(key, cfg: PGConfig, dtype=jnp.float32):
    f = cfg.n_gen_features
    init = cfg.image_size_init
    ks = jax.random.split(key, 2 + 2 * (len(f) - 1) + len(f))
    ki = iter(ks)

    stem = {
        'linear': init_linear(next(ki), cfg.latent_dim, f[0] * init * init,
                              bias=False, neg_slope=cfg.neg_slope, dtype=dtype),
        'conv': init_conv2d(next(ki), f[0], f[0], 3, bias=False,
                            neg_slope=cfg.neg_slope, dtype=dtype),
    }
    blocks = []
    for i in range(len(f) - 1):
        blocks.append({
            'conv1': init_conv2d(next(ki), f[i], f[i + 1], 3, bias=False,
                                 neg_slope=cfg.neg_slope, dtype=dtype),
            'conv2': init_conv2d(next(ki), f[i + 1], f[i + 1], 3, bias=False,
                                 neg_slope=cfg.neg_slope, dtype=dtype),
        })
    to_rgb = [init_conv2d(next(ki), f[i], cfg.n_colors, 1, bias=False,
                          neg_slope=cfg.neg_slope, dtype=dtype)
              for i in range(len(f))]
    return {'stem': stem, 'blocks': blocks, 'to_rgb': to_rgb}


def init_discriminator_pg(key, cfg: PGConfig, dtype=jnp.float32):
    f = cfg.n_dis_features
    init = cfg.image_size_init
    ks = jax.random.split(key, 2 + 2 * (len(f) - 1) + len(f))
    ki = iter(ks)

    head = {
        'conv': init_conv2d(next(ki), f[-1], f[-1], 3, bias=True,
                            neg_slope=cfg.neg_slope, dtype=dtype),
        'conv_out': init_conv2d(next(ki), f[-1], 1, init, bias=True,
                                neg_slope=cfg.neg_slope, dtype=dtype),
    }
    blocks = []
    for i in range(len(f) - 1):
        blocks.append({
            'conv1': init_conv2d(next(ki), f[i], f[i + 1], 3, bias=False,
                                 neg_slope=cfg.neg_slope, dtype=dtype),
            'conv2': init_conv2d(next(ki), f[i + 1], f[i + 1], 3, bias=False,
                                 neg_slope=cfg.neg_slope, dtype=dtype),
        })
    from_rgb = [init_conv2d(next(ki), cfg.n_colors, f[i], 1, bias=True,
                            neg_slope=cfg.neg_slope, dtype=dtype)
                for i in range(len(f))]
    return {'head': head, 'blocks': blocks, 'from_rgb': from_rgb}


# --------------------------------------------------------------------------
# Forward passes
# --------------------------------------------------------------------------

def _lrelu_pn(x, cfg: PGConfig):
    """LeakyReLU -> PixelNorm epilogue; Pallas-fused when cfg.use_pallas."""
    if cfg.use_pallas and not cfg.mixed:
        import jax
        from neuron_gan_tpu.ops.pallas_kernels import lrelu_pixel_norm_pallas
        interpret = jax.default_backend() != 'tpu'  # CPU tests run interpreted
        return lrelu_pixel_norm_pallas(x, cfg.neg_slope, 1e-8, interpret)
    return pixel_norm(leaky_relu(x, cfg.neg_slope), f32_stats=cfg.mixed)


def _gen_block(x, p, cfg: PGConfig):
    """Upsample-then-two-convs generator block (models.py:245-268, scale=2)."""
    x = upsample2_bilinear(x)
    x = _lrelu_pn(equalized_conv2d(x, p['conv1'], padding=1,
                                   neg_slope=cfg.neg_slope,
                                   precision=cfg.precision), cfg)
    x = _lrelu_pn(equalized_conv2d(x, p['conv2'], padding=1,
                                   neg_slope=cfg.neg_slope,
                                   precision=cfg.precision), cfg)
    return x


def _to_rgb(x, p, cfg: PGConfig):
    """1x1 projection to color space + tanh (models.py:133-152).

    Under 'mixed' the image leaves the generator in float32 (the tanh and
    everything downstream — fade-in blend, GP interpolation, losses — run
    at full precision)."""
    y = conv2d(x, p, padding=0, precision=cfg.precision)
    if cfg.mixed:
        y = y.astype(jnp.float32)
    return jnp.tanh(y)


def _from_rgb(x, p, cfg: PGConfig):
    """1x1 projection from color space, no activation (models.py:156-168)."""
    return conv2d(x, p, padding=0, precision=cfg.precision)


def _gen_stem(params, z, cfg: PGConfig):
    init = cfg.image_size_init
    f0 = cfg.n_gen_features[0]
    x = equalized_linear(z, params['stem']['linear'], neg_slope=cfg.neg_slope,
                         precision=cfg.precision)
    # torch Unflatten produces CHW ordering (models.py:301-302); transpose to
    # NHWC so imported linear weights stay element-for-element compatible.
    x = x.reshape(-1, f0, init, init).transpose(0, 2, 3, 1)
    x = pixel_norm(leaky_relu(x, cfg.neg_slope))
    x = pixel_norm(leaky_relu(
        equalized_conv2d(x, params['stem']['conv'], padding=1,
                         neg_slope=cfg.neg_slope, precision=cfg.precision),
        cfg.neg_slope))
    return x


def _want_packed(cfg: PGConfig, res: int) -> bool:
    return cfg.packed_min_res is not None and res >= cfg.packed_min_res


def _packed_lrelu_pn(x, cfg: PGConfig):
    """LeakyReLU -> grouped PixelNorm in the packed domain.  With
    cfg.pallas_epilogue the whole epilogue is one fused Pallas kernel (one
    HBM read/write; second-order differentiable, so it is GP-safe in the
    discriminator).  Otherwise the fast precision path uses the einsum
    (MXU) formulation — no grouped-view reshape, einsum adjoints; 'highest'
    keeps the reduce formulation whose summation order bit-matches the
    unpacked pixel_norm (parity tests)."""
    from neuron_gan_tpu.ops import packed as pk
    if cfg.packed_pallas_epilogue:
        from neuron_gan_tpu.ops.pallas_kernels import (
            packed_lrelu_pixel_norm_pallas)
        interpret = jax.default_backend() != 'tpu'  # CPU tests interpret
        return packed_lrelu_pixel_norm_pallas(x, cfg.neg_slope, 1e-8,
                                              interpret)
    y = leaky_relu(x, cfg.neg_slope)
    if cfg.precision is None:
        return pk.packed_pixel_norm_mxu(y, f32_stats=cfg.mixed)
    return pk.packed_pixel_norm(y, f32_stats=cfg.mixed)


def _packed_conv_lrelu_pn(x, p, cfg: PGConfig):
    """Packed stride-1 conv3x3 -> LeakyReLU -> grouped PixelNorm.

    With cfg.packed_pallas_conv (bias-free block convs only) the whole
    chain is ONE Pallas kernel — the conv runs inside it, so the
    pre-activation never materializes in HBM (ops/pallas_conv.py);
    otherwise the composed packed conv + epilogue ops."""
    from neuron_gan_tpu.ops import packed as pk
    if cfg.packed_pallas_conv and 'b' not in p:
        from neuron_gan_tpu.ops.pallas_conv import (
            packed_conv3x3_lrelu_pn_pallas)
        interpret = jax.default_backend() != 'tpu'  # CPU tests interpret
        w = p['w']
        wp = pk.pack_conv3x3_weight(w, pk._eq_scale3x3(w, cfg.neg_slope))
        return packed_conv3x3_lrelu_pn_pallas(x, wp, cfg.neg_slope, 1e-8,
                                              interpret)
    return _packed_lrelu_pn(
        pk.packed_equalized_conv3x3(x, p, neg_slope=cfg.neg_slope,
                                    precision=cfg.precision), cfg)


def _use_packed8(cfg: PGConfig, x_packed4) -> bool:
    """Route this block's interior through the full-lane 2x4 layout?
    Only the 64-channel (Ci=16) shapes gain lanes; wider is already full.
    The repack is hoisted to BLOCK level — one W-repack pair per block,
    not per conv: on TPU's tiled layouts the (B,H,W,4C)->(B,H,W/2,8C)
    reshape is a retiling copy, and a per-conv sandwich measured ~costs
    the whole conv win back (bench --lanes-128, BASELINE.md)."""
    return (cfg.packed_lanes == 128 and x_packed4.shape[-1] == 64
            and x_packed4.shape[2] % 2 == 0)


def _packed8_lrelu_pn(x, cfg: PGConfig):
    """LeakyReLU -> grouped PixelNorm in the 2x4-packed layout."""
    from neuron_gan_tpu.ops import packed as pk
    y = leaky_relu(x, cfg.neg_slope)
    if cfg.precision is None:
        return pk.packed8_pixel_norm_mxu(y, f32_stats=cfg.mixed)
    return pk.packed8_pixel_norm(y, f32_stats=cfg.mixed)


def _packed8_conv_lrelu_pn(x, p, cfg: PGConfig):
    """Full-lane stride-1 conv3x3 -> LeakyReLU -> grouped PixelNorm
    (~1.3x faster fwd+bwd than the 2x2 layout on the same activation
    bytes at Ci=16 — tools/lane_bench.py --chain); float-reordered
    contraction vs the 2x2 layout, same deviation class as the fused
    boundary kernels."""
    from neuron_gan_tpu.ops import packed as pk
    return _packed8_lrelu_pn(
        pk.packed8_equalized_conv3x3(x, p, neg_slope=cfg.neg_slope,
                                     precision=cfg.precision), cfg)


def _want_packed8_g(cfg: PGConfig, out_res: int, feat: int) -> bool:
    """Enter the native 2x4 layout at this generator level boundary?
    Requires the fused up-conv (the native packed8 boundary kernel; the
    decomposed parity path keeps the 2x2 sandwich), a lane-deficient
    channel width (feat*4 < 128), and a resolution whose packed8 width is
    even (out_res % 8 == 0) — mirrors _want_packed8_d."""
    return (cfg.packed_lanes == 128 and cfg.fused_up2
            and _want_packed(cfg, out_res) and feat * 4 < 128
            and out_res % 8 == 0)


def _gen_block_any(x, packed_in, i: int, params, cfg: PGConfig):
    """Run generator block i; returns (x, packed_out) with packed_out in
    {False, True (2x2 layout), 'p8' (native 2x4 layout)}.  Block i's convs
    run at out_res = resolution(i+1); packed iff out_res >= packed_min_res."""
    from neuron_gan_tpu.ops import packed as pk
    out_res = cfg.resolution(i + 1)
    p = params['blocks'][i]
    if not _want_packed(cfg, out_res):
        assert not packed_in  # resolution grows, so packing is monotone
        return _gen_block(x, p, cfg), False
    if cfg.fused_up2 and 'b' not in p['conv1']:
        # one composed-kernel conv replaces upsample + conv1 (4x fewer MACs,
        # no interleave chain; float-reordered vs the decomposed ops)
        if packed_in == 'p8':
            x = pk.depth_to_space8(x)
        elif packed_in:
            x = pk.depth_to_space(x)
        if _want_packed8_g(cfg, out_res, p['conv1']['w'].shape[3]):
            # native 2x4 boundary: the fused up-conv emits packed8
            # directly, so the whole level lives full-lane with zero
            # W-repacks (the #3 op of the sandwich routing's step trace)
            x = pk.up2_equalized_conv3x3_p8(x, p['conv1'],
                                            neg_slope=cfg.neg_slope,
                                            precision=cfg.precision)
            x = _packed8_lrelu_pn(x, cfg)
            x = _packed8_conv_lrelu_pn(x, p['conv2'], cfg)
            return x, 'p8'
        x = pk.up2_equalized_conv3x3(x, p['conv1'], neg_slope=cfg.neg_slope,
                                     precision=cfg.precision)
    else:
        if packed_in == 'p8':  # decomposed path has no packed8 forms
            x = pk.depth_to_space_w(x)
            packed_in = True
        if packed_in:
            x = pk.packed_upsample2_bilinear(x)
        else:
            x = pk.space_to_depth(upsample2_bilinear(x))
        x = pk.packed_equalized_conv3x3(x, p['conv1'], neg_slope=cfg.neg_slope,
                                        precision=cfg.precision)
    if _use_packed8(cfg, x):
        x = pk.space_to_depth_w(x)
        x = _packed8_lrelu_pn(x, cfg)
        x = _packed8_conv_lrelu_pn(x, p['conv2'], cfg)
        return pk.depth_to_space_w(x), True
    x = _packed_lrelu_pn(x, cfg)
    x = _packed_conv_lrelu_pn(x, p['conv2'], cfg)
    return x, True


def _to_rgb_any(x, packed, p, cfg: PGConfig):
    if not packed:
        return _to_rgb(x, p, cfg)
    from neuron_gan_tpu.ops import packed as pk
    if packed == 'p8':
        y = pk.packed8_conv1x1(x, p, precision=cfg.precision)
        if cfg.mixed:
            y = y.astype(jnp.float32)
        return pk.depth_to_space8(jnp.tanh(y))
    y = pk.packed_conv1x1(x, p, precision=cfg.precision)
    if cfg.mixed:
        y = y.astype(jnp.float32)
    return pk.depth_to_space(jnp.tanh(y))


def generator_pg(params, z, cfg: PGConfig, phase: int, alpha=None):
    """Generator forward. ``phase`` static; ``alpha`` traced or None.

    phase k => output resolution init * 2^k.  ``alpha is None`` = steady
    state (reference models.py:353); otherwise the fade-in path
    (models.py:344-351) blending the upsampled previous-resolution image with
    the new block's output.
    """
    if cfg.mixed:
        # float32 stem (tiny: init-res tensors), bfloat16 through the blocks
        x = _gen_stem(params, z.astype(jnp.float32), cfg).astype(cfg.dtype)
    else:
        x = _gen_stem(params, z.astype(cfg.dtype), cfg)
    packed = False
    if alpha is None:
        for i in range(phase):
            x, packed = _gen_block_any(x, packed, i, params, cfg)
        return _to_rgb_any(x, packed, params['to_rgb'][phase], cfg)
    assert phase >= 1, 'fade-in requires phase >= 1'
    for i in range(phase - 1):
        x, packed = _gen_block_any(x, packed, i, params, cfg)
    im_start = upsample2_bilinear(
        _to_rgb_any(x, packed, params['to_rgb'][phase - 1], cfg))
    x2, packed2 = _gen_block_any(x, packed, phase - 1, params, cfg)
    im_end = _to_rgb_any(x2, packed2, params['to_rgb'][phase], cfg)
    return fade_in(im_start, im_end, alpha)


def _dis_head(y, params, cfg: PGConfig):
    if cfg.mixed:
        # float32 head (init-res tensors): full-precision critic scores
        y = y.astype(jnp.float32)
    y = pixel_norm(leaky_relu(
        equalized_conv2d(y, params['head']['conv'], padding=1,
                         neg_slope=cfg.neg_slope, precision=cfg.precision),
        cfg.neg_slope))
    y = equalized_conv2d(y, params['head']['conv_out'], padding=0,
                         neg_slope=cfg.neg_slope, precision=cfg.precision)
    return y.reshape(y.shape[0], -1)  # (B, 1): pure-conv critic score


def _want_packed8_d(cfg: PGConfig, res: int, feat: int) -> bool:
    """Enter/stay in the native 2x4 layout at this discriminator level?
    Requires the fused pool boundary (the native packed8 pool+conv
    kernels; the decomposed parity path has no packed8 forms), a
    lane-deficient channel width (feat*4 < 128), and a resolution whose
    packed8 width survives the stride-2 pool (res % 8 == 0)."""
    return (cfg.packed_lanes == 128 and cfg.fused_pool
            and _want_packed(cfg, res) and feat * 4 < 128
            and res % 8 == 0)


def _from_rgb_any(x_img, res: int, p, cfg: PGConfig):
    """from_rgb at resolution ``res``; returns (y, packed) with packed in
    {False, True (2x2 layout), 'p8' (native 2x4 layout)}."""
    if not _want_packed(cfg, res):
        return _from_rgb(x_img, p, cfg), False
    from neuron_gan_tpu.ops import packed as pk
    if _want_packed8_d(cfg, res, p['w'].shape[3]):
        return pk.packed8_conv1x1(pk.space_to_depth8(x_img), p,
                                  precision=cfg.precision), 'p8'
    return pk.packed_conv1x1(pk.space_to_depth(x_img), p,
                             precision=cfg.precision), True


def _dis_block_any(y, packed_in: bool, i: int, entry_res: int, params,
                   cfg: PGConfig):
    """Discriminator block i (pool to entry_res/2, then convs there).
    Returns (y, packed_out) with packed_out iff entry_res/2 >= threshold."""
    from neuron_gan_tpu.ops import packed as pk
    p = params['blocks'][i]
    half = entry_res // 2
    packed_out = _want_packed(cfg, half)

    # --- native 2x4 entry: the level boundary itself runs packed8 ---
    in_p8 = packed_in == 'p8'
    out_p8 = (in_p8 and cfg.fused_pool and packed_out
              and _want_packed8_d(cfg, half, p['conv1']['w'].shape[3]))
    if in_p8 and not (cfg.fused_pool and packed_out):
        # no native boundary for this exit (unpacked half, or decomposed
        # parity path): repack to 2x2 and use the 2x2 branches below
        y = pk.depth_to_space_w(y)
        packed_in, in_p8 = True, False

    # --- pool + conv1 (the only step where the fused / decomposed paths
    # differ; the lrelu+pixelnorm epilogue and conv2 tail are shared) ---
    if in_p8:
        y = pk.pool2_equalized_conv3x3_p8(
            y, p['conv1'], neg_slope=cfg.neg_slope,
            precision=cfg.precision, out_packed8=out_p8)
        if out_p8:
            y = _packed8_lrelu_pn(y, cfg)
            y = _packed8_conv_lrelu_pn(y, p['conv2'], cfg)
            return y, 'p8'
        # fell out of the packed8 region into the 2x2 layout: the shared
        # conv2 tail below handles y (now a packed4 rep at half res)
    elif packed_in and cfg.fused_pool:
        # one composed-kernel conv replaces avg-pool + (repack +) conv1:
        # removes the s2d retiling copy and the group-mean pass
        # (float-reordered vs the decomposed ops — ops/packed.py)
        fused = (pk.pool2_equalized_conv3x3 if packed_out
                 else pk.pool2_unpacked_equalized_conv3x3)
        y = fused(y, p['conv1'], neg_slope=cfg.neg_slope,
                  precision=cfg.precision)
    else:
        if packed_in:
            # unpacked at entry_res/2; einsum form on the fast path (no
            # grouped-view reshape), reduce form bit-matches avg_pool
            y = (pk.packed_avg_pool2_mxu(y) if cfg.precision is None
                 else pk.packed_avg_pool2(y))
        else:
            y = avg_pool(y, 2)
        if packed_out:
            y = pk.space_to_depth(y)
            y = pk.packed_equalized_conv3x3(y, p['conv1'],
                                            neg_slope=cfg.neg_slope,
                                            precision=cfg.precision)
        else:
            y = equalized_conv2d(y, p['conv1'], padding=1,
                                 neg_slope=cfg.neg_slope,
                                 precision=cfg.precision)

    # --- shared epilogue + conv2 tail ---
    if packed_out and _use_packed8(cfg, y):
        y = pk.space_to_depth_w(y)
        y = _packed8_lrelu_pn(y, cfg)
        y = _packed8_conv_lrelu_pn(y, p['conv2'], cfg)
        y = pk.depth_to_space_w(y)
    elif packed_out:
        y = _packed_lrelu_pn(y, cfg)
        y = _packed_conv_lrelu_pn(y, p['conv2'], cfg)
    else:
        y = _lrelu_pn(y, cfg)
        y = _lrelu_pn(equalized_conv2d(y, p['conv2'], padding=1,
                                       neg_slope=cfg.neg_slope,
                                       precision=cfg.precision), cfg)
    return y, packed_out


def discriminator_pg(params, x, cfg: PGConfig, phase: int, alpha=None):
    """Discriminator forward; mirrors generator_pg's phase/alpha contract.

    At phase k the input is (B, init*2^k, init*2^k, C).  Block i maps
    Fd[i] -> Fd[i+1]; with L = n_layers_max, phase k uses from_rgb[L-1-k]
    and blocks[L-1-k .. L-2] (reference models.py:516-524 unrolled).
    """
    x = x.astype(cfg.dtype)
    L = cfg.n_layers_max
    res = cfg.resolution(phase)
    if alpha is None:
        y, packed = _from_rgb_any(x, res, params['from_rgb'][L - 1 - phase], cfg)
        r = res
        for i in range(L - 1 - phase, L - 1):
            y, packed = _dis_block_any(y, packed, i, r, params, cfg)
            r //= 2
        assert not packed  # head runs at init res, below the threshold
        return _dis_head(y, params, cfg)
    assert phase >= 1, 'fade-in requires phase >= 1'
    y_start, p_start = _from_rgb_any(avg_pool(x, 2), res // 2,
                                     params['from_rgb'][L - phase], cfg)
    y_in, p_in = _from_rgb_any(x, res, params['from_rgb'][L - 1 - phase], cfg)
    # run the fading block on y_in (packed/packed8 state from from_rgb)
    y_end, p_end = _dis_block_any(y_in, p_in, L - 1 - phase, res, params, cfg)
    assert p_start == p_end  # both follow res//2 >= threshold
    y = fade_in(y_start, y_end, alpha)
    packed, r = p_end, res // 2
    for i in range(L - phase, L - 1):
        y, packed = _dis_block_any(y, packed, i, r, params, cfg)
        r //= 2
    assert not packed
    return _dis_head(y, params, cfg)


# --------------------------------------------------------------------------
# Growth state machine (host-side; replays reference models.py:355-392)
# --------------------------------------------------------------------------

@dataclasses.dataclass
class GrowthState:
    """Tracks (phase, alpha) exactly like the reference's mutable nets.

    ``alpha`` here is a plain float mirror of the reference's buffer; the
    traced copy fed into jitted steps is derived from it.  ``fading`` is
    True while alpha < 1 (the reference's `if self.alpha < 1` branch).
    """
    cfg: PGConfig
    phase: int = 0
    alpha: float = 1.0

    @property
    def image_size(self) -> int:
        return self.cfg.resolution(self.phase)

    @property
    def fading(self) -> bool:
        return self.alpha < 1.0

    def increase_resolution(self):
        assert self.alpha >= 1, 'The previous transition has not ended.'
        self.alpha = 0.0
        self.phase += 1
        assert self.image_size <= self.cfg.image_size_max, (
            f'The image size ({self.image_size}) is greater than the maximum '
            f'({self.cfg.image_size_max})')

    def advance_transition(self, alpha_step=0.1):
        self.alpha += alpha_step
        # (No topology mutation needed at alpha >= 1 — the functional forward
        # switches to the steady-state executable when fading becomes False.)

    def set_resolution(self, res: int, alpha=1.0):
        assert res % self.image_size == 0, \
            'The resolution must be divisible by {}'.format(self.image_size)
        assert math.log2(res / self.image_size).is_integer()
        assert res <= self.cfg.image_size_max
        while self.image_size < res:
            self.increase_resolution()
            if self.image_size == res:
                self.advance_transition(alpha)
            else:
                self.advance_transition(1.0)
