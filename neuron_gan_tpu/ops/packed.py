"""Space-to-depth packed execution for narrow-channel, high-resolution convs.

Why: the PGGAN's high-resolution layers have 16-32 channels, so a 3x3 conv
feeds the 128x128 MXU at ~12% lane occupancy on both operands — the
per-step ceiling is shape-limited, not FLOP-limited (BASELINE.md).  Packing
2x2 spatial blocks into channels (NHWC (B,R,R,C) -> (B,R/2,R/2,4C)) raises
occupancy ~16x for 4x the FLOPs — a classic TPU layout transform.

The transform is **exact**: a stride-1 zero-padded 3x3 conv on the original
domain equals a 3x3 conv on the packed domain with a scatter-transformed
kernel.  Derivation: output pixel (2p+a, 2q+b) pulls original rows
2p+a+dy; with (P, a') = divmod(a+dy, 2) each (dy, a) maps to exactly one
packed offset/parity, so the packed kernel W[P,Q,(a',b',i),(a,b,o)] is a
permutation-scatter of w[dy,dx,i,o] (no collisions).  Packed zero padding
(one packed ring = two original pixels) is also exact because the scattered
kernel never reads the extra ring.

Parameters stay in the ORIGINAL (HWIO, unpacked) format — checkpointing and
reference-weight import are untouched; the packed path is a pure forward
rewrite, and the weight scatter is differentiable so gradients land on the
original weights automatically.

Channel order convention: packed channel index = (a*2 + b) * C + i
(parity-major, original-channel minor) — what ``space_to_depth`` produces.
"""

import math

import jax.numpy as jnp
import numpy as np
from jax import lax

from neuron_gan_tpu.ops.equalized import calculate_gain


def space_to_depth(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C), channel order (a, b, i)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x):
    """(B, H, W, 4C) -> (B, 2H, 2W, C), inverse of space_to_depth."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h, 2 * w, c)


def _pack_transfer_tensor():
    """Constant 0/1 tensor T[P+1,Q+1,a',b',a,b,ty,tx] realizing the pack
    scatter as one einsum: the 36 static-slice scatters cost ~5 ms/step in
    op-dispatch overhead (forward and backward, per conv per step), while
    the einsum is a single tiny contraction with an einsum adjoint."""
    t = np.zeros((3, 3, 2, 2, 2, 2, 3, 3), np.float32)
    for a in (0, 1):
        for b in (0, 1):
            for dy in (-1, 0, 1):
                P, ap = divmod(a + dy, 2)
                for dx in (-1, 0, 1):
                    Q, bp = divmod(b + dx, 2)
                    t[P + 1, Q + 1, ap, bp, a, b, dy + 1, dx + 1] = 1.0
    return t


_PACK_T = _pack_transfer_tensor()


def pack_conv3x3_weight(w, scale=1.0):
    """Transform an HWIO 3x3 kernel (3,3,Ci,Co) into the packed-domain kernel
    (3,3,4Ci,4Co) such that packed_conv(s2d(x), W) == s2d(conv(x, w)).

    ``scale`` folds the equalized-LR runtime factor into the same transform.

    Derivation (see module docstring): out[P+1, Q+1, (a',b',i), (a,b,o)] =
    w[dy+1, dx+1, i, o] with (P, a') = divmod(a+dy, 2) — a permutation
    scatter, realized here as one einsum against a constant 0/1 tensor.
    """
    kh, kw, ci, co = w.shape
    assert kh == 3 and kw == 3, 'pack_conv3x3_weight expects a 3x3 kernel'
    w = w * jnp.asarray(scale, w.dtype)
    t = jnp.asarray(_PACK_T, w.dtype)
    # HIGHEST: a default-precision einsum would bf16-round the weights on
    # TPU, breaking the transform's exactness on the 'highest' parity path
    # (the op is kernel-sized — precision here costs nothing)
    out = jnp.einsum('PQcdabts,tsio->PQcdiabo', t, w,
                     precision=lax.Precision.HIGHEST)
    return out.reshape(3, 3, 4 * ci, 4 * co)


def packed_equalized_conv3x3(x_packed, params, *, neg_slope=0.2,
                             precision=None):
    """Equalized-LR 3x3 conv executed in the packed domain.

    ``params['w']`` is the ORIGINAL (3,3,Ci,Co) kernel; the equalized scale
    uses the original fan_in (models.py:186-201 semantics).
    """
    w = params['w']
    scale = _eq_scale3x3(w, neg_slope)
    w_packed = pack_conv3x3_weight(w, scale)
    y = lax.conv_general_dilated(
        x_packed, w_packed.astype(x_packed.dtype), window_strides=(1, 1),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'), precision=precision)
    if 'b' in params:
        bb = jnp.tile(params['b'], 4)
        y = y + bb.astype(y.dtype)
    return y


def packed_pixel_norm(x_packed, eps=1e-8, f32_stats=False):
    """PixelNorm over ORIGINAL channels: normalize each (a, b) group's C
    channels independently (delegates to ops.pixel_norm on the grouped
    view, so the stats/eps/f32 handling has one implementation)."""
    from neuron_gan_tpu.ops.pixelnorm import pixel_norm
    b, h, w, c4 = x_packed.shape
    c = c4 // 4
    xg = x_packed.reshape(b, h, w, 4, c)
    return pixel_norm(xg, eps, f32_stats=f32_stats).reshape(b, h, w, c4)


def _group_mat(cn, n_groups=4):
    """(G*C, G) constant 0/1 matrix: column g marks parity group g's
    channels (packed channel order is parity-major, see module docstring;
    the 2x4 layout uses n_groups=8)."""
    c = cn // n_groups
    g = np.zeros((cn, n_groups), np.float32)
    g[np.arange(cn), np.arange(cn) // c] = 1.0
    return g


def packed_pixel_norm_mxu(x_packed, eps=1e-8, f32_stats=False,
                          n_groups=4):
    """Grouped PixelNorm without materializing the (..., G, C) view: ONE
    full-lane dot against the (GC, GC) 0/1 SAME-GROUP matrix G·Gᵀ yields
    each channel's group sum-of-squares already broadcast to its whole
    group, so the old broadcast-back einsum disappears and the
    rsqrt+multiply are pure elementwise consumers of the dot output (XLA
    fuses them into its epilogue — the stats tensor never hits HBM).

    History: the round-2 form was a (GC, G) stats dot + a (G, GC)
    broadcast-back dot; it remains the narrow-width branch (the width
    gate below).  The round-5 microbench at the packed8 top-phase
    shape (tools/epilogue_bench.py) measured the single same-group dot at
    1.59x fwd / 1.24x fwd+bwd / 1.12x GP-second-order over that pair:
    16x the MACs, but the (128, 8) dot used 8 of 128 output lanes while
    this one runs the MXU full-lane, and one fusion barrier replaces two.
    On the TPU backend the output measured BIT-EQUAL to the old pair
    across the full conv->epilogue chain (epilogue_bench sanity check:
    max deviation 0.0); a dot's contraction blocking is in general
    implementation-defined per output width, so the cross-backend
    guarantee is the reorder-level bound (1-2 f32 ulps — the fused
    kernels' accepted float-equivalence class; pinned by
    tests/test_packed.py::test_packed_pixel_norm_mxu_matches_einsum_pair)
    — no quality gate applies either way.  The alternatives (8-group
    Pallas epilogue, grouped-view reduce, select/take broadcasts) all
    measured slower — table in BASELINE.md round 5.

    The normalization statistics ACCUMULATE in float32 in every mode (the
    'mixed' recipe keeps PixelNorm stats full-precision — BASELINE.md).
    Used on the fast-precision path; ``precision='highest'`` keeps the
    reduce formulation whose summation order bit-matches the unpacked
    ``pixel_norm``.

    For bfloat16 inputs the dot feeds the MXU bf16 operands directly with
    ``preferred_element_type=float32`` (the MXU multiplies bf16 pairs
    exactly and accumulates in f32) instead of materializing a full-size
    float32 copy of the activation — the x^2, rsqrt-scale and final
    multiply each round once, a <=2-bf16-ulp output perturbation with NO
    change to the f32 accumulation of the statistics (the same deviation
    class as the accepted Pallas epilogue kernel), far inside the
    promoted mixed recipe's noise bar."""
    c4 = x_packed.shape[-1]
    c = c4 // n_groups
    gm = _group_mat(c4, n_groups)
    # Width gate: the same-group dot wins where the channel width fills
    # the 128 VREG lanes (every level of the SHIPPING packed_lanes=128
    # config); at half-lane widths (the retired 2x2 layout's 16-feature
    # levels, c4=64) its GCx MAC inflation is not free and the pair form
    # measured faster end-to-end (512^2 2x2 same-day: 23.96 ungated vs
    # 24.75 with this gate — BASELINE.md round 5).
    if c4 >= 128:
        same_group = gm @ gm.T  # (GC, GC) 0/1, exact in bf16
        if f32_stats and x_packed.dtype == jnp.bfloat16:
            m = jnp.einsum('bhwk,kj->bhwj', jnp.square(x_packed),
                           jnp.asarray(same_group, jnp.bfloat16),
                           preferred_element_type=jnp.float32) * (1.0 / c)
            return x_packed * lax.rsqrt(m + eps).astype(jnp.bfloat16)
        xf = (x_packed.astype(jnp.float32)
              if f32_stats and x_packed.dtype != jnp.float32 else x_packed)
        m = jnp.einsum('bhwk,kj->bhwj', jnp.square(xf),
                       jnp.asarray(same_group, jnp.float32),
                       precision=lax.Precision.HIGHEST) * (1.0 / c)
        out = xf * lax.rsqrt(m + eps)
        return out.astype(x_packed.dtype)
    # narrow-width pair form: (GC, G) stats dot + (G, GC) broadcast dot
    if f32_stats and x_packed.dtype == jnp.bfloat16:
        gb = jnp.asarray(gm, jnp.bfloat16)  # 0/1: exact in bf16
        m4 = jnp.einsum('bhwk,kg->bhwg', jnp.square(x_packed), gb,
                        preferred_element_type=jnp.float32) * (1.0 / c)
        r = lax.rsqrt(m4 + eps).astype(jnp.bfloat16)
        # 0/1 broadcast-back: each output sums exactly one r term — exact
        scale = jnp.einsum('bhwg,kg->bhwk', r, gb,
                           preferred_element_type=jnp.bfloat16)
        return x_packed * scale
    xf = (x_packed.astype(jnp.float32)
          if f32_stats and x_packed.dtype != jnp.float32 else x_packed)
    g = jnp.asarray(gm, jnp.float32)
    m4 = jnp.einsum('bhwk,kg->bhwg', jnp.square(xf), g,
                    precision=lax.Precision.HIGHEST) * (1.0 / c)
    r = lax.rsqrt(m4 + eps)
    out = xf * jnp.einsum('bhwg,kg->bhwk', r, g,
                          precision=lax.Precision.HIGHEST)
    return out.astype(x_packed.dtype)


def packed_conv1x1(x_packed, params, *, precision=None):
    """1x1 conv (to_rgb/from_rgb) applied per parity group: block-diagonal
    1x1 conv in the packed domain (one einsum against eye(4) — same
    dispatch-overhead rationale as pack_conv3x3_weight)."""
    w = params['w']  # (1, 1, Ci, Co)
    ci, co = w.shape[2], w.shape[3]
    eye = jnp.asarray(np.eye(4, dtype=np.float32), w.dtype)
    wb = jnp.einsum('gh,xyio->xygiho', eye, w,
                    precision=lax.Precision.HIGHEST  # exact block-diag
                    ).reshape(1, 1, 4 * ci, 4 * co)
    y = lax.conv_general_dilated(
        x_packed, wb.astype(x_packed.dtype), window_strides=(1, 1),
        padding=[(0, 0), (0, 0)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'), precision=precision)
    if 'b' in params:
        y = y + jnp.tile(params['b'], 4).astype(y.dtype)
    return y


def packed_avg_pool2(x_packed):
    """2x2 average pooling of the original image == mean over the 4 parity
    groups at each packed pixel.  Output is UNPACKED at half resolution."""
    b, h, w, c4 = x_packed.shape
    c = c4 // 4
    return x_packed.reshape(b, h, w, 4, c).mean(axis=3)


def packed_avg_pool2_mxu(x_packed):
    """``packed_avg_pool2`` without materializing the (..., 4, C) view: the
    parity-group mean is one tiny einsum against a constant 0.25-valued
    (4C, C) matrix (same rationale as ``packed_pixel_norm_mxu`` — the
    grouped-view reshape showed up as a materialized HBM copy in the op
    trace, and the einsum-against-constant adjoint is an einsum).  Used on
    the fast-precision path; summation order differs from the reduce form
    by ~1 ulp."""
    c4 = x_packed.shape[-1]
    c = c4 // 4
    m = np.zeros((c4, c), np.float32)
    m[np.arange(c4), np.arange(c4) % c] = 0.25
    if x_packed.dtype == jnp.bfloat16:
        # MXU-native: bf16 operands (0.25·x products are exact — exponent
        # shift), f32 accumulation, one final round — avoids promoting the
        # whole activation to a materialized f32 copy (same rationale as
        # packed_pixel_norm_mxu's bf16 path)
        return jnp.einsum('bhwk,ki->bhwi', x_packed,
                          jnp.asarray(m, jnp.bfloat16),
                          preferred_element_type=jnp.float32
                          ).astype(jnp.bfloat16)
    return jnp.einsum('bhwk,ki->bhwi', x_packed, jnp.asarray(m, jnp.float32),
                      precision=lax.Precision.HIGHEST).astype(x_packed.dtype)


def packed_upsample2_bilinear(x_packed):
    """x2 bilinear upsample in the packed domain.

    Input: packed rep of res R (spatial R/2); output: packed rep of res 2R
    (spatial R).  Implemented exactly via unpack -> shift-add up2 -> repack
    (pure VPU reshuffles; no gathers).
    """
    from neuron_gan_tpu.ops.resize import upsample2_bilinear
    return space_to_depth(upsample2_bilinear(depth_to_space(x_packed)))


# --------------------------------------------------------------------------
# Fused upsample + conv: s2d(conv3x3(zeropad(up2(x)))) as ONE stride-1 conv
# --------------------------------------------------------------------------
#
# Derivation (1D): with u = up2(x) (taps 0.25/0.75, edge-clamped) and
# y = conv3(zeropad(u)), the packed output Y[p][J] = y[2J+p] reads u at
# indices 2J+p+ty, each of which is a fixed 2-tap combination of x[J+dy]
# for dy in {-1,0,1}.  The composed coefficients c[p][ty][dy]:
#
#   p=0:  ty=-1 -> {dy=-1: .75, dy=0: .25}     (u[2J-1] = .75x[J-1]+.25x[J])
#         ty= 0 -> {dy=-1: .25, dy=0: .75}
#         ty=+1 -> {dy= 0: .75, dy=1: .25}
#   p=1:  ty=-1 -> {dy=-1: .25, dy=0: .75}
#         ty= 0 -> {dy= 0: .75, dy=1: .25}
#         ty=+1 -> {dy= 0: .25, dy=1: .75}
#
# Both output parities are 3-tap STRIDE-1 filters on the input grid — the
# output-packed spatial grid coincides with the input grid, so the whole
# upsample-then-conv becomes a single 3x3 conv from Ci to 4*Co channels
# (parity-major (p, q, o) order, matching space_to_depth).  This does 4x
# fewer MACs than upsampling then running the packed conv (the contraction
# is over Ci, not 4Ci) and eliminates the upsample's interleave chain, the
# costliest non-conv ops in the step trace (BASELINE.md).
#
# Borders: an edge-padded input reproduces up2's clamp, but the conv's
# ZERO-padding of u (u[-1] = u[2n] = 0) touches exactly the first/last
# output row (p=0 at J=0 / p=1 at J=n-1) and column — those four
# one-pixel-wide bands are recomputed exactly from thin slices and written
# over the fused result.

_UP2_TAPS = np.zeros((2, 3, 3), np.float32)  # [parity, ty+1, dy+1]
_UP2_TAPS[0, 0, 0], _UP2_TAPS[0, 0, 1] = 0.75, 0.25
_UP2_TAPS[0, 1, 0], _UP2_TAPS[0, 1, 1] = 0.25, 0.75
_UP2_TAPS[0, 2, 1], _UP2_TAPS[0, 2, 2] = 0.75, 0.25
_UP2_TAPS[1, 0, 0], _UP2_TAPS[1, 0, 1] = 0.25, 0.75
_UP2_TAPS[1, 1, 1], _UP2_TAPS[1, 1, 2] = 0.75, 0.25
_UP2_TAPS[1, 2, 1], _UP2_TAPS[1, 2, 2] = 0.25, 0.75


def fuse_up2_conv3x3_weight(w, scale=1.0):
    """(3,3,Ci,Co) kernel -> (3,3,Ci,4Co) fused upsample+conv kernel."""
    c = jnp.asarray(_UP2_TAPS, w.dtype)
    w = w * jnp.asarray(scale, w.dtype)
    # W_f[dy,dx,i,(p,q,o)] = sum_{ty,tx} c[p,ty,dy] c[q,tx,dx] w[ty,tx,i,o]
    wf = jnp.einsum('ptd,qse,tsio->deipqo', c, c, w,
                    precision=lax.Precision.HIGHEST)  # exact tap composition
    ci, co = w.shape[2], w.shape[3]
    return wf.reshape(3, 3, ci, 4 * co)


def _eq_scale3x3(w, neg_slope):
    """Equalized-LR runtime factor for a 3x3 conv kernel (gain/sqrt(Ci*9))
    — the one expression every packed/fused conv in this file shares."""
    assert w.ndim == 4 and w.shape[:2] == (3, 3), w.shape
    return calculate_gain('leaky_relu', neg_slope) / math.sqrt(w.shape[2] * 9)


def _conv_valid(x, w, precision):
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1),
        padding=[(0, 0), (0, 0)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'), precision=precision)


def _up2_row_band(x, n, w_s, precision, top):
    """Exact conv output for the first (p=0, J=0) or last (p=1, J=n-1)
    output row of the fused up-conv — where the conv's zero-padding of the
    upsampled frame applies.  u rows 0..1 (top) or 2n-2..2n-1 (bottom)
    from thin slices: H taps first, then the full-width W upsample (the
    decomposed op order, so float expressions match exactly)."""
    from neuron_gan_tpu.ops.resize import _up2_1d
    x2 = x[:, 0:2] if top else x[:, n - 2:n]
    r0, r1 = x2[:, 0:1], x2[:, 1:2]
    if top:
        uh = jnp.concatenate([0.25 * r0 + 0.75 * r0,
                              0.75 * r0 + 0.25 * r1], axis=1)
    else:
        uh = jnp.concatenate([0.25 * r0 + 0.75 * r1,
                              0.75 * r1 + 0.25 * r1], axis=1)
    u = _up2_1d(uh, 2)  # (B, 2, 2n, Ci)
    # conv row band: zero row beyond the border, zero cols (conv pad)
    rows = (1, 0) if top else (0, 1)  # zero row beyond the border
    up = jnp.pad(u, ((0, 0), rows, (1, 1), (0, 0)))
    return _conv_valid(up, w_s, precision)  # (B, 1, 2n, Co)


def _up2_col_band(x, n, w_s, precision, left):
    """Exact conv output for the first (q=0, K=0) or last (q=1, K=n-1)
    output column of the fused up-conv (mirrors _up2_row_band)."""
    from neuron_gan_tpu.ops.resize import _up2_1d
    xc = x[:, :, 0:2] if left else x[:, :, n - 2:n]
    uh = _up2_1d(xc, 1)  # (B, 2n, 2, Ci) — H first, as decomposed
    c0, c1 = uh[:, :, 0:1], uh[:, :, 1:2]
    if left:
        u = jnp.concatenate([0.25 * c0 + 0.75 * c0,
                             0.75 * c0 + 0.25 * c1], axis=2)
    else:
        u = jnp.concatenate([0.25 * c0 + 0.75 * c1,
                             0.75 * c1 + 0.25 * c1], axis=2)
    cols = (1, 0) if left else (0, 1)
    up = jnp.pad(u, ((0, 0), (1, 1), cols, (0, 0)))
    return _conv_valid(up, w_s, precision)  # (B, 2n, 1, Co)


def up2_equalized_conv3x3(x, params, *, neg_slope=0.2, precision=None):
    """s2d(conv3x3_zero-pad(up2_bilinear(x))) * eq_scale as one fused conv.

    ``x`` is UNPACKED (B, n, n, Ci); output is the packed rep of res 2n,
    (B, n, n, 4Co).  Equalized scale uses the original conv's fan_in
    (Ci*9), exactly like packed_equalized_conv3x3.  Float-equivalent (not
    bit-equal) to the decomposed path: the composed kernel reorders the
    tap summation — use the decomposed path for strict op-level parity.
    """
    w = params['w']
    assert 'b' not in params, 'fused up2-conv supports bias-free blocks only'
    assert x.shape[1] == x.shape[2], \
        f'fused up2-conv requires square input, got {x.shape}'
    scale = _eq_scale3x3(w, neg_slope)
    w_s = w * jnp.asarray(scale, w.dtype)

    n = x.shape[1]
    co = w.shape[3]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode='edge')
    y = _conv_valid(xp, fuse_up2_conv3x3_weight(w, scale), precision)

    # ---- exact border bands (u rows/cols 0,1 and 2n-2,2n-1 from thin
    # slices, same float expressions as the decomposed ops) ----

    def row_band(top):
        return _up2_row_band(x, n, w_s, precision, top)

    def col_band(left):
        return _up2_col_band(x, n, w_s, precision, left)

    # Write the bands as masked selects on the FLAT (b,n,n,4Co) conv output
    # — channel index is (p*2+q)*co+o, so each (parity, border) band is a
    # contiguous channel range at one row/column.  The masks are iota
    # comparisons and the thin bands are zero-padded to full shape; both are
    # lazy inside an XLA loop fusion, so the whole correction fuses into the
    # conv's elementwise epilogue instead of round-tripping the activation
    # through a (b,n,n,2,2,co) grouped view (a materialized retiling copy on
    # TPU — op trace/BASELINE.md) or minor-dim slice scatters (measured
    # slower).  Values are exactly the scatter formulation's: later selects
    # override earlier ones, so columns claim the corners as before.
    b = x.shape[0]
    top = row_band(True).reshape(b, 1, n, 2 * co)      # (q, o) channel-flat
    bot = row_band(False).reshape(b, 1, n, 2 * co)
    lf = col_band(True).reshape(b, n, 2, co)           # (J, p, o)
    rt = col_band(False).reshape(b, n, 2, co)

    row = jnp.arange(n).reshape(1, n, 1, 1)
    col = jnp.arange(n).reshape(1, 1, n, 1)
    ch = jnp.arange(4 * co).reshape(1, 1, 1, 4 * co)

    def pad_to_full(band, rows, cols, chans):
        return jnp.pad(band, ((0, 0), rows, cols, chans))

    y = jnp.where((row == 0) & (ch < 2 * co),                    # p=0, J=0
                  pad_to_full(top, (0, n - 1), (0, 0), (0, 2 * co)), y)
    y = jnp.where((row == n - 1) & (ch >= 2 * co),               # p=1, J=n-1
                  pad_to_full(bot, (n - 1, 0), (0, 0), (2 * co, 0)), y)
    y = jnp.where((col == 0) & (ch < co),                        # p=0, q=0
                  pad_to_full(lf[:, :, 0:1, :], (0, 0), (0, n - 1),
                              (0, 3 * co)), y)
    y = jnp.where((col == 0) & (2 * co <= ch) & (ch < 3 * co),   # p=1, q=0
                  pad_to_full(lf[:, :, 1:2, :], (0, 0), (0, n - 1),
                              (2 * co, co)), y)
    y = jnp.where((col == n - 1) & (co <= ch) & (ch < 2 * co),   # p=0, q=1
                  pad_to_full(rt[:, :, 0:1, :], (0, 0), (n - 1, 0),
                              (co, 2 * co)), y)
    y = jnp.where((col == n - 1) & (ch >= 3 * co),               # p=1, q=1
                  pad_to_full(rt[:, :, 1:2, :], (0, 0), (n - 1, 0),
                              (3 * co, 0)), y)
    return y


# --------------------------------------------------------------------------
# Fused avg-pool + (repack) + conv: the D-side level boundary as ONE conv
# --------------------------------------------------------------------------
#
# The discriminator's boundary between packed levels is
# ``conv3x3_packed(s2d(group_avg_pool(y)))``; the s2d 6D transpose is a
# materialized retiling copy of the full activation on TPU, and the
# group-mean is an extra full read+write pass (HLO census / op trace in
# BASELINE.md).  Composing all three into the conv kernel removes both.
#
# Derivation: with u[P,Q,i] = 0.25·Σ_{s,t} y[P,Q,(s,t,i)] (group-mean; same
# m×m grid) and out = s2d(conv3x3_zeropad(u, w)),
#
#   out[J,K,(a,b,o)] = Σ_{dy,dx,i} w[dy,dx,i,o] · u_zp[2J+a+dy, 2K+b+dx, i]
#
# Substituting u and indexing a once-zero-padded y (y_p1[r] = y[r-1]):
# row index 2J + (a+dy+1) with a+dy+1 ∈ {0..3} — i.e. a 4×4 STRIDE-2 conv
# on pad-1 y whose kernel is w spread over taps ty = a+dy+1 and broadcast
# (×0.25) over the four input parities:
#
#   K4[ty,tx,(s,t,i),(a,b,o)] = 0.25·w[ty-a, tx-b, i, o]   (0 ≤ ty-a ≤ 2)
#
# The packed conv's one-ring zero padding is reproduced exactly: p[-1] (a
# zero packed-at-R/2 ring) corresponds to u rows {-2,-1}, both zero in
# pad-1 y at stride-2 window positions.  16 vs 9 taps costs 1.78× the MACs
# on HBM-bound convs — the activation bytes (what these convs are limited
# by) are unchanged, and two full-pass layout ops disappear.
#
# At the packed→UNPACKED boundary (half < packed_min_res) there is no s2d
# and the pooled grid coincides with y's grid, so the fusion is purely a
# channel broadcast: conv3x3(u) == conv3x3 of y with kernel 0.25·w repeated
# over the four input parities (stride 1, padding 1).

_POOL_TAPS = np.zeros((4, 2, 3), np.float32)  # [ty, a, dy]
for _a in (0, 1):
    for _d in (0, 1, 2):
        _POOL_TAPS[_a + _d, _a, _d] = 1.0


def fuse_pool2_conv3x3_weight(w, scale=1.0):
    """(3,3,Ci,Co) kernel -> (4,4,4Ci,4Co) fused pool+repack+conv kernel."""
    t = jnp.asarray(_POOL_TAPS, w.dtype)
    w = w * jnp.asarray(0.25 * scale, w.dtype)
    wf = jnp.einsum('pad,qbe,deio->pqiabo', t, t, w,
                    precision=lax.Precision.HIGHEST)  # exact tap placement
    ci, co = w.shape[2], w.shape[3]
    wf = jnp.broadcast_to(wf[:, :, None, None], (4, 4, 2, 2, ci, 2, 2, co))
    return wf.reshape(4, 4, 4 * ci, 4 * co)


def pool2_equalized_conv3x3(x_packed, params, *, neg_slope=0.2,
                            precision=None):
    """conv3x3_packed(s2d(packed_avg_pool2(x))) * eq_scale as one conv.

    ``x_packed`` is the packed rep of res R, (B, m, m, 4Ci); output is the
    packed rep of res R/2, (B, m/2, m/2, 4Co).  Float-equivalent (not
    bit-equal) to the decomposed chain — tap-sum reorder only; use the
    decomposed ops for strict parity (mirrors up2_equalized_conv3x3)."""
    w = params['w']
    scale = _eq_scale3x3(w, neg_slope)
    wf = fuse_pool2_conv3x3_weight(w, scale)
    # padding expressed on the conv itself (identical math for zero pad;
    # no reliance on XLA folding an explicit pad into the conv)
    y = lax.conv_general_dilated(
        x_packed, wf.astype(x_packed.dtype), window_strides=(2, 2),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'), precision=precision)
    if 'b' in params:
        y = y + jnp.tile(params['b'], 4).astype(y.dtype)
    return y


def pool2_unpacked_equalized_conv3x3(x_packed, params, *, neg_slope=0.2,
                                     precision=None):
    """conv3x3(packed_avg_pool2(x), padding=1) * eq_scale as one conv.

    The packed→unpacked boundary: the pooled grid coincides with the packed
    grid, so the group-mean folds into the kernel as a 0.25-weighted
    parity broadcast.  (B, m, m, 4Ci) -> (B, m, m, Co)."""
    w = params['w']
    scale = _eq_scale3x3(w, neg_slope)
    ci, co = w.shape[2], w.shape[3]
    wf = jnp.broadcast_to(
        (w * jnp.asarray(0.25 * scale, w.dtype))[:, :, None, None],
        (3, 3, 2, 2, ci, co)).reshape(3, 3, 4 * ci, co)
    y = lax.conv_general_dilated(
        x_packed, wf.astype(x_packed.dtype), window_strides=(1, 1),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'), precision=precision)
    if 'b' in params:
        y = y + params['b'].astype(y.dtype)
    return y


# --------------------------------------------------------------------------
# Full-lane (2x4) packing: a second W-only pack over the 2x2 layout
# --------------------------------------------------------------------------
#
# The 2x2 packing lifts the 16-channel top phases to 64 channels — still
# only half the 128 VREG lanes, and tools/lane_bench.py measures the
# half-lane conv 28% slower than a full-lane conv on the SAME activation
# bytes (BASELINE.md "full-lane 2x4 packing").  Packing once more along W
# ((B, H/2, W/2, 4C) -> (B, H/2, W/4, 8C)) fills the lanes exactly at
# C=16.  The conv transform is the 1D instance of the 2x2 derivation:
# output packed column J parity b2 reads packed4 columns 2J + b2 + q1 for
# the three packed4 taps q1; with (Q2, b2') = divmod(b2 + q1, 2) each
# (b2, q1) maps to exactly ONE (Q2, b2') in {-1,0,1}x{0,1} — a collision-
# free scatter, so taps stay 3x3 and the packed8 kernel is (3,3,8Ci,8Co).
# Zero padding stays exact by the same argument as _PACK_T: the only
# out-of-range packed4 columns the scattered kernel reads are the two
# adjacent ones inside the one-packed8-column zero ring; the outer two are
# never referenced.  MAC cost: 8x the original conv (2x the 2x2 path) —
# paid back on HBM-bound shapes per the lane_bench measurement.
#
# Channel order: packed8 channel = b2 * 4C + packed4_channel — exactly
# what ``space_to_depth_w`` produces, so parity groups remain 8 contiguous
# blocks of C and the grouped epilogues generalize by block count alone.


def space_to_depth_w(x):
    """(B, H, W, K) -> (B, H, W/2, 2K), channel order (b2, k)."""
    b, h, w, k = x.shape
    return x.reshape(b, h, w // 2, 2 * k)


def depth_to_space_w(x):
    """(B, H, W, 2K) -> (B, H, 2W, K), inverse of space_to_depth_w."""
    b, h, w, k2 = x.shape
    return x.reshape(b, h, 2 * w, k2 // 2)


def _pack_w_transfer_tensor():
    """Constant 0/1 tensor T[Q2+1, b2', b2, q1+1] for the W-only pack
    scatter (1D analogue of _PACK_T)."""
    t = np.zeros((3, 2, 2, 3), np.float32)
    for b2 in (0, 1):
        for q1 in (-1, 0, 1):
            q2, bp = divmod(b2 + q1, 2)
            t[q2 + 1, bp, b2, q1 + 1] = 1.0
    return t


_PACK_W_T = _pack_w_transfer_tensor()


def pack_conv3x3_weight_w(w4):
    """Packed-domain kernel (3,3,K_i,K_o) -> W-packed kernel
    (3,3,2K_i,2K_o) such that conv(s2dw(x), W8) == s2dw(conv(x, W4))."""
    ki, ko = w4.shape[2], w4.shape[3]
    t = jnp.asarray(_PACK_W_T, w4.dtype)
    # HIGHEST for the same exactness reason as pack_conv3x3_weight
    out = jnp.einsum('qcbt,ptio->pqcibo', t, w4,
                     precision=lax.Precision.HIGHEST)
    return out.reshape(3, 3, 2 * ki, 2 * ko)


def packed8_equalized_conv3x3(x_p8, params, *, neg_slope=0.2,
                              precision=None):
    """Equalized-LR 3x3 conv in the 2x4-packed domain.

    ``x_p8`` is ``space_to_depth_w(space_to_depth(x))`` of the original
    NHWC activation; ``params['w']`` stays the ORIGINAL (3,3,Ci,Co)
    kernel (checkpoint format untouched, like packed_equalized_conv3x3).
    """
    w = params['w']
    scale = _eq_scale3x3(w, neg_slope)
    w8 = pack_conv3x3_weight_w(pack_conv3x3_weight(w, scale))
    y = lax.conv_general_dilated(
        x_p8, w8.astype(x_p8.dtype), window_strides=(1, 1),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'), precision=precision)
    if 'b' in params:
        y = y + jnp.tile(params['b'], 8).astype(y.dtype)
    return y


def packed8_pixel_norm(x_p8, eps=1e-8, f32_stats=False):
    """PixelNorm over ORIGINAL channels in the 2x4-packed layout: the 8
    parity groups are contiguous blocks of C (see channel-order note)."""
    from neuron_gan_tpu.ops.pixelnorm import pixel_norm
    b, h, w, c8 = x_p8.shape
    c = c8 // 8
    xg = x_p8.reshape(b, h, w, 8, c)
    return pixel_norm(xg, eps, f32_stats=f32_stats).reshape(b, h, w, c8)


def packed8_pixel_norm_mxu(x_p8, eps=1e-8, f32_stats=False):
    """MXU-grouped PixelNorm in the 2x4-packed layout (8 parity groups —
    the generalized ``packed_pixel_norm_mxu`` with n_groups=8)."""
    return packed_pixel_norm_mxu(x_p8, eps, f32_stats=f32_stats, n_groups=8)


def space_to_depth8(x):
    """(B, H, W, C) -> (B, H/2, W/4, 8C) in one copy (channel order
    (b2, a, b1, i) — s2dw(s2d(x)) without the intermediate)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 4, 2, 2, c)  # (p, a, q8, b2, b1, i)
    x = x.transpose(0, 1, 3, 4, 2, 5, 6)          # (p, q8, b2, a, b1, i)
    return x.reshape(b, h // 2, w // 4, 8 * c)


def depth_to_space8(x):
    """(B, H, W, 8C) -> (B, 2H, 4W, C), inverse of space_to_depth8."""
    b, h, w, c8 = x.shape
    c = c8 // 8
    x = x.reshape(b, h, w, 2, 2, 2, c)            # (b2, a, b1, i)
    x = x.transpose(0, 1, 4, 2, 3, 5, 6)          # (p, a, q8, b2, b1, i)
    return x.reshape(b, 2 * h, 4 * w, c)


def packed8_conv1x1(x_p8, params, *, precision=None):
    """1x1 conv (to_rgb/from_rgb) per parity group in the 2x4 layout —
    block-diagonal over the 8 groups (mirrors packed_conv1x1)."""
    w = params['w']  # (1, 1, Ci, Co)
    ci, co = w.shape[2], w.shape[3]
    eye = jnp.asarray(np.eye(8, dtype=np.float32), w.dtype)
    wb = jnp.einsum('gh,xyio->xygiho', eye, w,
                    precision=lax.Precision.HIGHEST  # exact block-diag
                    ).reshape(1, 1, 8 * ci, 8 * co)
    y = lax.conv_general_dilated(
        x_p8, wb.astype(x_p8.dtype), window_strides=(1, 1),
        padding=[(0, 0), (0, 0)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'), precision=precision)
    if 'b' in params:
        y = y + jnp.tile(params['b'], 8).astype(y.dtype)
    return y


# ---- native 2x4 boundary kernels: pool+conv ------------------------------
#
# The W-repack between the 2x2 boundary kernels and a 2x4 block interior
# is a retiling copy that measured as the #3 op in the lanes-128 step
# (BASELINE.md); these variants compose the W-pack into the fused
# pool+conv kernel itself so the >=packed8 region never changes layout.
#
# Derivation (W axis; H keeps fuse_pool2_conv3x3_weight's 4-tap stride-2
# structure): the packed4-level fused kernel reads input packed4 columns
# 2*c_out + tx - 1, tx in 0..3.  packed8 OUT (c_out = 2J + b2o): the
# input column is 2*j8 + b2i with j8 = 2J + delta and
# (delta, b2i) = divmod(2*b2o + tx - 1, 2), delta in {-1,0,1,2} — a 4-tap
# stride-2 window over packed8 columns, pad 1 each side (the only
# out-of-range packed4 columns referenced are -1 and m, both inside the
# zero ring; -2 and m+1 are never read — exact, as for _PACK_W_T).
# packed4 OUT (region exit): j8 = c_out + delta with
# (delta, b2i) = divmod(tx - 1, 2), delta in {-1,0,1} — 3 taps STRIDE 1
# along W (H stays stride 2), pad 1.


def _pool_w8_transfer(out_packed8):
    """Scatter tensor for W-packing the fused pool kernel's input (and,
    if out_packed8, its output): t[delta+1, b2i, (b2o,) tx]."""
    if out_packed8:
        t = np.zeros((4, 2, 2, 4), np.float32)
        for b2o in (0, 1):
            for tx in range(4):
                d, b2i = divmod(2 * b2o + tx - 1, 2)
                t[d + 1, b2i, b2o, tx] = 1.0
        return t
    t = np.zeros((3, 2, 4), np.float32)
    for tx in range(4):
        d, b2i = divmod(tx - 1, 2)
        t[d + 1, b2i, tx] = 1.0
    return t


_POOL_W8_T = _pool_w8_transfer(True)
_POOL_W8_OUT4_T = _pool_w8_transfer(False)


def fuse_pool2_conv3x3_weight_w8(w, scale=1.0):
    """(3,3,Ci,Co) kernel -> (4,4,8Ci,8Co) fused pool+conv kernel for
    packed8 input AND output (strides (2,2), padding (1,1))."""
    k4 = fuse_pool2_conv3x3_weight(w, scale)
    t = jnp.asarray(_POOL_W8_T, w.dtype)
    ki, ko = k4.shape[2], k4.shape[3]
    out = jnp.einsum('qcbt,ptio->pqcibo', t, k4,
                     precision=lax.Precision.HIGHEST)  # exact scatter
    return out.reshape(4, 4, 2 * ki, 2 * ko)


def fuse_pool2_conv3x3_weight_w8_out4(w, scale=1.0):
    """(3,3,Ci,Co) kernel -> (4,3,8Ci,4Co) fused pool+conv kernel for
    packed8 input, packed4 output (strides (2,1), padding (1,1)) — the
    packed8 region's exit boundary."""
    k4 = fuse_pool2_conv3x3_weight(w, scale)
    t = jnp.asarray(_POOL_W8_OUT4_T, w.dtype)
    ki = k4.shape[2]
    out = jnp.einsum('qct,ptio->pqcio', t, k4,
                     precision=lax.Precision.HIGHEST)  # exact scatter
    return out.reshape(4, 3, 2 * ki, k4.shape[3])


# ---- native 2x4 boundary kernel: upsample+conv (generator side) ----------
#
# The generator's level boundary inside the 2x4 region:
# ``s2dw(up2_equalized_conv3x3(x))`` as ONE conv, so the packed8 block
# interior receives its layout natively — no W-repack retiling copy (the
# #3 op of the lanes-128 step trace, BASELINE.md).
#
# Derivation (W axis; H keeps the fused up-conv's 3-tap stride-1
# structure): the packed4 fused kernel's output column K reads edge-padded
# input columns K + dx, dx in {-1,0,1}.  The packed8 output column
# (K8, b2) is packed4 column K = 2*K8 + b2, so it reads input columns
# 2*K8 + b2 + dx = 2*K8 + (tx - 1) with tx = b2 + dx + 1 in {0..3}: a
# 4-tap STRIDE-2 window over the SAME edge-padded input (width n+2; the
# last window starts at 2*(n/2-1) and ends at n+1 — in range, VALID).
# Each (b2, dx) maps to exactly one tx — a collision-free scatter, so
#
#   K8f[ty, tx, i, b2*4Co + c4] = Wf[ty, tx-1-b2, i, c4]  (0 <= tx-1-b2 <= 2)
#
# The border-band correction is the packed4 one reindexed: the thin row
# bands split into (K8, b2) by a stride-2 slice, and each packed4
# (row/col, parity) channel range maps into the b2-major packed8 order.

_UP2_W8_T = np.zeros((4, 2, 3), np.float32)  # [tx, b2, dx+1]
for _b2 in (0, 1):
    for _dx in (-1, 0, 1):
        _UP2_W8_T[_b2 + _dx + 1, _b2, _dx + 1] = 1.0


def fuse_up2_conv3x3_weight_w8(w, scale=1.0):
    """(3,3,Ci,Co) kernel -> (3,4,Ci,8Co) fused upsample+conv kernel
    emitting the packed8 layout (H stride 1 / W stride 2 over the
    edge-padded input)."""
    wf = fuse_up2_conv3x3_weight(w, scale)          # (3,3,Ci,4Co)
    t = jnp.asarray(_UP2_W8_T, w.dtype)
    out = jnp.einsum('qbt,ptio->pqibo', t, wf,
                     precision=lax.Precision.HIGHEST)  # exact scatter
    ci, co4 = wf.shape[2], wf.shape[3]
    return out.reshape(3, 4, ci, 2 * co4)


def up2_equalized_conv3x3_p8(x, params, *, neg_slope=0.2, precision=None):
    """``s2dw(up2_equalized_conv3x3(x))`` as one conv — the generator's
    level boundary emitting the full-lane 2x4 layout natively.

    ``x`` is UNPACKED (B, n, n, Ci); output is the packed8 rep of res 2n,
    (B, n, n/2, 8Co).  Float-equivalent to ``up2_equalized_conv3x3`` (the
    strided kernel zero-fills the out-of-window taps; tap-sum order only —
    same deviation class as the other fused kernels); the border bands use
    the IDENTICAL float expressions (_up2_row_band/_up2_col_band)."""
    w = params['w']
    assert 'b' not in params, 'fused up2-conv supports bias-free blocks only'
    assert x.shape[1] == x.shape[2], \
        f'fused up2-conv requires square input, got {x.shape}'
    n = x.shape[1]
    assert n % 2 == 0, f'packed8 output needs an even input size, got {n}'
    co = w.shape[3]
    scale = _eq_scale3x3(w, neg_slope)
    w_s = w * jnp.asarray(scale, w.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode='edge')
    y = lax.conv_general_dilated(
        xp, fuse_up2_conv3x3_weight_w8(w, scale).astype(x.dtype),
        window_strides=(1, 2), padding=[(0, 0), (0, 0)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'), precision=precision)

    b = x.shape[0]
    m = n // 2
    top = _up2_row_band(x, n, w_s, precision, True).reshape(b, 1, n, 2 * co)
    bot = _up2_row_band(x, n, w_s, precision, False).reshape(b, 1, n, 2 * co)
    lf = _up2_col_band(x, n, w_s, precision, True).reshape(b, n, 2, co)
    rt = _up2_col_band(x, n, w_s, precision, False).reshape(b, n, 2, co)

    row = jnp.arange(n).reshape(1, n, 1, 1)
    col = jnp.arange(m).reshape(1, 1, m, 1)
    ch = jnp.arange(8 * co).reshape(1, 1, 1, 8 * co)

    def pad_to_full(band, rows, cols, chans):
        return jnp.pad(band, ((0, 0), rows, cols, chans))

    # Row bands: J=0 carries the p=0 channels (b2*4co + [0, 2co)), J=n-1
    # the p=1 channels (b2*4co + [2co, 4co)); the band's K axis splits
    # into (K8, b2) by a stride-2 slice (thin band — cheap).  Same select
    # semantics as the packed4 version: columns claim the corners last.
    for b2 in (0, 1):
        off = b2 * 4 * co
        y = jnp.where((row == 0) & (off <= ch) & (ch < off + 2 * co),
                      pad_to_full(top[:, :, b2::2, :], (0, n - 1), (0, 0),
                                  (off, 8 * co - off - 2 * co)), y)
        y = jnp.where((row == n - 1) & (off + 2 * co <= ch)
                      & (ch < off + 4 * co),
                      pad_to_full(bot[:, :, b2::2, :], (n - 1, 0), (0, 0),
                                  (off + 2 * co, 8 * co - off - 4 * co)), y)
    # Column bands: original K=0 is (K8=0, b2=0), q=0 -> p=0 at [0,co),
    # p=1 at [2co,3co); original K=n-1 is (K8=m-1, b2=1), q=1 -> p=0 at
    # 4co+[co,2co) = [5co,6co), p=1 at 4co+[3co,4co) = [7co,8co).
    y = jnp.where((col == 0) & (ch < co),
                  pad_to_full(lf[:, :, 0:1, :], (0, 0), (0, m - 1),
                              (0, 7 * co)), y)
    y = jnp.where((col == 0) & (2 * co <= ch) & (ch < 3 * co),
                  pad_to_full(lf[:, :, 1:2, :], (0, 0), (0, m - 1),
                              (2 * co, 5 * co)), y)
    y = jnp.where((col == m - 1) & (5 * co <= ch) & (ch < 6 * co),
                  pad_to_full(rt[:, :, 0:1, :], (0, 0), (m - 1, 0),
                              (5 * co, 2 * co)), y)
    y = jnp.where((col == m - 1) & (ch >= 7 * co),
                  pad_to_full(rt[:, :, 1:2, :], (0, 0), (m - 1, 0),
                              (7 * co, 0)), y)
    return y


def pool2_equalized_conv3x3_p8(x_p8, params, *, neg_slope=0.2,
                               precision=None, out_packed8=True):
    """The discriminator level boundary natively in the 2x4 layout.

    ``x_p8`` is the packed8 rep of res R, (B, R/2, R/4, 8Ci); output is
    the packed8 rep of res R/2, (B, R/4, R/8, 8Co) (out_packed8) or the
    packed4 rep, (B, R/4, R/4, 4Co).  Float-equivalent to
    pool2_equalized_conv3x3 on the repacked operands (tap-sum reorder
    only, same class as the other fused kernels)."""
    w = params['w']
    scale = _eq_scale3x3(w, neg_slope)
    if out_packed8:
        wf = fuse_pool2_conv3x3_weight_w8(w, scale)
        strides = (2, 2)
    else:
        wf = fuse_pool2_conv3x3_weight_w8_out4(w, scale)
        strides = (2, 1)
    y = lax.conv_general_dilated(
        x_p8, wf.astype(x_p8.dtype), window_strides=strides,
        padding=[(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'), precision=precision)
    if 'b' in params:
        y = y + jnp.tile(params['b'], 8 if out_packed8 else 4).astype(y.dtype)
    return y
