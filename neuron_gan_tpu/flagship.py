"""The flagship benchmark/profiling configuration, in one place.

This is the reference's config_ex.py geometry (512x512, batch 8, latent 64,
n_critic 1, lambda_gp 10, drift 1e-3 — /root/reference/configs/config_ex.py)
with every SHIPPING training default applied (packed layout, fast matmul
precision, fused fast augmentation, shear warp — the promotion studies live
in BASELINE.md).  bench.py and the profiling tools (tools/op_trace.py,
tools/hlo_inspect.py, tools/step_profile.py, tools/stretch_1024.py) must all
build their config through these helpers: each promoted default used to be
hand-copied into five tool files, and the shear_warp promotion drifted out
of every profiler — they kept measuring the retired gather warp.

Overrides are explicit kwargs so a tool can measure one knob off the
shipping baseline without forking the whole literal.
"""


def flagship_config(**overrides):
    """PGConfig for the flagship model with shipping execution defaults."""
    from neuron_gan_tpu.models import PGConfig
    kw = dict(
        n_gen_features=(128, 64, 32, 32, 16, 16),
        n_dis_features=(16, 16, 32, 32, 64, 128),
        latent_dim=64, image_size_init=16, n_colors=1,
        packed_min_res=64,      # exact space-to-depth packed layout
        packed_lanes=128,       # full-lane 2x4 layout + native boundary
                                # kernels; 6-seed stacked SWD promotion
                                # (logs/lanes_ab_r4.jsonl; BASELINE.md)
        precision=None,         # = config.matmul_precision 'default'
        compute_dtype='mixed',  # 6-seed SWD promotion (BASELINE.md)
    )
    kw.update(overrides)
    return PGConfig(**kw)


def flagship_chunk_spec(phase, fading=False, **overrides):
    """ChunkSpec for one flagship training chunk with shipping defaults.

    lr_gamma/lr_cap mirror config_ex.py's 25k-epoch phases; crop_size is
    the dataset maximum (512), so sub-top phases exercise the production
    resize-from-crop path.
    """
    from neuron_gan_tpu.train_step import ChunkSpec
    kw = dict(
        phase=phase, fading=fading, n_critic=1, batch_size=8,
        n_images=16, shuffle=True, crop_size=512, translation=0.05,
        augment=True, gp_lambda=10.0, drift_epsilon=0.001, sim_lambda0=0.0,
        sim_decay=0.0, beta1=0.5, rmsprop=False, lr0=1e-4,
        lr_gamma=0.9998157, lr_boundary=0, lr_cap=12500, alpha_start=0,
        alpha_step=1e-4, latent_dim=64,
        # promoted augmentation defaults (configs/config.py; BASELINE.md);
        # 'auto' = per-phase max(gather, shear) — train_step.resolve_shear
        fast_augment=True, shear_warp='auto',
    )
    kw.update(overrides)
    return ChunkSpec(**kw)
