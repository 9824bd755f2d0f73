"""Maximum-throughput training preset: config_ex plus every measured
speed knob pinned explicitly (BASELINE.md).

As of the round-2/round-4 6-seed SWD promotion studies, every knob this
preset sets is ALSO the shipping default (packed layout,
matmul_precision='default', fused fast augmentation, fused boundary
convs, shear warp, mixed bf16 compute, GP-fake reuse, full-lane 2x4
packing) — the preset is
kept as an explicit, self-describing pin of the fast path that stays
fast even if a future study demotes a default, and as the documented
home of the speed/quality knob set.

* ``compute_dtype='mixed'``  — bfloat16 activations through the conv
  blocks, f32 stem/PixelNorm-stats/image/critic-head: +23%.
* ``gp_reuse_fakes=True``    — gradient-penalty interpolates reuse the
  critic-loss fake batch (the original WGAN-GP formulation; the reference
  draws fresh latents per loss): +13%.
* ``shear_warp=True``        — 3-pass butterfly shear rotation instead of
  the torchvision-exact point-gather warp.
* ``packed_lanes=128``       — full-lane 2x4 packed layout with native
  packed8 boundary kernels at the lane-deficient levels: +15.3%.

29.7 G+D steps/s @512^2 (batch 8, incl. on-device augmentation) vs the
torch reference's 0.0127 (BASELINE.md, 2026-08-21) — identical to the
shipping default, since every knob here now IS the default.

    python train.py --configs config_fast
"""

import os

# Directories
root_dir = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir, os.pardir))
data_dir = os.path.join(root_dir, 'data')
images_dir = os.path.join(root_dir, 'images')
weights_dir = os.path.join(root_dir, 'weights')
plots_dir = os.path.join(root_dir, 'plots')

# WGAN config
wgan = False
n_critic = 1
adapt_critic = False
weights_init = ''
unroll_steps = 0

# PGGAN config
pggan = True
grad_pen_lambda = 10
transit_sch = [25000, 50000, 75000, 100000, 125000]
transit_period = None
alpha_step = 0.0001

# Training
ID = ''
samples_sub_dir = os.path.join(images_dir, '{}'.format(ID))
RMSprop = False
learning_rate = 0.0001
batch_size = 8
N_epochs = 150000
beta1 = 0.5
sim_loss_lambda = 0.0
sim_loss_lambda_decay_rate = 0.0
drift_epsilon = 0.001
resume = True
N_workers = 0
seed = 1
checkpointing_period = 100
device = 'default'
pin_memory = False

# Dataset
dataset_name = 'science_2022'
dataset_dir = os.path.join(data_dir, dataset_name)
translation = 0.05

# Architecture
latent_dim = 64
image_size = 512
N_colors = 1
LeakyReLU_leak = 0.2
N_gen_features = [128, 64, 32, 32, 16, 16]
N_dis_features = [16, 16, 32, 32, 64, 128]

# Speed/quality trade knobs (see module docstring; defaults keep these off)
compute_dtype = 'mixed'
gp_reuse_fakes = True
shear_warp = True
packed_lanes = 128
