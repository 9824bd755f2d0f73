"""Global configuration module.

Mirrors the reference config system (reference: configs/config.py:8-263):
module-level globals hold every knob; a user config ``.py`` is imported
dynamically with its names validated against this module's registry; explicit
CLI flags take precedence over the user config, which takes precedence over
the defaults (reference: train.py:95-104).  ID-keyed architecture tables and
the validation asserts are preserved (reference: configs/config.py:84-109,
:120-200).

TPU-specific additions (not present in the reference) are grouped at the
bottom under "TPU execution"; they default to values that reproduce the
reference's numerical behavior.
"""

import os
import sys
import uuid
from types import ModuleType, FunctionType

##################### Default configurations #####################
# Directories
root_dir = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir, os.pardir))
configs_dir = os.path.dirname(__file__)
data_dir = os.path.join(root_dir, 'data')
images_dir = os.path.join(root_dir, 'images')
weights_dir = os.path.join(root_dir, 'weights')
plots_dir = os.path.join(root_dir, 'plots')
logs_dir = os.path.join(root_dir, 'logs')

# WGAN config (reference: configs/config.py:18-23)
wgan = False          # Use the fixed-resolution Wasserstein GAN model family
n_critic = 1          # Critic steps per generator step
adapt_critic = False  # Adapt the number of critic steps from the loss series
weights_init = ''     # Filename of initial G/D weights
unroll_steps = 0      # Unrolled-GAN steps (accepted, unused — parity with reference train.py)

# PGGAN config (reference: configs/config.py:26-30)
pggan = True
grad_pen_lambda = 10          # Gradient-penalty weight
transit_sch = [25000, 50000, 75000, 100000, 125000]  # Epochs where transitions start
transit_period = None         # If set, overrides transit_sch with a fixed period
alpha_step = 0.0001           # Fade-in increment per epoch

# Training (reference: configs/config.py:33-49)
ID = uuid.uuid4().hex[:4]
samples_sub_dir = os.path.join(images_dir, '{}'.format(ID))
RMSprop = False
learning_rate = 0.0001
batch_size = 8
N_epochs = 150000
N_epochs_session = None      # Bound the number of epochs run in this session
beta1 = 0.5                  # Adam beta1 (beta2 fixed to 0.999, reference train.py:224)
sim_loss_lambda = 0.0
sim_loss_lambda_decay_rate = 0.0
drift_epsilon = 0.001
resume = False
N_workers = 2                # Accepted for CLI parity; the TPU pipeline is on-device
seed = 1
checkpointing_period = 100
device = 'default'           # 'tpu', 'cpu', or 'default' (auto-pick)
pin_memory = False           # Accepted for CLI parity; meaningless on TPU

# Dataset (reference: configs/config.py:52-55)
dataset_name = 'science_2022'
dataset_dir = os.path.join(data_dir, dataset_name)
translation = 0.05
image_preprocessing = 'cpu'  # parity knob: 'cpu' = shuffled epochs (reference
                             # DataLoader default), 'device' = sequential order
                             # (reference DatasetIterator). Augmentation always
                             # runs on-device here either way.
dataset_preload_limit_mb = 100  # processed stacks above this build into an
                                # on-disk memmap cache instead of RAM
                                # (reference NeuronDataset.py:74-82 preloads
                                # only under 100 MB)

# Architecture (reference: configs/config.py:58-63)
latent_dim = 512
image_size = 512
N_colors = 1
LeakyReLU_leak = 0.2
N_gen_features = [128, 64, 32, 32, 16, 16]
N_dis_features = [16, 16, 32, 32, 64, 128]

# TPU execution (new; no reference counterpart)
mesh_shape = None            # e.g. {'data': 8} or {'data': 4, 'model': 2}; None = single chip
compute_dtype = 'mixed'      # 'float32', 'bfloat16', or 'mixed' (bf16 activations,
                             # f32 stem/norm-stats/images/critic-head) model
                             # compute.  'mixed' promoted to default by a
                             # 6-seed 16->128 growth SWD A/B (mean paired
                             # diff -0.016 vs f32 seed spread 0.082, 4/6
                             # seeds better — BASELINE.md); +23% steps/s at
                             # 512^2.  'float32' restores reference-parity
                             # activations with one knob.
matmul_precision = 'default' # jax matmul precision for convs:
                             # 'default' = one bf16 pass per conv with f32
                             # accumulation (fastest; promoted after a
                             # 2-seed 2500-epoch 16->128 growth A/B showed
                             # no SWD quality difference vs 'highest' —
                             # BASELINE.md "precision A/B"), 'high' = 3
                             # bf16 passes (~1e-6 error), 'highest' = true
                             # f32 (bit-parity with the torch reference)
use_pallas = False           # Enable Pallas fused kernels where available
pallas_epilogue = None       # Pallas fused LeakyReLU+grouped-PixelNorm
                             # epilogue in PACKED blocks (GP-safe); None =
                             # auto, which resolves to OFF (measured slower
                             # than the einsum epilogue on hardware —
                             # BASELINE.md "Pallas fused epilogue");
                             # True/False force.  Disabled automatically under a
                             # multi-device mesh (opaque custom calls do
                             # not partition under auto-SPMD).
packed_min_res = 64          # Space-to-depth packed conv threshold: layers at
                             # >= this resolution run 2x2-packed (exact
                             # transform, 2.4x step speedup at 512^2 — see
                             # ops/packed.py). None disables.
packed_lanes = 128           # Lift 64-channel packed block convs to the
                             # full-lane 2x4 layout (128 channels) with
                             # native packed8 boundary kernels: +15.3%
                             # at 512^2 (29.6 vs 25.7 steps/s; BASELINE.md
                             # "native 2x4 boundary kernels"), promoted by
                             # the 6-seed stacked SWD study
                             # (logs/lanes_ab_r4.jsonl).  None/64 restores
                             # the 2x2 layout.
fast_augment = True          # Run the augmentation warp at phase resolution
                             # (resize moved to the front of the pipeline)
                             # instead of the reference's full-padded-res
                             # order (NeuronDataset.py:113-126).  The warp
                             # gather shrinks quadratically: 16..128 phases
                             # run 4-19x faster (BASELINE.md per-phase
                             # table).  Default after a 2-seed 16->128 SWD
                             # quality A/B showed no regression (fast was
                             # never worse); set False for the reference's
                             # exact augmentation distribution.
shear_warp = 'auto'          # Augmentation warp backend.  True: replace
                             # the point-gather affine warp with a 3-pass
                             # integer-shift SHEAR rotation (quarter turns
                             # stay exact pixel permutations) — ~2x faster
                             # warp on TPU at most phases (the warp was
                             # the single largest op in the step;
                             # BASELINE.md), but pixels round once per
                             # shear pass instead of once per point — a
                             # slightly different nearest-sampling
                             # distribution than torchvision RandomAffine,
                             # promoted by a 6-seed SWD quality A/B (mean
                             # paired difference 6.5x smaller than the
                             # baseline's own seed noise, 3/3 split, none
                             # outside the baseline's observed range —
                             # BASELINE.md; tools/ab_aggregate.py).
                             # False: the torchvision-exact gather warp.
                             # 'auto' (default): per-phase max(gather,
                             # shear) from the measured per-phase table —
                             # shear everywhere except the 32^2 phase,
                             # where the shear canvas overhead loses
                             # (train_step.resolve_shear).  Requires
                             # fast_augment (ignored when that is False).
gp_reuse_fakes = True        # Reuse the critic-loss fake batch for the
                             # gradient-penalty interpolates (the original
                             # WGAN-GP formulation, Gulrajani et al. 2017)
                             # instead of the reference's fresh draw per
                             # loss (loss_functions.py:166); saves one
                             # generator forward per critic step (~12% at
                             # 512^2).  Promoted to default by a 6-seed
                             # SWD A/B (mean paired diff +0.009 vs the
                             # fresh arm's own 0.118 seed spread, 3/3
                             # split, none catastrophic — BASELINE.md).
                             # Set False for the reference's fresh-latent
                             # GP draws.
hbm_budget_mb = 4096         # Device-memory budget for the raw image stack.
                             # Stacks above this stream from the host per
                             # epoch (double-buffered groups, bit-identical
                             # schedule/keys — neuron_gan_tpu/streaming.py)
                             # instead of living HBM-resident; lets datasets
                             # larger than device memory train, like the
                             # reference's per-item disk loading
                             # (NeuronDataset.py:128-146) but overlapped
                             # with compute.  0 disables streaming (always
                             # resident).
ema_beta = 0.0               # EMA decay for a shadow generator (0 disables; stretch goal)
donate_state = True          # Donate train-state buffers to jit (in-place update on device)
profile_dir = ''             # If set, capture a jax.profiler trace of one
                             # steady-state training chunk into this directory
                             # (view with TensorBoard / xprof)
swd_period = None            # Every N epochs, score 64 generated samples
                             # against the real set with multi-scale sliced
                             # Wasserstein distance (the PGGAN paper's
                             # metric; neuron_gan_tpu/metrics.py) at the
                             # current native resolution, append to
                             # logs_dir/SWD_<ID>.jsonl, and plot
                             # plots_dir/SWD_<ID>.png.  None (default)
                             # follows checkpointing_period — one 64-sample
                             # eval per checkpoint, noise next to a training
                             # chunk; 0 disables (the reference has no
                             # quality metric).

################################### END OF CONFIGURATION VARIABLES ###################################


def _is_knob(name, value):
    """A module-level binding is a config knob iff it has a public name and a
    plain value (dunders, imported modules, and functions are machinery)."""
    return not (name.startswith('__')
                or isinstance(value, (ModuleType, FunctionType)))


# Snapshot of every knob name -> default value, taken before the machinery
# below is defined. This is the whitelist user configs and CLI overrides are
# validated against (reference contract: configs/config.py:208-263).
configs_name = {n: v for n, v in list(globals().items()) if _is_knob(n, v)}


def define_ID_dependent_configs():
    """ID-keyed architecture lookup (reference: configs/config.py:84-109)."""
    global ID, N_gen_features, N_dis_features, samples_sub_dir
    assert ID != '', 'ID is not defined.'
    if ID in ['0004', '0005']:
        N_gen_features = [1024, 512, 256, 128, 64, 32, 16, 8]
        N_dis_features = [16, 32, 64, 128, 128, 128, 128]
    elif ID in ['0006']:
        N_gen_features = [512, 256, 128, 64, 32, 16, 8, 8]
        N_dis_features = [64, 128, 256, 256, 256, 128, 64]
    elif ID in ['0007']:
        N_gen_features = [512, 256, 128, 64, 32, 16]
        N_dis_features = [16, 32, 64, 128, 256, 512]
    elif ID in ['0008']:
        N_gen_features = [512, 256, 128, 64]
        N_dis_features = [64, 128, 256, 512]
    elif ID in ['0009']:
        N_gen_features = [32, 32, 32, 32, 16, 16]
        N_dis_features = [16, 16, 32, 32, 32, 32]
    elif ID in [str(i).rjust(4, '0') for i in range(10, 13)]:
        N_gen_features = [128, 64, 32, 32, 16, 16]
        N_dis_features = [16, 16, 32, 32, 64, 128]
    samples_sub_dir = os.path.join(images_dir, '{}'.format(ID))


def print_configs():
    print('Configurations:')
    module = sys.modules[__name__]
    for name in configs_name:
        print(f'{name}:', getattr(module, name))


def validate_configs(interactive=True):
    """Validation asserts + directory creation (reference: configs/config.py:120-200)."""
    global device, dataset_dir, images_dir, samples_sub_dir, weights_dir, plots_dir
    dataset_dir = os.path.abspath(dataset_dir)
    images_dir = os.path.abspath(images_dir)
    samples_sub_dir = os.path.abspath(samples_sub_dir)
    weights_dir = os.path.abspath(weights_dir)
    plots_dir = os.path.abspath(plots_dir)

    os.makedirs(images_dir, exist_ok=True)
    os.makedirs(weights_dir, exist_ok=True)
    os.makedirs(plots_dir, exist_ok=True)
    os.makedirs(logs_dir, exist_ok=True)

    # Samples sub-directory collision prompt (reference: configs/config.py:136-146)
    from neuron_gan_tpu.utils.io import validated_input
    import shutil
    if os.path.exists(samples_sub_dir) and not resume:
        if interactive:
            prompt = ('Samples directory already exists.\nSamples directory:{}\n'
                      'Erase and create a new directory(y/n)?'.format(samples_sub_dir))
            ans = validated_input(prompt, lambda x: x in ['y', 'n'], default='n')
            if ans == 'y':
                shutil.rmtree(samples_sub_dir)
                os.makedirs(samples_sub_dir, exist_ok=True)
    elif not os.path.exists(samples_sub_dir):
        os.makedirs(samples_sub_dir, exist_ok=True)

    # Default device: prefer TPU, fall back to whatever JAX has.
    if device == 'default':
        import jax
        device = jax.default_backend()  # 'tpu' or 'cpu'

    import math
    image_size_log = round(math.log2(image_size))
    assert image_size == 2 ** image_size_log, 'Image size must be a power of 2.'
    assert ID != '', 'The training ID is undefined.'
    assert compute_dtype in ('float32', 'bfloat16', 'mixed'), f'compute_dtype:{compute_dtype} is not supported.'
    assert hbm_budget_mb >= 0, 'hbm_budget_mb must be >= 0 (0 disables streaming).'
    assert shear_warp in (True, False, 'auto'), \
        f'shear_warp must be True, False or "auto"; got {shear_warp!r}.'
    assert packed_lanes in (None, 64, 128), \
        f'packed_lanes must be None, 64 or 128; got {packed_lanes!r}.'
    global swd_period
    if swd_period is None:  # auto: quality curve at checkpoint cadence
        swd_period = checkpointing_period
    assert swd_period >= 0, 'swd_period must be >= 0 (0 disables).'

    if pggan:
        global transit_sch, transit_period
        err_msg = 'The number of layers in the generator and discriminator must match.'
        assert len(N_gen_features) == len(N_dis_features), err_msg

        N_upsamples = len(N_gen_features) - 1
        image_size_initial = image_size // (2 ** N_upsamples)
        assert image_size_initial >= 4, 'The initial image size must be >= 4. Reduce the number of layers'

        if transit_period is not None:
            transit_sch = [i * transit_period for i in range(1, N_upsamples + 1)]

        err_msg = ('The number of transitions ({}) does not match the number of '
                   'convolution layers ({})'.format(len(transit_sch), N_upsamples))
        assert N_upsamples == len(transit_sch), err_msg
        assert N_epochs > transit_sch[-1], \
            'The number of epochs must be greater than the last resolution transition'

        N_transition_epochs = math.ceil(1 / alpha_step)
        diffs = [b - a for a, b in zip(transit_sch, transit_sch[1:])]
        err_msg = 'The transitions must be separated by at least {} epochs'.format(N_transition_epochs)
        assert all(d > N_transition_epochs for d in diffs), err_msg


define_ID_dependent_configs()


def _resolve_config_path(filename):
    """Normalize a user-config filename to an existing .py path.

    Relative names are searched in the package configs dir first, then in the
    caller's ./configs, so user projects can keep configs outside the
    installed package.
    """
    stem, ext = os.path.splitext(filename)
    if ext not in ('', '.py'):
        raise ValueError('Filename must be a .py file')
    filename = stem + '.py'
    if os.path.isabs(filename):
        candidates = [filename]
    else:
        candidates = [os.path.join(configs_dir, filename),
                      os.path.join(os.getcwd(), 'configs', filename)]
    for path in candidates:
        if os.path.exists(path):
            return path
    raise AssertionError(
        f'The configuration file {filename} does not exist in {configs_dir}')


def import_configs(filename, overwritten_configs=None, interactive=True):
    """Run a user config .py, validate its names, merge CLI overrides.

    Precedence: defaults < user config module < overwritten_configs
    (reference contract: configs/config.py:208-263; train.py:95-104).
    """
    overrides = dict(overwritten_configs or {})
    for name in overrides:
        if name not in configs_name:
            raise ValueError(f"The overwritten config '{name}' is not defined.")

    path = _resolve_config_path(filename)

    # Execute the user file in its own namespace and keep only knob bindings.
    import runpy
    user_ns = runpy.run_path(path)
    user_knobs = {}
    for name, value in user_ns.items():
        if not _is_knob(name, value):
            continue
        if name not in configs_name:
            raise ValueError(f"The imported config '{name}' is not defined.")
        user_knobs[name] = value

    user_knobs.update(overrides)  # explicit CLI flags win
    globals().update(user_knobs)

    # (samples_sub_dir is derived inside define_ID_dependent_configs)
    define_ID_dependent_configs()
    validate_configs(interactive=interactive)


if __name__ == '__main__':
    import_configs('config_ex.py')
    print_configs()
