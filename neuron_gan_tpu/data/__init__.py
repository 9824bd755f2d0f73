from neuron_gan_tpu.data.neuron_dataset import NeuronDataset, threshold_multiotsu  # noqa: F401
from neuron_gan_tpu.data.augment import augment_batch, AugmentSpec  # noqa: F401
