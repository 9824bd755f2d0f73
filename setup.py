#!/usr/bin/env python
"""Asset bootstrap — same interface as the reference's setup.py.

    python setup.py

Creates the data/images/weights/plots directories and interactively offers to
download the training dataset (science_2022.zip) and pretrained weights
(gen_dis_default.pth inside weights_default.zip) from the reference's Google
Drive links (reference setup.py:46-87; prompts and asset URLs are interface
parity).  Downloads are skipped automatically in non-interactive runs.
"""

import os
import zipfile
from dataclasses import dataclass
from urllib.request import urlretrieve

from neuron_gan_tpu.configs import config
from neuron_gan_tpu.utils import validated_input

_GDRIVE = 'https://drive.google.com/uc?export=download&id={}'


@dataclass(frozen=True)
class Asset:
    """One downloadable archive: where it comes from, where it lands, and
    what existing path means it is already installed."""
    prompt: str          # initial y/n question
    reprompt: str        # confirmation when already installed
    drive_id: str
    archive: str         # local zip path (removed after extraction)
    installed_at: str    # if this exists, confirm before re-downloading

    def wanted(self) -> bool:
        yn = lambda ans: ans in ('y', 'n')
        if validated_input(self.prompt, yn, default='n') != 'y':
            return False
        if os.path.exists(self.installed_at):
            return validated_input(self.reprompt, yn, default='n') == 'y'
        return True

    def install(self):
        print(f'Downloading {self.archive}')
        urlretrieve(_GDRIVE.format(self.drive_id), self.archive)
        print('Download complete')
        print(f'Extracting {self.archive}')
        with zipfile.ZipFile(self.archive) as zf:
            zf.extractall(os.path.dirname(self.archive) or '.')
        os.remove(self.archive)
        print('Extraction complete')


def main():
    for d in (config.data_dir, config.images_dir, config.weights_dir,
              config.plots_dir):
        os.makedirs(d, exist_ok=True)

    assets = (
        Asset(prompt='Download training dataset? (y/n)',
              reprompt='The training dataset already exists. Re-download dataset? (y/n)',
              drive_id='10Aqv57jU1RPsf2duOPHJe2asc6HYHOGc',
              archive=os.path.join(config.data_dir, 'science_2022.zip'),
              installed_at=config.dataset_dir),
        Asset(prompt='Download network weights? (y/n)',
              reprompt='The weights file already exists. Re-download weights? (y/n)',
              drive_id='12oYbsfjyvYR_MosDfzhPjuEwZcF5LrF3',
              archive=os.path.join(config.weights_dir, 'weights_default.zip'),
              installed_at=os.path.join(config.weights_dir,
                                        'gen_dis_default.pth')),
    )
    for asset in assets:
        if asset.wanted():
            asset.install()
    print('Setup complete')


if __name__ == '__main__':
    main()
