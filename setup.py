#!/usr/bin/env python
"""Asset bootstrap — same interface as the reference's setup.py.

    python setup.py

Creates the data/images/weights/plots directories and interactively offers to
download the training dataset (science_2022.zip) and pretrained weights
(gen_dis_default.pth inside weights_default.zip) from the reference's Google
Drive links (reference setup.py:46-87; prompts and asset URLs are interface
parity).  Downloads are skipped automatically in non-interactive runs.
"""

import html
import os
import re
import zipfile
from dataclasses import dataclass
from urllib.parse import urlencode
from urllib.request import urlretrieve

from neuron_gan_tpu.configs import config
from neuron_gan_tpu.utils import validated_input

_GDRIVE = 'https://drive.google.com/uc?export=download&id={}'


def gdrive_download(drive_id: str, dest: str, fetch=urlretrieve):
    """Download a Google Drive file, following the large-file handshake.

    For files past Drive's virus-scan size limit the first request returns
    an HTML interstitial ("can't scan for viruses — download anyway?")
    instead of the payload; the real download URL is the interstitial's
    form action plus its hidden inputs (id/confirm/uuid).  A plain
    urlretrieve would silently save that HTML as the archive and the
    zipfile extraction would fail on it.
    """
    fetch(_GDRIVE.format(drive_id), dest)
    with open(dest, 'rb') as fh:
        head = fh.read(1024)
    if not head.lstrip()[:15].lower().startswith((b'<!doctype', b'<html')):
        return  # got the payload directly (small file)
    with open(dest, encoding='utf-8', errors='replace') as fh:
        page = fh.read()
    action = re.search(r'<form[^>]*action="([^"]+)"', page)
    if not action:
        raise RuntimeError(
            'Google Drive returned an HTML page with no download form — '
            'the file may be unavailable or the quota exceeded.')
    params = dict(re.findall(r'name="([^"]+)"\s+value="([^"]*)"', page))
    url = html.unescape(action.group(1))
    if params:
        url += ('&' if '?' in url else '?') + urlencode(params)
    fetch(url, dest)


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
        gdrive_download(self.drive_id, self.archive)
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
