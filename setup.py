#!/usr/bin/env python
"""Asset bootstrap — same interface as the reference's setup.py:46-87.

    python setup.py

Creates the data/images/weights/plots directories and interactively offers to
download the training dataset (science_2022.zip) and pretrained weights
(gen_dis_default.pth inside weights_default.zip) from the reference's Google
Drive links.  Downloads are skipped automatically in non-interactive runs.
"""

import functools
import os
import zipfile
from urllib.request import urlretrieve

from neuron_gan_tpu.configs import config
from neuron_gan_tpu.utils import validated_input


def logger(action):
    def decorator(func):
        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            filename = args[0]
            if action == 'download':
                print(f'Downloading {filename}')
            elif action == 'extract':
                print(f'Extracting {filename}')
            func_val = func(*args, **kwargs)
            print(f'{action.capitalize()} complete')
            return func_val
        return wrapper
    return decorator


@logger('download')
def download(filename, url):
    urlretrieve(url, filename)


@logger('extract')
def extract(filename):
    file_dir = os.path.join(filename, os.path.pardir)
    with zipfile.ZipFile(filename, 'r') as zip_ref:
        zip_ref.extractall(file_dir)
    os.remove(filename)


if __name__ == '__main__':
    dataset_dir = config.dataset_dir
    os.makedirs(config.data_dir, exist_ok=True)
    os.makedirs(config.images_dir, exist_ok=True)
    os.makedirs(config.weights_dir, exist_ok=True)
    os.makedirs(config.plots_dir, exist_ok=True)

    ans_validator = lambda x: x in ['y', 'n']
    download_data = validated_input('Download training dataset? (y/n)',
                                    ans_validator, default='n')
    if download_data == 'y' and os.path.exists(dataset_dir):
        download_data = validated_input(
            'The training dataset already exists. Re-download dataset? (y/n)',
            ans_validator, default='n')

    if download_data == 'y':
        dataset_url = ('https://drive.google.com/uc?export=download&'
                       'id=10Aqv57jU1RPsf2duOPHJe2asc6HYHOGc')
        dataset_zip = os.path.join(config.data_dir, 'science_2022.zip')
        download(dataset_zip, dataset_url)
        extract(dataset_zip)

    download_w = validated_input('Download network weights? (y/n)',
                                 ans_validator, default='n')
    weights_filepath = os.path.join(config.weights_dir, 'gen_dis_default.pth')
    if download_w == 'y' and os.path.exists(weights_filepath):
        download_w = validated_input(
            'The weights file already exists. Re-download weights? (y/n)',
            ans_validator, default='n')

    if download_w == 'y':
        weights_url = ('https://drive.google.com/uc?export=download&'
                       'id=12oYbsfjyvYR_MosDfzhPjuEwZcF5LrF3')
        weights_zip = os.path.join(config.weights_dir, 'weights_default.zip')
        download(weights_zip, weights_url)
        extract(weights_zip)

    print('Setup complete')
