"""Build the native preprocessing library:  python -m neuron_gan_tpu.runtime.build"""

import os
import subprocess
import sys


def build(verbose=True):
    here = os.path.dirname(__file__)
    src = os.path.join(here, 'preproc.cpp')
    out = os.path.join(here, 'libngpreproc.so')
    cmd = ['g++', '-O3', '-shared', '-fPIC', '-std=c++17', src, '-o', out]
    if verbose:
        print(' '.join(cmd))
    subprocess.run(cmd, check=True)
    return out


if __name__ == '__main__':
    path = build()
    print(f'built {path}')
    from neuron_gan_tpu.runtime import native_available
    sys.exit(0 if native_available() else 1)
