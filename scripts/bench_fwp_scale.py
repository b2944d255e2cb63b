"""System-level forward-pass benchmark: disk -> chunk prep -> device
batches -> crop/stitch -> H5 writes, end to end, with streaming
(chunked_io) input reads.

Run: python scripts/bench_fwp_scale.py [s1 s2 t device_batch]

This measures the whole production path, not just device compute —
host chunk prep and output writes run on this box's single vCPU, so
the number is a lower bound for a real multi-core host.
"""

import json
import shutil
import sys
import tempfile
import time

import numpy as np

from sup3r_tpu.configs import get_config
from sup3r_tpu.models import Sup3rGan
from sup3r_tpu.pipeline import ForwardPass, ForwardPassStrategy
from sup3r_tpu.utilities.test_helpers import make_fake_nc4_file


def main(s1=60, s2=60, t=48, device_batch=8):
    tmp = tempfile.mkdtemp(prefix='fwp_scale_')
    try:
        print(f'domain ({s1}, {s2}, {t}) LR; building input...',
              flush=True)
        input_file = make_fake_nc4_file(
            f'{tmp}/input.nc', (s1, s2, t), ['u100', 'v100'],
            lat_range=(45.0, 39.0), lon_range=(-110.0, -104.0))

        model = Sup3rGan(get_config('spatiotemporal/gen_3x_4x_2f'),
                         get_config('spatiotemporal/disc_test'))
        model.meta.update(
            lr_features=['u_100m', 'v_100m'],
            hr_out_features=['u_100m', 'v_100m'],
            input_resolution={'spatial': '12km', 'temporal': '60min'})
        model.set_norm_stats({'u_100m': 0.5, 'v_100m': 0.5},
                             {'u_100m': 0.3, 'v_100m': 0.3})
        model.init_weights((1, 20, 20, 24, 2), (1, 60, 60, 96, 2))
        model_dir = f'{tmp}/model'
        model.save(model_dir)

        strategy = ForwardPassStrategy(
            file_paths=input_file,
            model_kwargs={'model_dir': model_dir},
            fwp_chunk_shape=(16, 16, 20), spatial_pad=2, temporal_pad=2,
            out_pattern=f'{tmp}/out/chunk_{{file_id}}.h5',
            device_batch_size=device_batch, chunked_io=True)
        n_chunks = strategy.fwp_slicer.n_chunks
        print(f'{n_chunks} chunks, device_batch={device_batch}',
              flush=True)
        t0 = time.perf_counter()
        ForwardPass.run(strategy, 0)
        dt = time.perf_counter() - t0
        hr_voxels = s1 * 3 * s2 * 3 * t * 4
        print(json.dumps({
            'metric': 'fwp_end_to_end_hr_voxels_per_sec',
            'value': round(hr_voxels / dt, 1),
            'unit': 'voxels/s',
            'wall_s': round(dt, 2),
            'n_chunks': n_chunks,
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == '__main__':
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
