"""A/B the device-packed output drain (ops/output_pack.py) against
the host transform path on the real chip: same domain, warm compile
cache, pack_output_on_device True vs False.

Run: python scripts/bench_pack_drain.py [s1 s2 t device_batch]

The drain (device->host fetch + output transform + H5 writes) is the
dominant E2E cost (docs/PERFORMANCE.md three-tier attribution), so
this is THE system-level lever: packed fetches move cropped
int16/uint16 writer-layout bytes instead of the full padded float32
block, and the host skips the u/v inversion + limits + quantization
entirely.
"""

import json
import shutil
import sys
import tempfile
import time

from sup3r_tpu.configs import get_config
from sup3r_tpu.models import Sup3rGan
from sup3r_tpu.pipeline import ForwardPass, ForwardPassStrategy
from sup3r_tpu.utilities.test_helpers import make_fake_nc4_file


def main(s1=40, s2=40, t=40, device_batch=8):
    tmp = tempfile.mkdtemp(prefix='pack_drain_')
    try:
        input_file = make_fake_nc4_file(
            f'{tmp}/input.nc', (s1, s2, t), ['u100', 'v100'],
            lat_range=(45.0, 42.0), lon_range=(-110.0, -107.0))
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
        hr_voxels = s1 * 3 * s2 * 3 * t * 4

        def run_once(tag, pack):
            strategy = ForwardPassStrategy(
                file_paths=input_file,
                model_kwargs={'model_dir': model_dir},
                fwp_chunk_shape=(16, 16, 20), spatial_pad=2,
                temporal_pad=2,
                out_pattern=f'{tmp}/out{tag}/chunk_{{file_id}}.h5',
                device_batch_size=device_batch, chunked_io=True,
                pack_output_on_device=pack)
            t0 = time.perf_counter()
            ForwardPass.run(strategy, 0)
            return time.perf_counter() - t0

        results = {}
        for pack in (False, True):
            run_once(f'_warm{pack}', pack)  # compile cache
            dts = [run_once(f'_{pack}_{i}', pack) for i in range(2)]
            dt = min(dts)
            results['packed' if pack else 'host'] = {
                'wall_s': round(dt, 2),
                'hr_voxels_per_sec': round(hr_voxels / dt, 1),
            }
        results['speedup'] = round(
            results['packed']['hr_voxels_per_sec']
            / results['host']['hr_voxels_per_sec'], 3)
        print(json.dumps(results))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == '__main__':
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
