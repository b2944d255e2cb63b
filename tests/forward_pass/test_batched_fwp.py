"""Device-batched chunk execution must match per-chunk execution."""

import numpy as np

from sup3r_tpu.pipeline import ForwardPass, ForwardPassStrategy
from sup3r_tpu.utilities.test_helpers import make_fake_nc_file
from tests.forward_pass.test_forward_pass import (
    _save_model,
    _st_gen_config,
)


def test_device_batched_matches_serial(tmp_path):
    input_file = make_fake_nc_file(str(tmp_path / 'input.nc'),
                                   (12, 12, 8), ['u100', 'v100'])
    model_dir, _ = _save_model(tmp_path, _st_gen_config(), 3, 4)
    kwargs = dict(
        file_paths=input_file,
        model_kwargs={'model_dir': model_dir},
        fwp_chunk_shape=(6, 6, 4),
        spatial_pad=1, temporal_pad=1,
        out_pattern=None)
    serial = ForwardPass.run(ForwardPassStrategy(**kwargs), 0)
    batched = ForwardPass.run(
        ForwardPassStrategy(**kwargs, device_batch_size=4), 0)
    assert set(serial) == set(batched)
    for idx in serial:
        np.testing.assert_allclose(batched[idx], serial[idx],
                                   atol=1e-4)


def test_mesh_sharded_chunk_batch(tmp_path):
    """use_mesh shards the chunk batch over all (8 virtual) devices
    and matches the unsharded result."""
    import jax

    assert jax.device_count() >= 8
    input_file = make_fake_nc_file(str(tmp_path / 'input.nc'),
                                   (12, 12, 12), ['u100', 'v100'])
    model_dir, _ = _save_model(tmp_path, _st_gen_config(), 3, 4)
    kwargs = dict(
        file_paths=input_file,
        model_kwargs={'model_dir': model_dir},
        fwp_chunk_shape=(6, 6, 4),
        spatial_pad=1, temporal_pad=1,
        out_pattern=None)
    serial = ForwardPass.run(ForwardPassStrategy(**kwargs), 0)
    sharded = ForwardPass.run(
        ForwardPassStrategy(**kwargs, device_batch_size=16,
                            use_mesh=True), 0)
    assert set(serial) == set(sharded)
    for idx in serial:
        np.testing.assert_allclose(sharded[idx], serial[idx],
                                    atol=1e-4)


def test_exo_chunks_are_batched(tmp_path):
    """Chunks with exogenous rasters go through the device-batched path
    and match per-chunk execution exactly."""
    from sup3r_tpu.utilities.test_helpers import (
        make_fake_h5_file,
        make_fake_nc_file,
    )

    input_file = make_fake_nc_file(str(tmp_path / 'in.nc'), (12, 12, 4),
                                   ['u100', 'v100'])
    topo_file = make_fake_h5_file(str(tmp_path / 'topo.h5'),
                                  (24, 24, 2), ['topography'])
    from sup3r_tpu.models import Sup3rGan

    features = ['u_100m', 'v_100m']
    gen = [{'class': 'Conv3D', 'filters': 8, 'kernel_size': 3,
            'strides': 1, 'padding': 'same'},
           {'class': 'SpatioTemporalExpansion', 'spatial_mult': 2},
           {'class': 'Sup3rConcat', 'name': 'topography'},
           {'class': 'Conv3D', 'filters': 2, 'kernel_size': 3,
            'strides': 1, 'padding': 'same'}]
    disc = [{'class': 'Conv3D', 'filters': 4, 'kernel_size': 3,
             'strides': 2, 'padding': 'same'},
            {'class': 'Flatten'}, {'class': 'Dense', 'units': 1}]
    model = Sup3rGan(gen, disc)
    model.meta.update(lr_features=features, hr_out_features=features,
                      hr_exo_features=['topography'],
                      s_enhance=2, t_enhance=1,
                      input_resolution={'spatial': '12km',
                                        'temporal': '60min'})
    model.set_norm_stats({f: 0.1 for f in features},
                         {f: 0.9 for f in features})
    model.init_weights((1, 6, 6, 4, 2), (1, 12, 12, 4, 3))
    model_dir = str(tmp_path / 'model')
    model.save(model_dir)

    def make(batch_size):
        return ForwardPassStrategy(
            file_paths=input_file,
            model_kwargs={'model_dir': model_dir},
            fwp_chunk_shape=(6, 6, 4), spatial_pad=1, temporal_pad=0,
            exo_handler_kwargs={'topography': {
                'source_file': topo_file,
                'cache_dir': str(tmp_path / f'exo{batch_size}')}},
            out_pattern=None, device_batch_size=batch_size)

    strat_b = make(4)
    fp = ForwardPass(strat_b)
    chunks = [fp.get_input_chunk(i) for i in range(4)]
    assert all(c.exo_data is not None for c in chunks)
    dispatched = fp._dispatch_chunk_batch(chunks)
    assert dispatched is not None, 'exo chunks must batch'
    out_batched = fp._drain_chunk_batch(chunks, dispatched)

    strat_1 = make(1)
    fp1 = ForwardPass(strat_1)
    for idx in range(4):
        _, single = fp1.run_chunk(fp1.get_input_chunk(idx))
        np.testing.assert_allclose(out_batched[idx], single,
                                   rtol=1e-5, atol=1e-6)


def test_mesh_sharded_packed_drain_files(tmp_path):
    """use_mesh (chunk fan-out over 8 virtual devices) composes with
    the device-packed H5 drain: the packed files match the unsharded
    host-transform files at the storage quantum."""
    import glob
    import os

    import h5py
    import jax

    assert jax.device_count() >= 8
    input_file = make_fake_nc_file(str(tmp_path / 'input.nc'),
                                   (12, 12, 12), ['u100', 'v100'])
    model_dir, _ = _save_model(tmp_path, _st_gen_config(), 3, 4)

    def run(sub, **extra):
        out_dir = tmp_path / sub
        strat = ForwardPassStrategy(
            file_paths=input_file,
            model_kwargs={'model_dir': model_dir},
            fwp_chunk_shape=(6, 6, 4), spatial_pad=1, temporal_pad=1,
            out_pattern=str(out_dir / 'chunk_{file_id}.h5'), **extra)
        ForwardPass.run(strat, 0)
        return sorted(glob.glob(str(out_dir / 'chunk_*.h5')))

    host_files = run('host', device_batch_size=4,
                     pack_output_on_device=False)
    mesh_files = run('mesh', device_batch_size=16, use_mesh=True,
                     pack_output_on_device=True)
    assert len(host_files) == len(mesh_files) > 0
    for hf, mf in zip(host_files, mesh_files):
        assert os.path.basename(hf) == os.path.basename(mf)
        with h5py.File(hf) as fh, h5py.File(mf) as fm:
            assert set(fh) == set(fm)
            for k in fh:
                if k in ('meta', 'time_index'):
                    continue
                a = fh[k][:].astype(np.int64)
                b = fm[k][:].astype(np.int64)
                diff = np.abs(a - b)
                assert diff.max() <= 1, (k, diff.max())
