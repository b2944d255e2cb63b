"""Regressions from the round-4 self-review: writeable returned
arrays, the per-chunk pack gate's forced-True contract, and the
SUP3R_TPU_EXO_CACHE_DIR env hook surviving out_pattern defaults."""

import os

import numpy as np
import pytest

from sup3r_tpu.pipeline import ForwardPass, ForwardPassStrategy
from sup3r_tpu.utilities.test_helpers import make_fake_nc_file
from tests.forward_pass.test_forward_pass import (
    _save_model,
    _st_gen_config,
)


def test_run_chunk_arrays_are_writeable(tmp_path):
    """out_pattern=None returns arrays callers may post-process in
    place; np.asarray of the device output can be a read-only view
    (CLAUDE.md gotcha) and must be copied."""
    input_file = make_fake_nc_file(str(tmp_path / 'input.nc'),
                                   (12, 12, 8), ['u100', 'v100'])
    model_dir, _ = _save_model(tmp_path, _st_gen_config(), 3, 4)
    outputs = ForwardPass.run(ForwardPassStrategy(
        file_paths=input_file, model_kwargs={'model_dir': model_dir},
        fwp_chunk_shape=(6, 6, 4), spatial_pad=1, temporal_pad=1,
        out_pattern=None), 0)
    for idx, arr in outputs.items():
        assert arr.flags.writeable, f'chunk {idx} is read-only'
        arr[..., 0] = 0.0  # must not raise


def test_pack_force_raises_on_per_chunk_path(tmp_path):
    """pack_output_on_device=True must fail loudly on the PER-CHUNK
    (device_batch_size=1) path too, not silently run the host
    transform — NC output cannot pack."""
    input_file = make_fake_nc_file(str(tmp_path / 'input.nc'),
                                   (12, 12, 8), ['u100', 'v100'])
    model_dir, _ = _save_model(tmp_path, _st_gen_config(), 3, 4)
    strat = ForwardPassStrategy(
        file_paths=input_file, model_kwargs={'model_dir': model_dir},
        fwp_chunk_shape=(6, 6, 4), spatial_pad=1, temporal_pad=1,
        out_pattern=str(tmp_path / 'out_{file_id}.nc'),
        pack_output_on_device=True)
    with pytest.raises(RuntimeError, match='cannot pack'):
        ForwardPass.run(strat, 0)


def test_exo_cache_env_overrides_out_pattern_default(tmp_path,
                                                     monkeypatch):
    """A user-pinned SUP3R_TPU_EXO_CACHE_DIR (shared exo cache across
    runs) must win over the per-run <out dir>/exo_cache default
    (topography rasters cache to disk; sza never does)."""
    from sup3r_tpu.models import SurfaceSpatialMetModel
    from sup3r_tpu.utilities.test_helpers import make_fake_h5_file

    shared = tmp_path / 'shared_exo'
    monkeypatch.setenv('SUP3R_TPU_EXO_CACHE_DIR', str(shared))
    features = ['temperature_2m', 'relativehumidity_2m']
    input_file = make_fake_nc_file(str(tmp_path / 'met.nc'),
                                   (8, 8, 4), features)
    topo_file = make_fake_h5_file(
        str(tmp_path / 'topo.h5'), (40, 40, 2), ['windspeed_10m'],
        lat_range=(40.2, 38.8), lon_range=(-105.7, -104.1))
    surf = SurfaceSpatialMetModel(features, s_enhance=2)
    sdir = str(tmp_path / 'surf')
    surf.save(sdir)
    out_dir = tmp_path / 'run_out'
    strategy = ForwardPassStrategy(
        file_paths=input_file,
        model_class='SurfaceSpatialMetModel',
        model_kwargs={'model_dir': sdir},
        fwp_chunk_shape=(8, 8, 4), spatial_pad=0, temporal_pad=0,
        exo_handler_kwargs={'topography': {'source_file': topo_file}},
        out_pattern=str(out_dir / 'out_{file_id}.h5'))
    assert strategy.exo_data is not None
    assert shared.is_dir() and any(os.scandir(shared)), (
        'exo cache did not land in SUP3R_TPU_EXO_CACHE_DIR')
    assert not (out_dir / 'exo_cache').exists(), (
        'per-run default overrode the env-pinned shared cache')
