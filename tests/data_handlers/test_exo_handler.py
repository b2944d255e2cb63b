"""ExoDataHandler step inference + enhancement bookkeeping + ExoData
chunk slicing (reference: tests/rasterizers/test_exo.py +
data_handlers/exo.py behaviors)."""

import numpy as np

from sup3r_tpu.preprocessing.exo import ExoData, ExoDataHandler
from sup3r_tpu.utilities.test_helpers import (
    make_fake_h5_file,
    make_fake_nc_file,
)


class _FakeModel:
    def __init__(self, s, t, lr, hr_exo=(), out=()):
        self.s_enhance = s
        self.t_enhance = t
        self.lr_features = list(lr)
        self.hr_exo_features = list(hr_exo)
        self.hr_out_features = list(out)
        self.obs_features = []


def test_get_exo_steps_multistep():
    """topography consumed as LR input of step 0, mid-network exo of
    both steps -> input + layer + layer records."""
    m0 = _FakeModel(2, 1, ['u_100m', 'topography'],
                    hr_exo=['topography'], out=['u_100m'])
    m1 = _FakeModel(3, 4, ['u_100m'], hr_exo=['topography'],
                    out=['u_100m'])
    steps = ExoDataHandler.get_exo_steps('topography', [m0, m1])
    assert steps == [
        {'model': 0, 'combine_type': 'input'},
        {'model': 0, 'combine_type': 'layer'},
        {'model': 1, 'combine_type': 'layer'},
    ]


def test_exo_handler_enhancement_products(tmp_path):
    """input steps use enhancement up to (not incl.) the model; layer
    steps include the model's own enhancement."""
    fp = make_fake_nc_file(str(tmp_path / 'in.nc'), (8, 8, 2),
                           ['u100'])
    src = make_fake_h5_file(str(tmp_path / 'topo.h5'), (16, 16, 2),
                            ['topography'])
    m0 = _FakeModel(2, 1, ['u_100m', 'topography'],
                    hr_exo=['topography'], out=['u_100m'])
    m1 = _FakeModel(3, 4, ['u_100m'], hr_exo=['topography'],
                    out=['u_100m'])

    class _Multi:
        models = [m0, m1]

    handler = ExoDataHandler(fp, 'topography', model=_Multi(),
                             source_file=src,
                             cache_dir=str(tmp_path / 'cache'))
    steps = handler.data['topography']['steps']
    assert [(s['s_enhance'], s['t_enhance']) for s in steps] == [
        (1, 1), (2, 1), (6, 4)]
    # raster shapes follow the enhancements (time-invariant topo: 3D)
    assert steps[0]['data'].shape[:2] == (8, 8)
    assert steps[1]['data'].shape[:2] == (16, 16)
    assert steps[2]['data'].shape[:2] == (48, 48)
    assert np.isfinite(steps[0]['data']).all()


def test_exo_data_chunking(tmp_path):
    """get_chunk windows each step raster by its enhancement factors."""
    arr0 = np.zeros((8, 8, 4, 1), dtype=np.float32)
    arr1 = np.zeros((16, 16, 8, 1), dtype=np.float32)
    exo = ExoData({'topography': {'steps': [
        {'model': 0, 'combine_type': 'input', 's_enhance': 1,
         't_enhance': 1, 'data': arr0},
        {'model': 0, 'combine_type': 'layer', 's_enhance': 2,
         't_enhance': 2, 'data': arr1},
    ]}})
    chunk = exo.get_chunk([slice(2, 6), slice(0, 4), slice(1, 3)])
    s0 = chunk['topography']['steps'][0]['data']
    s1 = chunk['topography']['steps'][1]['data']
    assert s0.shape == (4, 4, 2, 1)
    assert s1.shape == (8, 8, 4, 1)


def test_exo_data_model_split():
    """split() routes steps to per-model ExoData for MultiStepGan."""
    exo = ExoData({'topography': {'steps': [
        {'model': 0, 'combine_type': 'input', 's_enhance': 1,
         't_enhance': 1, 'data': np.zeros((4, 4, 2, 1))},
        {'model': 1, 'combine_type': 'layer', 's_enhance': 2,
         't_enhance': 1, 'data': np.zeros((8, 8, 2, 1))},
    ]}})
    split = exo.split(split_steps=[1])
    assert len(split) == 2
    assert len(split[0]['topography']['steps']) == 1
    assert split[0]['topography']['steps'][0]['combine_type'] == 'input'
    assert len(split[1]['topography']['steps']) == 1
    assert split[1]['topography']['steps'][0]['combine_type'] == 'layer'
