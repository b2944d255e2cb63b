"""Device-side output packing (ops/output_pack.py): the batched drain
crops, u/v-inverts, clips and storage-quantizes ON DEVICE, fetching
cropped integer bytes. Must match the host writer path to the storage
quantum (reference transform semantics:
sup3r/postprocessing/writers/base.py:232-346 +
sup3r/utilities/utilities.py:155)."""

import glob
import os

import h5py
import numpy as np
import pytest

from sup3r_tpu.ops.output_pack import (
    _quantize,
    pack_chunks,
    pack_plan,
    theta_for,
)
from sup3r_tpu.pipeline import ForwardPass, ForwardPassStrategy
from sup3r_tpu.postprocessing.writers import OutputHandlerH5
from sup3r_tpu.utilities.test_helpers import make_fake_nc_file
from sup3r_tpu.utilities.utilities import get_dset_attrs
from tests.forward_pass.test_forward_pass import (
    _save_model,
    _st_gen_config,
)

RNG = np.random.default_rng(42)


def _host_pack(data, features, lat_lon, invert_uv=True):
    """The host reference: writer transform + quantization exactly as
    OutputHandlerH5._write_output does it."""
    d, names = OutputHandlerH5._transform_output(
        data.copy(), list(features), lat_lon, max_workers=1,
        invert_uv=invert_uv)
    s1, s2, t = d.shape[:3]
    arrays = []
    for i, f in enumerate(names):
        attrs, dtype = get_dset_attrs(f)
        flat = d[..., i].reshape(s1 * s2, t).T
        scale = attrs.get('scale_factor', 1.0)
        arrays.append(np.round(flat * scale).astype(dtype)
                      if 'int' in str(dtype) else flat.astype(dtype))
    return names, arrays


def _grid(s1, s2, descending=True):
    lats = (np.linspace(40, 39, s1) if descending
            else np.linspace(39, 40, s1))
    return np.dstack(np.meshgrid(
        lats, np.linspace(-105, -104, s2),
        indexing='ij')).astype(np.float32)


def test_pack_plan_names_pairs_quant():
    names, pairs, quant = pack_plan(['u_100m', 'v_100m'], True)
    assert names == ('windspeed_100m', 'winddirection_100m')
    assert pairs == ((0, 1),)
    assert quant[0][0] == 'uint16' and quant[0][1] == 100.0
    # raw-write mode keeps u/v (int16 storage)
    names, pairs, quant = pack_plan(['u_100m', 'v_100m'], False)
    assert names == ('u_100m', 'v_100m') and pairs == ()
    assert quant[0][0] == 'int16'
    with pytest.raises(KeyError, match='physical limits'):
        pack_plan(['not_a_feature'], True)


def test_pack_plan_unresolvable_uv_is_loud():
    """u-like features that don't resolve to a canonical u_{h}m/v_{h}m
    pair must raise, not silently write raw u/v columns — the same
    loud outcome as the reference's features.index() calls
    (reference writers/base.py:217-227)."""
    # missing v partner
    with pytest.raises(ValueError, match='pair'):
        pack_plan(['u_100m', 'temperature_2m'], True)
    # non-lowercase spelling
    with pytest.raises(ValueError, match='pair'):
        pack_plan(['U_100m', 'v_100m'], True)
    # decimal hub height (reference: parse_feature height regex
    # doesn't match, then index('u_Nonem') raises)
    with pytest.raises(ValueError, match='pair'):
        pack_plan(['u_2.5m', 'v_2.5m'], True)
    # invert_uv=False never inspects pairs: raw writes stay permissive
    names, pairs, _ = pack_plan(['u_100m', 'temperature_2m'], False)
    assert pairs == () and names == ('u_100m', 'temperature_2m')


def test_get_renamed_features_unresolvable_uv_is_loud():
    from sup3r_tpu.postprocessing.writers import OutputHandler

    assert OutputHandler.get_renamed_features(
        ['u_10m', 'v_10m', 'topography']) == [
        'windspeed_10m', 'winddirection_10m', 'topography']
    with pytest.raises(ValueError, match='pair'):
        OutputHandler.get_renamed_features(['u_10m'])


def test_quantize_in_range_matches_numpy():
    import jax.numpy as jnp

    x = (RNG.random(2000).astype(np.float32) * 240 - 120)
    for dt, scale in [('int16', 100.0), ('uint16', 100.0)]:
        xc = np.clip(x, 0 if dt == 'uint16' else -120, 120)
        got = np.asarray(_quantize(jnp.asarray(xc), dt, scale, jnp))
        want = np.round(xc * scale).astype(dt)
        np.testing.assert_array_equal(got, want)
    # float32 passthrough
    got = np.asarray(_quantize(jnp.asarray(x), 'float32', 1.0, jnp))
    np.testing.assert_array_equal(got, x)


@pytest.mark.parametrize('descending', [True, False])
def test_pack_chunks_parity_uv(descending):
    """Device pack vs host transform+quantize, both lat orientations.
    Inverted features ride device trig, so allow the documented +-1
    storage-quantum flips at round() boundaries (rare)."""
    import jax.numpy as jnp

    n, s1, s2, t = 3, 8, 6, 5
    data = (RNG.random((n, s1, s2, t, 2)).astype(np.float32) * 30
            - 15)
    lat_lon = _grid(s1, s2, descending)
    invert_lat = bool(lat_lon[-1, 0, 0] > lat_lon[0, 0, 0])
    assert invert_lat == (not descending)
    names, pairs, quant = pack_plan(['u_100m', 'v_100m'], True)
    theta = theta_for(lat_lon, invert_lat)
    packed, stats = pack_chunks(
        jnp.asarray(data), jnp.asarray(np.stack([theta] * n)),
        pairs, quant, invert_lat)
    assert not np.asarray(stats['nan_any']).any()
    assert not np.asarray(stats['ch_const']).any()
    for j in range(n):
        want_names, want = _host_pack(data[j], ['u_100m', 'v_100m'],
                                      lat_lon)
        assert list(want_names) == list(names)
        for k in range(len(names)):
            got = np.asarray(packed[k][j]).astype(np.int64)
            ref = want[k].astype(np.int64)
            diff = np.abs(got - ref)
            assert diff.max() <= 1, (names[k], diff.max())
            assert (diff != 0).mean() < 0.02, names[k]


def test_pack_chunks_exact_without_inversion():
    """Raw u/v writes involve no device trig — clip + quantize must be
    BIT-exact vs the host path."""
    import jax.numpy as jnp

    n, s1, s2, t = 2, 6, 6, 4
    data = (RNG.random((n, s1, s2, t, 2)).astype(np.float32) * 300
            - 150)  # deliberately outside the +-120 limits -> clip
    lat_lon = _grid(s1, s2)
    names, pairs, quant = pack_plan(['u_100m', 'v_100m'], False)
    theta = theta_for(lat_lon, False)
    with pytest.warns(UserWarning, match='physical range'):
        for j in range(n):
            want_names, want = _host_pack(
                data[j], ['u_100m', 'v_100m'], lat_lon,
                invert_uv=False)
    packed, _ = pack_chunks(
        jnp.asarray(data), jnp.asarray(np.stack([theta] * n)),
        pairs, quant, False)
    for j in range(n):
        _, want = _host_pack(data[j], ['u_100m', 'v_100m'], lat_lon,
                             invert_uv=False)
        for k in range(len(names)):
            np.testing.assert_array_equal(
                np.asarray(packed[k][j]), want[k])


def test_packed_stats_checks():
    """NaN / exactly-constant channels surface through the device
    stats and raise like _output_check."""
    import jax.numpy as jnp

    n, s1, s2, t = 1, 4, 4, 3
    data = np.ones((n, s1, s2, t, 2), dtype=np.float32)
    data[..., 1] = RNG.random((n, s1, s2, t))
    lat_lon = _grid(s1, s2)
    names, pairs, quant = pack_plan(['u_100m', 'v_100m'], False)
    theta = jnp.asarray(np.stack([theta_for(lat_lon, False)] * n))
    _, stats = pack_chunks(jnp.asarray(data), theta, pairs, quant,
                           False)
    stats = {k: np.asarray(v) for k, v in stats.items()}
    assert stats['ch_const'][0, 0] and not stats['ch_const'][0, 1]
    assert stats['ch_first'][0, 0] == 1.0
    with pytest.raises(MemoryError, match='constant'):
        ForwardPass._check_packed_stats(stats, 0, False)
    ForwardPass._check_packed_stats(stats, 0, [1.0])  # allowed
    ForwardPass._check_packed_stats(stats, 0, True)  # all allowed
    data[0, 0, 0, 0, 1] = np.nan
    _, stats = pack_chunks(jnp.asarray(data), theta, pairs, quant,
                           False)
    stats = {k: np.asarray(v) for k, v in stats.items()}
    with pytest.raises(MemoryError, match='NaN'):
        ForwardPass._check_packed_stats(stats, 0, True)


def test_packed_drain_matches_host_files(tmp_path):
    """End to end: device-batched forward pass writing H5 chunk files
    through the packed drain vs the host transform path — every
    dataset within one storage quantum, meta/time identical."""
    input_file = make_fake_nc_file(str(tmp_path / 'input.nc'),
                                   (12, 12, 8), ['u100', 'v100'])
    model_dir, _ = _save_model(tmp_path, _st_gen_config(), 3, 4)

    def run(sub, pack):
        out_dir = tmp_path / sub
        strat = ForwardPassStrategy(
            file_paths=input_file,
            model_kwargs={'model_dir': model_dir},
            fwp_chunk_shape=(6, 6, 4), spatial_pad=1, temporal_pad=1,
            out_pattern=str(out_dir / 'chunk_{file_id}.h5'),
            device_batch_size=4, pack_output_on_device=pack)
        ForwardPass.run(strat, 0)
        return sorted(glob.glob(str(out_dir / 'chunk_*.h5')))

    host_files = run('host', False)
    dev_files = run('dev', True)  # force: errors if the gate fails
    assert len(host_files) == len(dev_files) > 0
    for hf, df in zip(host_files, dev_files):
        assert os.path.basename(hf) == os.path.basename(df)
        with h5py.File(hf) as fh, h5py.File(df) as fd:
            assert set(fh) == set(fd)
            np.testing.assert_array_equal(fh['meta'][:], fd['meta'][:])
            np.testing.assert_array_equal(fh['time_index'][:],
                                          fd['time_index'][:])
            for k in fh:
                if k in ('meta', 'time_index'):
                    continue
                a = fh[k][:].astype(np.int64)
                b = fd[k][:].astype(np.int64)
                assert a.dtype == b.dtype and a.shape == b.shape
                diff = np.abs(a - b)
                assert diff.max() <= 1, (k, diff.max())
                assert (diff != 0).mean() < 0.02, k
                assert fh[k].attrs['scale_factor'] == \
                    fd[k].attrs['scale_factor']


def test_packed_drain_nn_fill_fallback(tmp_path):
    """nn_fill semantics survive packing: a chunk whose device-side
    min/max stats show out-of-range values drains through the host
    NaN-fill transform (bit-identical to pack_output_on_device=False);
    in-range chunks in the same batch stay packed."""
    import jax.numpy as jnp

    input_file = make_fake_nc_file(str(tmp_path / 'input.nc'),
                                   (12, 12, 8), ['u100', 'v100'])
    model_dir, _ = _save_model(tmp_path, _st_gen_config(), 3, 4)

    def drain(sub, pack, out):
        out_dir = tmp_path / sub
        strat = ForwardPassStrategy(
            file_paths=input_file,
            model_kwargs={'model_dir': model_dir},
            fwp_chunk_shape=(6, 6, 4), spatial_pad=1, temporal_pad=1,
            out_pattern=str(out_dir / 'chunk_{file_id}.h5'),
            device_batch_size=4, nn_fill=True,
            pack_output_on_device=pack)
        fp = ForwardPass(strat, 0)
        chunks = [fp.get_input_chunk(i) for i in range(4)]
        if out is None:
            out, _ = fp._dispatch_chunk_batch(chunks)
        fp._drain_chunk_batch(chunks, (out, 4))
        return out, sorted(glob.glob(str(out_dir / 'chunk_*.h5')))

    out, _ = drain('probe', False, None)
    # push part of chunk 0's u channel out of the +-120 m/s range
    out = jnp.asarray(out).at[0, :4, :4, :, 0].add(500.0)
    _, host_files = drain('host', False, out)
    _, dev_files = drain('dev', True, out)
    assert len(host_files) == len(dev_files) == 4
    for i, (hf, df) in enumerate(zip(host_files, dev_files)):
        with h5py.File(hf) as fh, h5py.File(df) as fd:
            for k in fh:
                if k in ('meta', 'time_index'):
                    np.testing.assert_array_equal(fh[k][:], fd[k][:])
                    continue
                a = fh[k][:].astype(np.int64)
                b = fd[k][:].astype(np.int64)
                if i == 0:  # fell back -> same host code, bit-equal
                    np.testing.assert_array_equal(a, b, err_msg=k)
                else:
                    assert np.abs(a - b).max() <= 1, (i, k)


def test_pack_gate_force_unsupported_raises(tmp_path):
    """pack_output_on_device=True must fail loudly when the run can't
    pack (out_pattern=None returns arrays)."""
    input_file = make_fake_nc_file(str(tmp_path / 'input.nc'),
                                   (12, 12, 8), ['u100', 'v100'])
    model_dir, _ = _save_model(tmp_path, _st_gen_config(), 3, 4)
    strat = ForwardPassStrategy(
        file_paths=input_file, model_kwargs={'model_dir': model_dir},
        fwp_chunk_shape=(6, 6, 4), spatial_pad=1, temporal_pad=1,
        out_pattern=None, device_batch_size=4,
        pack_output_on_device=True)
    with pytest.raises(RuntimeError, match='cannot pack'):
        ForwardPass.run(strat, 0)


def test_packed_drain_fast_mode_matches_host_files(tmp_path):
    """inference_mode='fast' through the packed drain: the pack
    consumes whatever float32 block generate hands back, so fast-mode
    packed files must match fast-mode host-transform files at the
    storage quantum (the fast-vs-exact ACCURACY budget is a separate
    test, tests/forward_pass/test_fast_mode.py)."""
    input_file = make_fake_nc_file(str(tmp_path / 'input.nc'),
                                   (12, 12, 8), ['u100', 'v100'])
    model_dir, _ = _save_model(tmp_path, _st_gen_config(), 3, 4)

    def run(sub, pack):
        out_dir = tmp_path / sub
        strat = ForwardPassStrategy(
            file_paths=input_file,
            model_kwargs={'model_dir': model_dir},
            fwp_chunk_shape=(6, 6, 4), spatial_pad=1, temporal_pad=1,
            out_pattern=str(out_dir / 'chunk_{file_id}.h5'),
            device_batch_size=4, pack_output_on_device=pack,
            inference_mode='fast')
        ForwardPass.run(strat, 0)
        return sorted(glob.glob(str(out_dir / 'chunk_*.h5')))

    host_files = run('host_fast', False)
    dev_files = run('dev_fast', True)
    assert len(host_files) == len(dev_files) > 0
    for hf, df in zip(host_files, dev_files):
        with h5py.File(hf) as fh, h5py.File(df) as fd:
            assert set(fh) == set(fd)
            for k in fh:
                if k in ('meta', 'time_index'):
                    continue
                a = fh[k][:].astype(np.int64)
                b = fd[k][:].astype(np.int64)
                diff = np.abs(a - b)
                assert diff.max() <= 1, (k, diff.max())
                assert (diff != 0).mean() < 0.02, k
