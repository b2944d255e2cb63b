"""Chunk execution: pad -> generate -> crop -> write.

Reference parity: sup3r/pipeline/forward_pass.py:32-673 (pad_source_data
:122, run_generator :188, _reshape_data_chunk :280, _output_check :385,
run :428). TPU note: chunks of equal padded shape hit one cached XLA
compilation; the generator program itself is the jitted model apply.
"""

import functools
import logging
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from sup3r_tpu.postprocessing.writers import (
    OutputHandlerH5,
    OutputHandlerNC,
)
from sup3r_tpu.preprocessing.loaders import get_source_type
from sup3r_tpu.utilities import Timer

logger = logging.getLogger(__name__)


@functools.lru_cache(maxsize=None)
def _supports_fetch(model_cls):
    """Whether a model class's ``generate`` takes a ``fetch=`` kwarg
    (the single-model API that can hand back an un-fetched device
    array). THE capability probe for device-side crop/pack paths —
    cached per class so the per-chunk hot paths don't re-inspect."""
    import inspect

    return 'fetch' in inspect.signature(model_cls.generate).parameters


class ForwardPass:
    """Run a node's share of forward-pass chunks."""

    OUTPUT_HANDLER_CLASS = {
        'nc': OutputHandlerNC,
        'h5': OutputHandlerH5,
    }

    def __init__(self, strategy, node_index=0):
        self.strategy = strategy
        self.node_index = node_index
        self.model = strategy.get_model()
        self.timer = Timer()
        #: per-node accounting for the batched path: device->host MB
        #: actually fetched and how many chunks drained packed vs via
        #: the host float32 transform (benchmark attribution)
        self.stats = {'fetch_mb': 0.0, 'packed_chunks': 0,
                      'host_chunks': 0}
        out_type = (get_source_type(strategy.out_pattern)
                    if strategy.out_pattern else None)
        self.output_handler_class = (
            self.OUTPUT_HANDLER_CLASS[out_type] if out_type else None)
        # reference default: invert u/v to ws/wd for H5, keep raw u/v
        # for gridded NetCDF intermediates (strategy.py invert_uv)
        invert = getattr(strategy, 'invert_uv', None)
        self._invert_uv = (out_type == 'h5') if invert is None \
            else bool(invert)
        self._nn_fill = bool(getattr(strategy, 'nn_fill', False))
        self._resolve_auto_batch()

    def _resolve_auto_batch(self):
        """Resolve device_batch_size='auto' into an int (possibly
        switching on spatial mesh sharding) from the HBM estimate of
        one padded chunk (see pipeline/memory.py)."""
        strategy = self.strategy
        if getattr(strategy, 'device_batch_size', 1) != 'auto':
            return
        from sup3r_tpu.pipeline.memory import (
            estimate_halo_bytes,
            resolve_device_batch_size,
        )

        slicer = strategy.fwp_slicer
        pads = (2 * strategy.spatial_pad, 2 * strategy.spatial_pad,
                2 * strategy.temporal_pad)
        padded = tuple(int(c) + p
                       for c, p in zip(slicer.chunk_shape, pads))
        n_feats = len(self.model.lr_features)
        batch, use_spatial = resolve_device_batch_size(
            self.model, padded, n_feats)
        strategy.device_batch_size = batch
        if use_spatial and not strategy.use_mesh:
            strategy.use_mesh = 'spatial'
            try:
                import jax

                n_dev = len(jax.local_devices())
            except Exception:  # pragma: no cover
                n_dev = 1
            halo = estimate_halo_bytes(
                self.model, (*padded, n_feats), n_dev)
            logger.info(
                'auto batching -> use_mesh="spatial" over %d '
                'device(s); estimated halo exchange ~%.2f MB per '
                'generator application', n_dev, halo / 1024 ** 2)

    @property
    def meta(self):
        """Run metadata to write with output files."""
        return {
            'node_index': self.node_index,
            'model_meta': self.model.meta,
            'strategy_meta': self.strategy.meta,
        }

    # ------------------------------------------------------------------
    def get_input_chunk(self, chunk_index=0, mode='reflect'):
        """Strategy chunk + boundary padding."""
        chunk = self.strategy.init_chunk(chunk_index)
        chunk.input_data, chunk.exo_data = self.pad_source_data(
            chunk.input_data, chunk.pad_width, chunk.exo_data, mode=mode)
        return chunk

    def _get_step_enhance(self, step):
        """Cumulative enhancement for an exo step (reference:
        forward_pass.py:89)."""
        combine_type = step['combine_type']
        model_step = step['model']
        assert combine_type in ('input', 'output', 'layer'), (
            f'Bad combine_type in step {step}')
        if combine_type == 'input':
            if model_step == 0:
                return 1, 1
            return (int(np.prod(self.model.s_enhancements[:model_step])),
                    int(np.prod(self.model.t_enhancements[:model_step])))
        return (int(np.prod(self.model.s_enhancements[:model_step + 1])),
                int(np.prod(self.model.t_enhancements[:model_step + 1])))

    def pad_source_data(self, input_data, pad_width, exo_data,
                        mode='reflect'):
        """Reflect-pad input (and exo, scaled by enhancement)."""
        if mode == 'reflect' and np.asarray(input_data).ndim == 4:
            from sup3r_tpu._native import reflect_pad_4d

            out = reflect_pad_4d(input_data, pad_width)
        else:
            out = np.pad(input_data, (*pad_width, (0, 0)), mode=mode)
        if exo_data is not None:
            for feature in exo_data:
                for i, step in enumerate(exo_data[feature]['steps']):
                    s_en, t_en = self._get_step_enhance(step)
                    exo_pad = (*((s * pw[0], s * pw[1]) for s, pw in zip(
                        [s_en, s_en, t_en], pad_width)), (0, 0))
                    arr = step['data']
                    if arr.ndim == 3:
                        arr = np.repeat(
                            arr[:, :, None],
                            step['t_enhance'] * input_data.shape[2],
                            axis=2)
                    arr = np.pad(arr, exo_pad, mode=mode)
                    exo_data[feature]['steps'][i]['data'] = arr
        return out, exo_data

    # ------------------------------------------------------------------
    @classmethod
    def run_generator(cls, data_chunk, hr_crop_slices, model,
                      s_enhance=None, t_enhance=None, exo_data=None):
        """Reshape -> model.generate -> crop overlap.

        Models whose ``generate`` supports ``fetch=`` hand back the
        un-fetched device array so the halo CROP happens on device and
        the device->host transfer moves only the kept voxels (the
        padded halo is 30-50% of the block at production pads). The
        values are identical — slicing commutes with the fetch."""
        data_chunk, exo_data, i_lr_t, i_lr_s = cls._reshape_data_chunk(
            model, data_chunk, exo_data)
        if _supports_fetch(type(model)):
            hi_res = model.generate(data_chunk, exogenous_data=exo_data,
                                    fetch=False)
        else:
            hi_res = model.generate(data_chunk, exogenous_data=exo_data)
        if hi_res.ndim == 4:
            hi_res = hi_res.transpose(1, 2, 0, 3)[None]
        if s_enhance is not None and (
                hi_res.shape[1] != s_enhance * data_chunk.shape[i_lr_s]):
            raise RuntimeError(
                f'Spatial enhancement {s_enhance}x does not match '
                f'{data_chunk.shape} -> {hi_res.shape}')
        if t_enhance is not None and (
                hi_res.shape[3] != t_enhance * data_chunk.shape[i_lr_t]):
            raise RuntimeError(
                f'Temporal enhancement {t_enhance}x does not match '
                f'{data_chunk.shape} -> {hi_res.shape}')
        return hi_res[0][hr_crop_slices]

    @staticmethod
    def _reshape_data_chunk(model, data_chunk, exo_data):
        """4D models consume (t, s1, s2, f); 5D models consume
        (1, s1, s2, t, f)."""
        if exo_data is not None:
            for feature in exo_data:
                for i, entry in enumerate(exo_data[feature]['steps']):
                    models = getattr(model, 'models', [model])
                    assert entry['model'] < len(models), (
                        f'exo step model index {entry["model"]} out of '
                        'range')
                    current = models[entry['model']]
                    arr = entry['data']
                    if current.is_4d:
                        arr = np.transpose(arr, (2, 0, 1, 3))
                    else:
                        arr = arr[None]
                    exo_data[feature]['steps'][i]['data'] = np.asarray(
                        arr)
        if model.is_4d:
            i_lr_t, i_lr_s = 0, 1
            data_chunk = np.transpose(data_chunk, (2, 0, 1, 3))
        else:
            i_lr_t, i_lr_s = 3, 1
            data_chunk = data_chunk[None]
        return np.asarray(data_chunk), exo_data, i_lr_t, i_lr_s

    # ------------------------------------------------------------------
    @classmethod
    def _output_check(cls, out_data, allowed_const=False):
        """Guard against NaN or suspicious constant output (reference:
        forward_pass.py:385, the semantic sanitizer for the TF
        reflect-pad >2GB bug class)."""
        if np.isnan(out_data).any():
            raise MemoryError(
                'Forward pass output contains NaN values!')
        if allowed_const is True:
            return
        allowed = allowed_const if isinstance(allowed_const,
                                              (list, tuple)) else []
        for i in range(out_data.shape[-1]):
            chan = out_data[..., i]
            if chan.std() == 0 and chan.flat[0] not in allowed:
                raise MemoryError(
                    f'Forward pass output channel {i} is constant '
                    f'({chan.flat[0]})! If this is intended pass '
                    'allowed_const including this value.')

    def run_chunk(self, chunk, allowed_const=False):
        """Generate + check + write one chunk. Returns (failed,
        output_or_none).

        Unlike the reference's classmethod (which rebuilds the model
        from model_kwargs per call, forward_pass.py:440), this is an
        instance method — the model and output handler live on the
        ForwardPass, so no per-chunk construction arguments exist."""
        msg = f'Running forward pass for chunk_index={chunk.index}.'
        logger.info(msg)
        if np.isnan(chunk.input_data).any():
            raise RuntimeError(
                f'Chunk {chunk.index} input data contains NaNs')
        if self._pack_single_gate(chunk):
            try:
                self._run_chunk_packed(chunk, allowed_const)
            except MemoryError as e:
                logger.error('Chunk %s failed output check: %s',
                             chunk.index, e)
                raise
            return False, None
        out_data = self.run_generator(
            chunk.input_data, chunk.hr_crop_slice, self.model,
            s_enhance=self.strategy.s_enhance,
            t_enhance=self.strategy.t_enhance,
            exo_data=chunk.exo_data)
        out_data = np.asarray(out_data)
        if not out_data.flags.writeable:
            # np.asarray of a device array can be a read-only view;
            # callers getting the array back may post-process in place
            out_data = out_data.copy()
        failed = False
        try:
            self._output_check(out_data, allowed_const=allowed_const)
        except MemoryError as e:
            failed = True
            logger.error('Chunk %s failed output check: %s', chunk.index,
                         e)
            raise
        if chunk.out_file is not None and not failed:
            self.output_handler_class._write_output(
                data=out_data, features=list(
                    self.model.hr_out_features),
                lat_lon=chunk.hr_lat_lon, times=chunk.hr_times,
                out_file=chunk.out_file, meta_data=self.meta,
                gids=chunk.gids, invert_uv=self._invert_uv,
                nn_fill=self._nn_fill)
        return failed, out_data if chunk.out_file is None else None

    def _pack_single_gate(self, chunk):
        """Whether this chunk's per-chunk run can use the device-
        packed output path (crop + transform + storage quantization
        on device — see ``_pack_write``): H5 file output and a model
        whose ``generate`` can hand back the un-fetched device array
        (``fetch=`` kwarg; MultiStepGan / LinearInterp / Sup3rCondMom
        keep the host path). ``pack_output_on_device=True`` errors if
        this chunk cannot pack — same contract as the batched
        ``_pack_gate``."""
        from sup3r_tpu.postprocessing.writers import OutputHandlerH5

        flag = getattr(self.strategy, 'pack_output_on_device', None)
        if flag is False:
            return False
        ok = (self.output_handler_class is OutputHandlerH5
              and chunk.out_file is not None
              and hasattr(self.model, 'norm_input')
              and _supports_fetch(type(self.model)))
        if flag is True and not ok:
            raise RuntimeError(
                'pack_output_on_device=True but this chunk cannot '
                'pack on device (needs H5 output, out_pattern set, '
                'and a model whose generate supports fetch=)')
        return ok

    def _run_chunk_packed(self, chunk, allowed_const):
        """Per-chunk variant of the packed drain: generate with
        ``fetch=False``, keep the crop on device and pack + write.
        When ``generate`` had to fetch anyway (output-combine exo, no
        norm stats) the already-computed array finishes through the
        host transform — the generator NEVER runs twice."""
        import jax

        cropped = self.run_generator(
            chunk.input_data, chunk.hr_crop_slice, self.model,
            s_enhance=self.strategy.s_enhance,
            t_enhance=self.strategy.t_enhance,
            exo_data=chunk.exo_data)
        if isinstance(cropped, jax.Array):
            self._pack_write([(chunk, cropped)],
                             allowed_const=allowed_const)
            return
        out_data = np.asarray(cropped)
        if not out_data.flags.writeable:
            out_data = out_data.copy()
        self._output_check(out_data, allowed_const=allowed_const)
        self.output_handler_class._write_output(
            data=out_data,
            features=list(self.model.hr_out_features),
            lat_lon=chunk.hr_lat_lon, times=chunk.hr_times,
            out_file=chunk.out_file, meta_data=self.meta,
            gids=chunk.gids, invert_uv=self._invert_uv,
            nn_fill=self._nn_fill)

    def run_chunks_batched(self, chunk_ids, batch_size):
        """Device-batched execution: group same-shaped padded chunks,
        stack them, run ONE jitted generate per group, split + write.

        This is the TPU-native replacement for the reference's
        process-pool-per-chunk (reference: forward_pass.py:503): a
        batch of chunks fills the MXU and amortizes dispatch, while
        chunk prep (IO + padding) overlaps on host threads."""
        from collections import deque

        outputs = {}

        def run_batch(batch, drain_pool, drain_futs):
            dispatched = self.timer(self._dispatch_chunk_batch)(batch)
            if dispatched is None:  # per-chunk fallback path
                outputs.update({
                    c.index: self.run_chunk(
                        c,
                        allowed_const=self.strategy.allowed_const)[1]
                    for c in batch})
                return
            drain_futs.append(drain_pool.submit(
                self.timer(self._drain_chunk_batch), batch,
                dispatched))

        # STREAMING grouping: chunks are prepared with a bounded
        # number in flight and dispatched as soon as a same-shape
        # batch fills — materializing the node's whole chunk list
        # first would hold O(n_chunks) padded inputs in host RAM,
        # defeating chunked_io (round-3 review finding). Peak memory
        # here is O(in-flight + one partial batch per distinct shape);
        # distinct padded shapes number at most a handful (interior +
        # edge variants).
        # overlap the host-bound tail (device fetch + crop + h5 write)
        # of batch N with the dispatch of batch N+1: dispatches are
        # async device work, drains are GIL-releasing (tunnel/PCIe
        # wait, disk IO), so even a 1-vCPU node pipelines them
        drain_futs = []
        buffers = {}
        it = iter(chunk_ids)
        inflight = deque()
        with ThreadPoolExecutor(
                max(self.strategy.pass_workers, 2)) as pool, \
                ThreadPoolExecutor(max_workers=1) as drain_pool:

            def submit_next():
                i = next(it, None)
                if i is None:
                    return False
                inflight.append(pool.submit(
                    self.timer(self.get_input_chunk), i))
                return True

            for _ in range(max(2 * batch_size, 4)):
                if not submit_next():
                    break
            while inflight:
                chunk = inflight.popleft().result()
                submit_next()
                key = (chunk.input_data.shape,
                       chunk.exo_data is not None)
                buffers.setdefault(key, []).append(chunk)
                if len(buffers[key]) == batch_size:
                    run_batch(buffers.pop(key), drain_pool,
                              drain_futs)
            for batch in buffers.values():  # partial-batch leftovers
                run_batch(batch, drain_pool, drain_futs)
            for fut in drain_futs:
                outputs.update(fut.result())
        return outputs

    def _dispatch_chunk_batch(self, batch):
        """Stack same-shaped chunks and launch the device batch,
        optionally sharded over a device mesh (multi-chip chunk
        fan-out — the SPMD version of the reference's node-per-chunk
        SLURM distribution, SURVEY 2.7). Returns the un-fetched device
        output (or None when chunks must run individually)."""
        if self.model.is_4d:
            # 4D models already batch over time — run individually
            return None
        members = getattr(self.model, 'models', None)
        if members is not None and any(
                getattr(m, 'is_4d', False) for m in members):
            # multistep chains with a 4D step fold the batch dim at the
            # 5D->4D transpose — run those chunks individually
            return None
        # capability gate: the batched path needs the single-model API
        # (norm_input + a fetch= kwarg on generate); MultiStepGan /
        # LinearInterp / Sup3rCondMom fall back to per-chunk runs
        # instead of crashing mid-node (round-3 review finding)
        if not (hasattr(self.model, 'norm_input')
                and _supports_fetch(type(self.model))):
            if not getattr(self, '_batch_gate_logged', False):
                self._batch_gate_logged = True
                logger.info(
                    '%s does not support device batching; running '
                    'chunks individually',
                    type(self.model).__name__)
            return None
        exo_batched = None
        if any(c.exo_data for c in batch):
            exo_batched = self._stack_exo(batch)
            if exo_batched is None:  # heterogeneous exo; fall back
                return None
            if self.model._has_output_exo(exo_batched):
                # output-combine concat is host-side; per-chunk path
                return None
        stacked = np.stack([c.input_data for c in batch], axis=0)
        n_real = len(batch)
        # pad partial batches up to the configured device batch size by
        # repeating the last chunk: the batch dim stays STATIC so XLA
        # compiles exactly one program per chunk shape instead of one
        # per (shape, remainder-size) pair — remote compiles are tens
        # of seconds each
        full = getattr(self.strategy, 'device_batch_size', 1)

        def pad_full(arr):
            if n_real < full:
                return np.concatenate(
                    [arr, np.repeat(arr[-1:], full - n_real, axis=0)],
                    axis=0)
            return arr

        stacked = pad_full(stacked)
        layer_exo = None
        if exo_batched is not None:
            for entry in exo_batched.values():
                for step in entry['steps']:
                    step['data'] = pad_full(step['data'])
            # combine input-exo channels + split out the layer rasters
            # on host so the device array below carries everything the
            # jitted apply needs (mesh sharding then applies to exo
            # runs too — round-3 review finding: the exo branch used
            # to skip use_mesh entirely)
            stacked = self.model._combine_fwp_input(
                np.asarray(stacked, dtype=np.float32), exo_batched)
        lr = self.model.norm_input(stacked)
        use_mesh = getattr(self.strategy, 'use_mesh', False)
        if use_mesh == 'spatial':
            # spatial (sp) domain decomposition: ONE chunk's s1 dim
            # split over the mesh; XLA inserts the conv halo
            # exchanges. For chunks too large for one chip's HBM.
            import jax

            from sup3r_tpu.parallel import get_mesh, shard_spatial
            from sup3r_tpu.pipeline.memory import estimate_halo_bytes

            from sup3r_tpu.ops.conv_ad import shard_aligned_worthwhile

            mesh = get_mesh()
            # shard-aligned s1 convs: true 1-row SPMD halos instead
            # of per-conv shard re-balancing (~10x wire reduction at
            # sp8; see ops/conv_ad.reflect_conv_shard_aligned). This
            # 1D mesh IS the spatial axis, so its size is the width
            # the shared policy gate reasons about.
            if (shard_aligned_worthwhile(mesh.devices.size)
                    and hasattr(type(self.model),
                                'inference_shard_aligned')):
                self.model.inference_shard_aligned = True
            if not getattr(self, '_sp_halo_logged', False):
                self._sp_halo_logged = True
                halo = lr.shape[0] * estimate_halo_bytes(
                    self.model, lr.shape[1:], int(mesh.devices.size))
                logger.info(
                    'use_mesh=spatial: s1=%d split over %d device(s); '
                    'estimated conv halo exchange ~%.2f MB per '
                    'batched generator application',
                    lr.shape[1], mesh.devices.size, halo / 1024 ** 2)
            lr = shard_spatial(
                mesh, np.ascontiguousarray(lr, dtype=np.float32),
                dim=1)
        elif use_mesh:
            import jax
            from jax.sharding import NamedSharding, PartitionSpec as P

            from sup3r_tpu.parallel import get_mesh

            mesh = get_mesh()
            n_dev = mesh.devices.size
            pad = (-lr.shape[0]) % n_dev
            logger.info(
                'use_mesh: %d chunk(s) over %d device(s)%s', lr.shape[0],
                n_dev, f' (+{pad} padding repeats)' if pad else '')
            if pad:
                lr = np.concatenate(
                    [lr, np.repeat(lr[-1:], pad, axis=0)], axis=0)
            lr = jax.device_put(
                np.ascontiguousarray(lr, dtype=np.float32),
                NamedSharding(mesh, P('data')))
        if exo_batched is not None:
            # mid-network rasters, pre-normalized with their feature
            # stats (generate skips exo norm when norm_in=False)
            layer_exo = {}
            for feature, entry in exo_batched.items():
                for step in entry['steps']:
                    if step.get('combine_type') == 'layer':
                        layer_exo[feature] = np.asarray(
                            step['data'], dtype=np.float32)
            layer_exo = self.model._norm_layer_exo(layer_exo)
        out = self.model.generate(
            lr, norm_in=False, un_norm_out=True,
            exogenous_data=layer_exo or None, fetch=False)
        return out, n_real

    @staticmethod
    def _stack_exo(batch):
        """Stack per-chunk exo rasters into batched ExoData so chunks
        with exogenous features (topography/sza/obs — every production
        sup3rcc/sup3rwind run) still go through the device-batched
        path. Returns None if the chunks' exo structures differ."""
        first = batch[0].exo_data
        if not all(c.exo_data is not None
                   and sorted(c.exo_data) == sorted(first)
                   for c in batch):
            return None
        from sup3r_tpu.preprocessing.exo import ExoData

        out = {}
        for feat, entry in first.items():
            steps = []
            for i, step in enumerate(entry['steps']):
                datas = []
                for c in batch:
                    csteps = c.exo_data[feat]['steps']
                    if (len(csteps) != len(entry['steps'])
                            or csteps[i]['combine_type']
                            != step['combine_type']
                            or np.shape(csteps[i]['data'])
                            != np.shape(step['data'])):
                        return None
                    datas.append(np.asarray(csteps[i]['data'],
                                            dtype=np.float32))
                steps.append({**{k: v for k, v in step.items()
                                 if k != 'data'},
                              'data': np.stack(datas, axis=0)})
            out[feat] = {'steps': steps}
        return ExoData(out)

    def _pack_gate(self, out, batch):
        """Whether this dispatched batch can drain through the
        device-packed path (ops/output_pack.py): crop + u/v inversion
        + limits + storage quantization on device, fetching cropped
        integer bytes. Auto unless ``strategy.pack_output_on_device``
        forces it; requires an un-fetched device output, the H5
        writer, and chunks that write files (callers wanting arrays
        back get the untransformed float32 block). ``nn_fill`` is
        honored: chunks whose device-computed min/max show
        out-of-range values fall back to the host NaN-fill transform
        per chunk (in range — the normal case — nn_fill is a no-op
        and the packed bytes are identical)."""
        import jax

        from sup3r_tpu.postprocessing.writers import OutputHandlerH5

        flag = getattr(self.strategy, 'pack_output_on_device', None)
        if flag is False:
            return False
        ok = (isinstance(out, jax.Array)
              and self.output_handler_class is OutputHandlerH5
              and all(c.out_file is not None for c in batch))
        if flag is True and not ok:
            raise RuntimeError(
                'pack_output_on_device=True but this run cannot pack '
                'on device (needs H5 output, out_pattern set, and a '
                'device-batched model path)')
        return ok

    def _drain_packed(self, batch, out):
        """Device-packed drain: per chunk crop ON DEVICE, then pack +
        write (see ``_pack_write``)."""
        return self._pack_write(
            [(chunk, out[i][chunk.hr_crop_slice])
             for i, chunk in enumerate(batch)])

    def _pack_write(self, items_all, allowed_const=None):
        """Pack cropped device outputs and write their H5 files: run
        the jitted pack (inversion + limits + quantization into
        writer layout), fetch the small check stats then the packed
        integer arrays. Chunks are grouped by (crop shape, lat
        orientation) so each group is ONE jitted dispatch and one
        fetch per feature."""
        import jax.numpy as jnp

        from warnings import warn

        from sup3r_tpu.ops.output_pack import (
            pack_chunks,
            pack_plan,
            theta_for,
        )

        names, pairs, quant = pack_plan(
            self.model.hr_out_features, self._invert_uv)
        groups = {}
        for chunk, cropped in items_all:
            invert_lat = bool(
                chunk.hr_lat_lon[-1, 0, 0] > chunk.hr_lat_lon[0, 0, 0])
            groups.setdefault(
                (cropped.shape, invert_lat), []).append(
                    (chunk, cropped))
        outputs = {}
        allowed = (self.strategy.allowed_const
                   if allowed_const is None else allowed_const)
        for (shape, invert_lat), items in groups.items():
            stacked = jnp.stack([c for _, c in items])
            thetas = jnp.asarray(np.stack(
                [theta_for(ch.hr_lat_lon, invert_lat)
                 for ch, _ in items]))
            packed, stats = pack_chunks(stacked, thetas, pairs, quant,
                                        invert_lat)
            stats = {k: np.asarray(v) for k, v in stats.items()}
            for j in range(len(items)):
                self._check_packed_stats(stats, j, allowed)
            # limits: per chunk, out-of-range under nn_fill means the
            # host transform's NaN-fill semantics apply — fall back
            # for THOSE chunks only. In clip mode warn and keep the
            # device clip (bit-identical to the host clip).
            oob = np.zeros(len(items), dtype=bool)
            for k, (name, (_, _, lo, hi)) in enumerate(
                    zip(names, quant)):
                bad = ((stats['ch_max'][:, k] > hi)
                       | (stats['ch_min'][:, k] < lo))
                if bad.any():
                    if self._nn_fill:
                        oob |= bad
                    else:
                        warn(f'"{name}" outside physical range '
                             f'({lo}, {hi}); clipping.')
            host = None
            for j, (chunk, cropped) in enumerate(items):
                if oob[j]:
                    cropped_host = np.asarray(cropped)
                    self.stats['fetch_mb'] += (cropped_host.nbytes
                                               / 2 ** 20)
                    self.stats['host_chunks'] += 1
                    self.output_handler_class._write_output(
                        data=cropped_host,
                        features=list(self.model.hr_out_features),
                        lat_lon=chunk.hr_lat_lon,
                        times=chunk.hr_times,
                        out_file=chunk.out_file, meta_data=self.meta,
                        gids=chunk.gids, invert_uv=self._invert_uv,
                        nn_fill=True)
                else:
                    if host is None:
                        host = [np.asarray(p) for p in packed]
                        self.stats['fetch_mb'] += sum(
                            h.nbytes for h in host) / 2 ** 20
                    self.stats['packed_chunks'] += 1
                    self.output_handler_class._write_packed(
                        [h[j] for h in host], list(names),
                        lat_lon=chunk.hr_lat_lon,
                        times=chunk.hr_times,
                        out_file=chunk.out_file, meta_data=self.meta,
                        gids=chunk.gids)
                outputs[chunk.index] = None
        return outputs

    @staticmethod
    def _check_packed_stats(stats, j, allowed_const):
        """Mirror ``_output_check`` from device-computed statistics
        (NaN anywhere; exactly-constant channels outside the allowed
        list)."""
        if stats['nan_any'][j]:
            raise MemoryError(
                'Forward pass output contains NaN values!')
        if allowed_const is True:
            return
        allowed = allowed_const if isinstance(allowed_const,
                                              (list, tuple)) else []
        for i, const in enumerate(stats['ch_const'][j]):
            first = stats['ch_first'][j, i]
            if const and first not in allowed:
                raise MemoryError(
                    f'Forward pass output channel {i} is constant '
                    f'({first})! If this is intended pass '
                    'allowed_const including this value.')

    def _drain_chunk_batch(self, batch, dispatched):
        """Fetch a dispatched batch to host, crop each chunk and
        write/return it."""
        out, n_real = dispatched
        if self._pack_gate(out, batch):
            return self._drain_packed(batch, out)
        out = np.asarray(out)
        self.stats['fetch_mb'] += out.nbytes / 2 ** 20
        self.stats['host_chunks'] += n_real
        if not out.flags.writeable:
            out = out.copy()
        out = out[:n_real]
        outputs = {}
        for i, chunk in enumerate(batch):
            out_i = np.asarray(out[i][chunk.hr_crop_slice])
            self._output_check(
                out_i, allowed_const=self.strategy.allowed_const)
            if chunk.out_file is not None:
                self.output_handler_class._write_output(
                    data=out_i,
                    features=list(self.model.hr_out_features),
                    lat_lon=chunk.hr_lat_lon, times=chunk.hr_times,
                    out_file=chunk.out_file, meta_data=self.meta,
                    gids=chunk.gids, invert_uv=self._invert_uv,
                    nn_fill=self._nn_fill)
                outputs[chunk.index] = None
            else:
                outputs[chunk.index] = out_i
        return outputs

    # ------------------------------------------------------------------
    @classmethod
    def run(cls, strategy, node_index):
        """Run all this node's chunks (serial, IO-threaded, or
        device-batched)."""
        if strategy.node_finished(node_index):
            logger.info('All chunks for node %s already done.',
                        node_index)
            return None
        fwp = cls(strategy, node_index)
        chunk_ids = [
            i for i in strategy.node_chunks[node_index]
            if not strategy.chunk_finished(i)]
        outputs = {}
        if (getattr(strategy, 'device_batch_size', 1) > 1
                or getattr(strategy, 'use_mesh', False)):
            outputs = fwp.run_chunks_batched(
                chunk_ids, max(1, strategy.device_batch_size))
        elif strategy.pass_workers > 1:
            with ThreadPoolExecutor(strategy.pass_workers) as pool:
                futures = {
                    pool.submit(cls._run_one, fwp, strategy, i): i
                    for i in chunk_ids}
                for fut, i in futures.items():
                    outputs[i] = fut.result()
        else:
            for i in chunk_ids:
                outputs[i] = cls._run_one(fwp, strategy, i)
        logger.info('Node %s finished %d chunks. Timing: %s Stats: %s',
                    node_index, len(chunk_ids), fwp.timer.log,
                    fwp.stats)
        if strategy.out_pattern is None:
            return outputs
        return None

    @staticmethod
    def _run_one(fwp, strategy, chunk_index):
        chunk = fwp.timer(fwp.get_input_chunk, log=True)(chunk_index)
        _, out = fwp.timer(fwp.run_chunk, log=True)(
            chunk, allowed_const=strategy.allowed_const)
        return out
