"""Benchmark: HR voxels/sec/chip for chunked forward-pass generation on
the flagship spatiotemporal GAN (the BASELINE.md north-star metric),
plus train-step throughput and achieved TFLOP/s / MFU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "train_hr_voxels_per_sec": N, "train_vs_baseline": N,
   "inference_tflops": N, "train_tflops": N, "mfu_pct_bf16_peak": N,
   "fast_hr_voxels_per_sec": N, "fast_max_abs_err_norm_units": N,
   "train_loop_hr_voxels_per_sec": N,
   "train_bf16_hr_voxels_per_sec": N, "train_bf16_speedup": N,
   "fwp_e2e_hr_voxels_per_sec": N,
   "fwp_e2e_dispatch_hr_voxels_per_sec": N}

Baselines (both measured in this image; the reference runs TF kernels
on CPU for inference — use_cpu=True default, reference:
sup3r/pipeline/strategy.py:280 — and TF on the available device for
training):
  - inference: raw-TF ops, same 3x/4x ST-GAN, same (4,12,12,12,2)
    chunk batch: 3.34e4 HR voxels/sec.
  - train step: raw-TF ops, same generator+disc, full GAN step (gen
    fwd/bwd + disc fwd/bwd + both Adam updates) on CPU
    (scripts/baseline_tf_train.py): see TRAIN_BASELINE below.

Timing note: on the axon-tunneled TPU, ``block_until_ready`` does not
reliably wait for remote execution, so each timed repetition ends with
a host VALUE fetch (a jitted scalar reduction for inference; the loss
scalars for the train step) — the fetch cannot complete before the
device finishes the queued work.

MFU is reported against the v5e bf16 matmul peak (197 TFLOP/s); the
inference path runs fp32 convs (which this platform's conv emitter
internally evaluates with bf16-rounded inputs, see CLAUDE.md), so the
fp32-conv practical ceiling is lower (~67 TFLOP/s measured).
"""

import json
import os
import sys
import time
import traceback

import numpy as np

_T0 = time.perf_counter()
#: soft wall-clock budget: optional tiers (fast mode, train loop, E2E)
#: are skipped — with a stderr note — when the remaining budget can't
#: fit them, so the ONE JSON line always prints even when the tunnel
#: to the chip is degraded (observed: dispatch floor 3 ms -> 34 ms,
#: backend init 70 s on a bad day)
_DEADLINE_S = float(os.environ.get('SUP3R_TPU_BENCH_DEADLINE_S', 1500))


def _stamp(msg):
    """Stage progress to stderr (the JSON line owns stdout)."""
    print(f'[bench +{time.perf_counter() - _T0:5.0f}s] {msg}',
          file=sys.stderr, flush=True)


def _have_time(est_s, what):
    left = _DEADLINE_S - (time.perf_counter() - _T0)
    if left < est_s:
        _stamp(f'SKIP {what}: needs ~{est_s:.0f}s, {left:.0f}s left '
               f'(SUP3R_TPU_BENCH_DEADLINE_S={_DEADLINE_S:.0f})')
        return False
    return True


class _Skip(Exception):
    """Deadline skip marker (quietly swallowed, no traceback)."""


INFER_BASELINE = 3.34e4   # TF-CPU HR voxels/s, inference (docstring)
TRAIN_BASELINE = 1.89e4   # TF-CPU HR voxels/s, full GAN train step
                          # (scripts/baseline_tf_train.py at batch 16
                          # — SAME batch as the TPU step below:
                          # 52.6 s/step measured in this image.
                          # Round 2 used batch 4 = 9.05e3 voxels/s,
                          # which overstated the speedup ~2x)
TRAIN_BASELINE_BATCH = 16
V5E_BF16_PEAK_TFLOPS = 197.0


def _bench_fwp_e2e():
    """End-to-end chunked ForwardPass (disk -> chunk prep -> device
    batches -> crop/stitch -> H5), the BASELINE.md north-star metric's
    system form, plus a DISPATCH-ONLY variant (disk -> chunk prep ->
    H2D -> device compute, one scalar sync, no device->host output
    fetch / H5 write) that isolates tunnel-fetch + host-write cost
    from the producer pipeline. Small domain to bound runtime; returns
    (e2e_voxels_per_sec, dispatch_voxels_per_sec) with None entries on
    failure (the device-apply metrics still print)."""
    import shutil
    import tempfile

    from sup3r_tpu.configs import get_config
    from sup3r_tpu.models import Sup3rGan
    from sup3r_tpu.pipeline import ForwardPass, ForwardPassStrategy
    from sup3r_tpu.utilities.test_helpers import make_fake_nc4_file

    tmp = tempfile.mkdtemp(prefix='bench_fwp_')
    try:
        s1 = s2 = 40
        t = 40
        hr_voxels = (s1 * 3) * (s2 * 3) * (t * 4)
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

        def make_strategy(tag):
            return ForwardPassStrategy(
                file_paths=input_file,
                model_kwargs={'model_dir': model_dir},
                fwp_chunk_shape=(16, 16, 20), spatial_pad=2,
                temporal_pad=2,
                out_pattern=f'{tmp}/out{tag}/chunk_{{file_id}}.h5',
                device_batch_size=8, chunked_io=True)

        def run_once(tag):
            """One full node pass; returns (wall_s, fwp) so the timed
            passes can report the internal attribution (prep/dispatch/
            drain seconds, fetched MB, packed-vs-host chunk counts)."""
            strategy = make_strategy(tag)
            fwp = ForwardPass(strategy, 0)
            chunk_ids = list(strategy.node_chunks[0])
            t0 = time.perf_counter()
            fwp.run_chunks_batched(
                chunk_ids, max(1, strategy.device_batch_size))
            return time.perf_counter() - t0, fwp

        _stamp('e2e: warm pass (compiles cache here)')
        run_once('_warm')  # populate jit + XLA compile caches
        best_dt, best_fwp = np.inf, None
        for k in range(2):  # best-of-2: tunnel noise is real
            _stamp(f'e2e: timed pass {k + 1}/2')
            dt, fwp = run_once(f'_t{k}')
            if dt < best_dt:
                best_dt, best_fwp = dt, fwp
        e2e = hr_voxels / best_dt
        tl = best_fwp.timer.log
        st = best_fwp.stats
        fetch_mb = st.get('fetch_mb', 0.0)
        drain_s = tl.get('_drain_chunk_batch', 0.0)
        _stamp(
            f'e2e done ({e2e:.3g} voxels/s in {best_dt:.1f}s; '
            f"prep {tl.get('get_input_chunk', 0):.1f}s thread-sum, "
            f"dispatch {tl.get('_dispatch_chunk_batch', 0):.1f}s, "
            f'drain {drain_s:.1f}s, fetch {fetch_mb:.1f} MB '
            f'({fetch_mb / max(drain_s, 1e-9):.1f} MB/s), '
            f"packed={st.get('packed_chunks', 0)} "
            f"host={st.get('host_chunks', 0)} chunks)")

        dispatch = None
        if not _have_time(240, 'dispatch-only tier'):
            return e2e, None
        try:
            from collections import deque
            from concurrent.futures import ThreadPoolExecutor

            import jax
            import jax.numpy as jnp

            fwp = ForwardPass(make_strategy('_disp'), 0)
            bs = int(fwp.strategy.device_batch_size)
            ssum = jax.jit(jnp.sum)

            def one_pass():
                """Chunk prep (threaded, as in run_chunks_batched) +
                H2D + device dispatch for the whole node, then ONE
                scalar fetch on the final dispatch — device work is
                ordered, so that syncs the queue without pulling
                outputs through the ~30 MB/s tunnel."""
                chunk_ids = iter(fwp.strategy.node_chunks[0])
                buffers, last = {}, None
                with ThreadPoolExecutor(
                        max(fwp.strategy.pass_workers, 2)) as pool:
                    inflight = deque()

                    def submit_next():
                        i = next(chunk_ids, None)
                        if i is None:
                            return False
                        inflight.append(
                            pool.submit(fwp.get_input_chunk, i))
                        return True

                    for _ in range(max(2 * bs, 4)):
                        if not submit_next():
                            break
                    while inflight:
                        chunk = inflight.popleft().result()
                        submit_next()
                        key = chunk.input_data.shape
                        buffers.setdefault(key, []).append(chunk)
                        if len(buffers[key]) == bs:
                            last = fwp._dispatch_chunk_batch(
                                buffers.pop(key))
                    for batch in buffers.values():
                        last = fwp._dispatch_chunk_batch(batch)
                float(ssum(last[0]))

            # warm pass loads/compiles each padded-chunk-shape program
            # for THIS model instance (per-instance jit caches); the
            # timed pass is the steady-state producer rate, matching
            # how the e2e number above is measured (warm run first)
            one_pass()
            _stamp('dispatch tier: timed pass')
            t0 = time.perf_counter()
            one_pass()
            dispatch = hr_voxels / (time.perf_counter() - t0)
            _stamp(f'dispatch tier done ({dispatch:.3g} voxels/s)')
        except Exception:
            traceback.print_exc(file=sys.stderr)
        return e2e, dispatch
    except Exception:
        traceback.print_exc(file=sys.stderr)
        return None, None
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _flops(fn, *args):
    """Conv+matmul FLOPs of one call, from the traced jaxpr (the axon
    backend returns None from XLA cost_analysis)."""
    from sup3r_tpu.utilities.flops import estimate_flops

    try:
        return float(estimate_flops(fn, *args)) or None
    except Exception:
        return None


def main():
    _stamp('importing jax + initializing backend')
    import jax
    import jax.numpy as jnp

    jax.devices()
    _stamp(f'backend up: {jax.default_backend()}')

    from sup3r_tpu.configs import get_config
    from sup3r_tpu.models import Sup3rGan

    # flagship: 3x spatial / 4x temporal 2-feature ST GAN
    model = Sup3rGan(get_config('spatiotemporal/gen_3x_4x_2f'),
                     get_config('spatiotemporal/disc_test'),
                     learning_rate=1e-4)
    # production-like device batch of padded lr chunks (batch 16
    # measured ~3% over batch 8 on v5e; latency 141 ms/dispatch)
    chunk = (16, 20, 20, 24, 2)  # (chunks, s1, s2, t, f)
    # init at the TRAIN shapes (the disc has Dense layers so its input
    # shape is fixed); the generator is fully convolutional so
    # inference below still runs on the larger chunk batch
    model.init_weights((1, 12, 12, 12, 2), (1, 36, 36, 48, 2))
    # the production inference path: pad/conv/crop blocks fused to
    # reflect-pad-1 + valid conv (bit-identical, ~1.5x; default in
    # Sup3rGan.generate)
    apply_fn, fparams = model._get_fused_apply()
    params = jax.device_put(fparams)

    fwd = jax.jit(lambda p, x: apply_fn(p, x, {}))
    ssum = jax.jit(jnp.sum)
    x = jnp.asarray(
        np.random.default_rng(0).random(chunk), dtype=jnp.float32)

    infer_flops = _flops(fwd, params, x)
    _stamp('inference: warm compile')
    out = fwd(params, x)
    float(ssum(out))  # warm both compiles + full sync
    n_iters = 4
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = fwd(params, x)
        float(ssum(out))  # host value fetch = real device completion
        best = min(best, (time.perf_counter() - t0) / n_iters)

    hr_voxels = int(np.prod(out.shape[:-1]))
    voxels_per_sec = hr_voxels / best
    infer_tflops = (infer_flops / best / 1e12) if infer_flops else None
    _stamp(f'inference done ({voxels_per_sec:.3g} voxels/s)')

    # ---- fast inference mode: subpixel tail + bf16 body, one flag
    # (Sup3rGan.inference_mode='fast'); the accuracy budget is
    # validated end-to-end in tests/forward_pass/test_fast_mode.py,
    # and the on-device max abs deviation vs the exact path (in
    # normalized output units) is reported alongside the rate ----
    fast_vps = fast_err = fast_out_scale = None
    try:
        if not _have_time(180, 'fast inference mode'):
            raise _Skip
        model.inference_mode = 'fast'
        fast_apply, ffparams = model._get_fused_apply()
        ffparams = jax.device_put(ffparams)
        ffwd = jax.jit(lambda p, x: fast_apply(p, x, {}))
        maxerr = jax.jit(lambda a, b: jnp.max(jnp.abs(a - b)))
        fout = ffwd(ffparams, x)
        float(ssum(fout))  # warm compile + full sync
        fbest = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n_iters):
                fout = ffwd(ffparams, x)
            float(ssum(fout))
            fbest = min(fbest, (time.perf_counter() - t0) / n_iters)
        fast_vps = hr_voxels / fbest
        fast_err = float(maxerr(fout, out))
        # budgeted form: relative to the exact output's max magnitude
        # (the absolute normalized-units number tracks the random-
        # weight network's output scale, not the approximation)
        fast_out_scale = float(jax.jit(
            lambda a: jnp.max(jnp.abs(a)))(out))
        _stamp(f'fast mode done ({fast_vps:.3g} voxels/s)')
    except _Skip:
        pass
    except Exception:
        traceback.print_exc(file=sys.stderr)
    finally:
        model.inference_mode = 'exact'

    # ---- train step: full fused GAN step (gen fwd/bwd + disc fwd/bwd
    # + both optimizer updates in ONE XLA program) ----
    tb, tlr, thr = 16, (12, 12, 12), (36, 36, 48)
    rng = np.random.default_rng(1)
    # place the batch on device ONCE: re-uploading the 8 MB HR batch
    # through the tunnel every step would time the link, not the chip
    lr_b = jax.device_put(
        rng.random((tb, *tlr, 2)).astype(np.float32))
    hr_b = jax.device_put(
        rng.random((tb, *thr, 2)).astype(np.float32))
    train_flops = None
    try:
        _ = model.train_step_fn  # build (sets _raw_step)
        train_flops = _flops(
            model._raw_step,
            model.gen_params, model.disc_params,
            model._gen_opt_state, model._disc_opt_state,
            lr_b, hr_b, jnp.float32(1e-3), jnp.bool_(True),
            jnp.bool_(True), jax.random.PRNGKey(0))
    except Exception:
        pass
    # ---- full train-LOOP rate: what model.train's inner loop pays
    # per step — host batch -> H2D upload -> fused step -> loss-dict
    # fetch (scripts/bench_train.py path). The gap vs the pure step
    # rate below is the per-step host/tunnel cost that prefetch hides
    # when batches are produced ahead of the device. Must run BEFORE
    # the raw-step loop: that loop donates the model's param buffers
    # into the step, after which model.gen_params is deleted ----
    train_voxels = int(tb * np.prod(thr))
    train_loop_vps = None
    try:
        if not _have_time(150, 'train-loop tier'):
            raise _Skip
        _stamp('train loop: warm compile')
        lr_np = rng.random((tb, *tlr, 2)).astype(np.float32)
        hr_np = rng.random((tb, *thr, 2)).astype(np.float32)
        model.run_gradient_descent(lr_np, hr_np, train_gen=True,
                                   train_disc=True)  # warm
        n_loop = 4
        l_best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n_loop):
                model.run_gradient_descent(lr_np, hr_np,
                                           train_gen=True,
                                           train_disc=True)
            l_best = min(l_best, (time.perf_counter() - t0) / n_loop)
        train_loop_vps = train_voxels / l_best
        _stamp(f'train loop done ({train_loop_vps:.3g} voxels/s)')
    except _Skip:
        pass
    except Exception:
        traceback.print_exc(file=sys.stderr)

    # drive the jitted step directly, feeding donated state back in;
    # ONE loss-value fetch per timed block (not per step: each host
    # fetch is a full tunnel round trip)
    train_vps = train_tflops = None
    try:
        _stamp('train step: warm compile')
        step = model.train_step_fn
        state = (model.gen_params, model.disc_params,
                 model._gen_opt_state, model._disc_opt_state)
        w_adv = jnp.float32(1e-3)
        tt = jnp.bool_(True)
        key = jax.random.PRNGKey(0)
        *state, det = step(*state, lr_b, hr_b, w_adv, tt, tt, key)
        float(det['loss_gen'])  # warm compile + full sync
        n_train = 4
        t_best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n_train):
                *state, det = step(*state, lr_b, hr_b, w_adv, tt, tt,
                                   key)
            float(det['loss_gen'])  # value fetch = device completion
            t_best = min(t_best, (time.perf_counter() - t0) / n_train)
        train_vps = train_voxels / t_best
        train_tflops = (train_flops / t_best / 1e12) if train_flops \
            else None
        _stamp(f'train step done ({train_vps:.3g} voxels/s)')
    except Exception:
        traceback.print_exc(file=sys.stderr)

    # ---- bf16 mixed-precision train step (opt-in
    # train_dtype='bfloat16'; measured 1.29x in round 5 —
    # docs/PERFORMANCE.md "Mixed-precision training"). Fresh model:
    # the fp32 loop above donated the original param buffers ----
    train_bf16_vps = None
    try:
        if not _have_time(150, 'bf16 train tier'):
            raise _Skip
        _stamp('bf16 train step: warm compile')
        model_bf = Sup3rGan(get_config('spatiotemporal/gen_3x_4x_2f'),
                            get_config('spatiotemporal/disc_test'),
                            learning_rate=1e-4)
        model_bf.train_dtype = 'bfloat16'
        model_bf.init_weights((1, *tlr, 2), (1, *thr, 2))
        step = model_bf.train_step_fn
        state = (model_bf.gen_params, model_bf.disc_params,
                 model_bf._gen_opt_state, model_bf._disc_opt_state)
        w_adv = jnp.float32(1e-3)
        tt = jnp.bool_(True)
        key = jax.random.PRNGKey(0)
        *state, det = step(*state, lr_b, hr_b, w_adv, tt, tt, key)
        float(det['loss_gen'])
        b_best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(4):
                *state, det = step(*state, lr_b, hr_b, w_adv, tt, tt,
                                   key)
            float(det['loss_gen'])
            b_best = min(b_best, (time.perf_counter() - t0) / 4)
        train_bf16_vps = train_voxels / b_best
        _stamp(f'bf16 train step done ({train_bf16_vps:.3g} voxels/s)')
    except _Skip:
        pass
    except Exception:
        traceback.print_exc(file=sys.stderr)

    rec = {
        'metric': 'forward_pass_hr_voxels_per_sec_per_chip',
        'value': round(voxels_per_sec, 1),
        'unit': 'voxels/s',
        'vs_baseline': round(voxels_per_sec / INFER_BASELINE, 2),
        'train_baseline_batch': TRAIN_BASELINE_BATCH,
    }
    if train_vps is not None:
        rec['train_hr_voxels_per_sec'] = round(train_vps, 1)
        rec['train_vs_baseline'] = round(train_vps / TRAIN_BASELINE, 2)
    if fast_vps is not None:
        rec['fast_hr_voxels_per_sec'] = round(fast_vps, 1)
        rec['fast_speedup_vs_exact'] = round(fast_vps
                                             / voxels_per_sec, 2)
    if fast_err is not None:
        rec['fast_max_abs_err_norm_units'] = round(fast_err, 5)
        if fast_out_scale:
            # the budgeted metric (docs/PERFORMANCE.md): max abs
            # deviation relative to the exact output's max magnitude;
            # budget 0.04 (measured 0.0168 on chip at r4's recorded
            # 0.0766 abs / 4.55 out-scale; 0.0195 on CPU — ~2x margin)
            rec['fast_max_rel_err'] = round(fast_err / fast_out_scale,
                                            5)
    if train_loop_vps is not None:
        rec['train_loop_hr_voxels_per_sec'] = round(train_loop_vps, 1)
    if train_bf16_vps is not None:
        rec['train_bf16_hr_voxels_per_sec'] = round(train_bf16_vps, 1)
        if train_vps:
            rec['train_bf16_speedup'] = round(train_bf16_vps
                                              / train_vps, 3)
    e2e = dispatch = None
    if _have_time(420, 'E2E chunked-ForwardPass tier'):
        e2e, dispatch = _bench_fwp_e2e()
    if e2e is not None:
        # system number: single-vCPU host + ~30 MB/s tunnel fetch
        # bound this far below the device-apply rate in this image
        rec['fwp_e2e_hr_voxels_per_sec'] = round(e2e, 1)
    if dispatch is not None:
        # producer-side ceiling: same chunk prep + H2D + compute but
        # no output fetch/write — the e2e/dispatch gap is pure
        # drain-side (tunnel fetch + 1-vCPU H5 write) cost
        rec['fwp_e2e_dispatch_hr_voxels_per_sec'] = round(dispatch, 1)
    if infer_tflops is not None:
        rec['inference_tflops'] = round(infer_tflops, 2)
        rec['mfu_pct_bf16_peak'] = round(
            100.0 * infer_tflops / V5E_BF16_PEAK_TFLOPS, 1)
    if train_tflops is not None:
        rec['train_tflops'] = round(train_tflops, 2)
    print(json.dumps(rec))


if __name__ == '__main__':
    main()
