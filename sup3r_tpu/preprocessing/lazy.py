"""Streaming (lazy) training data plane.

``LazyGridDataset`` is the sampler-facing facade for training data that
does NOT fit host RAM: instead of one dense ``(s1, s2, t, f)`` numpy
block (``GridDataset``), it holds lazily-windowed raw variables and
derives the requested features PER SAMPLED WINDOW, reading only that
window from disk. This is the TPU-native redesign of the reference's
dask-lazy training stores (``mode='lazy'``: reference
sup3r/preprocessing/batch_queues/abstract.py:135-141 defers compute to
sample time, samplers/base.py:228-243 computes the sampled slice).

Exactness vs the eager path: every supported derivation is pointwise
per pixel EXCEPT the wind (ws, wd) <-> (u, v) rotation, whose grid
angle at row r uses the delta between rows r and r-1 (with row 0
reusing row 1's angle — ops/wind.py). Sampling therefore reads ONE
extra halo row above the window whenever the window does not start at
the domain's first row, derives on the padded window and crops — which
makes windowed derivation bit-identical to full-domain derivation.

Features whose derivation is spatially non-local (the base-registry
``clearsky_ratio``/``cloud_mask`` night masks reduce over the whole
spatial extent) are rejected at construction; those belong to the
solar-CC handlers, which are eager by design (whole-day batching needs
the daily/hourly pairing anyway).
"""

import logging

import numpy as np

from sup3r_tpu.names import Dimension
from sup3r_tpu.preprocessing.derivers import Deriver, _Method
from sup3r_tpu.preprocessing.loaders import compose_slice

logger = logging.getLogger(__name__)


class _LazyH5Raster:
    """Lazy (s1, s2, t) raster view of one flattened-H5 variable: a
    window read maps the (s1, s2) window to its gid block and pulls
    only those site columns for the composed time slice (the
    gid-window equivalent of ``_LazyNCVar`` — reference laziness via
    rex/dask, sup3r/preprocessing/loaders/h5.py)."""

    dims = (Dimension.SOUTH_NORTH, Dimension.WEST_EAST, Dimension.TIME)

    def __init__(self, loader, feature, gids, time_slice):
        self._loader = loader
        self._feature = feature
        self._gids = np.asarray(gids)
        self._file_t = (len(loader.time_index)
                        if loader.time_index is not None else 1)
        self._time_slice = time_slice
        n_t = len(range(self._file_t)[time_slice])
        self.shape = (*self._gids.shape, n_t)
        self.ndim = 3
        self.dtype = np.float32

    def isel(self, sel):
        """Read a window; ``sel`` maps canonical dim name -> slice."""
        s1 = sel.get(Dimension.SOUTH_NORTH, slice(None))
        s2 = sel.get(Dimension.WEST_EAST, slice(None))
        t = sel.get(Dimension.TIME, slice(None))
        g = self._gids[s1, s2]
        tsl = compose_slice(self._time_slice, t, self._file_t)
        block = self._loader.get(self._feature, tsl, g.ravel())
        n_t = block.shape[0]
        return np.ascontiguousarray(
            block.T.reshape(*g.shape, n_t))

    def __getitem__(self, idx):
        return self.materialize()[idx]

    def __array__(self, dtype=None, copy=None):
        out = self.materialize()
        return out.astype(dtype) if dtype is not None else out

    def materialize(self):
        """Full read in canonical order."""
        return self.isel({})


#: spatially non-local derivation functions (night masks reduce over
#: the whole spatial extent) — windowed derivation would diverge from
#: the eager path, so lazy datasets reject them loudly
_NONLOCAL_FNS = ('_clearsky_ratio', '_cloud_mask')


class LazyGridDataset:
    """Sampler-compatible dataset that derives features per sampled
    window, reading only that window from disk.

    Exposes the subset of the ``GridDataset`` API the training stack
    touches: ``shape``/``grid_shape``/``size``/``features``/
    ``lat_lon``/``time_index``/``sample(idx)``/``normalize``, plus
    streaming ``feature_nanstats`` for ``StatsCollection``.
    """

    def __init__(self, raw, features, FeatureRegistry=None,
                 interp_kwargs=None, nan_method_kwargs=None,
                 time_shift=None, stats_block_elems=2 ** 22):
        """``raw``: full-extent RawDataset whose variables are lazy
        (``_LazyWindow``/``_LazyNCVar``/``_LazyH5Raster``).
        ``nan_method_kwargs``: only ``{'method': 'nearest'}`` is
        supported and fills NaNs PER WINDOW (window-local semantics —
        documented difference from the eager full-domain fill; reject
        NaN-bearing data if bit-parity with eager mode matters)."""
        self.raw = raw
        self.features = [f.lower() for f in features]
        self.registry = FeatureRegistry
        self.interp_kwargs = interp_kwargs or {}
        nan_kwargs = nan_method_kwargs or None
        if nan_kwargs and nan_kwargs.get('method', 'nearest') != 'nearest':
            raise NotImplementedError(
                "lazy datasets support only nan_method_kwargs={'method':"
                " 'nearest'} (window-local fill); method "
                f"'{nan_kwargs.get('method')}' needs the full domain — "
                "use mode='eager'")
        self.nan_method_kwargs = nan_kwargs
        self.lat_lon = raw.lat_lon
        ti = raw.time_index
        if time_shift is not None and ti is not None:
            ti = ti.shift(time_shift, freq='min')
        self.time_index = ti
        self.attrs = dict(raw.attrs or {})
        self.levels = raw.levels
        self._means = None
        self._stds = None
        self._stats_cache = {}
        self._stats_block_elems = int(stats_block_elems)
        self._check_local(self.features)

    # ------------------------------------------------------------------
    def _check_local(self, features):
        """Reject features whose derivation closure is spatially
        non-local (full-extent reductions can't be windowed)."""
        registry = self.registry or Deriver.FEATURE_REGISTRY
        probe = Deriver.__new__(Deriver)
        probe.FEATURE_REGISTRY = registry
        seen, stack = set(), [f.lower() for f in features]
        while stack:
            f = stack.pop()
            if f in seen or f in self.raw:
                continue
            seen.add(f)
            method = probe._check_registry(f)
            if isinstance(method, str):
                stack.append(Deriver._map_new_name(f, method))
                continue
            if isinstance(method, _Method):
                if method.fn.__name__ in _NONLOCAL_FNS:
                    raise NotImplementedError(
                        f'Feature "{f}" derives through the spatially '
                        'non-local night mask (full-extent reduction); '
                        "it cannot be windowed — use mode='eager'")
                stack.extend(probe._get_inputs(f, method))

    # ------------------------------------------------------------------
    @property
    def shape(self):
        """(s1, s2, t, f)"""
        t = 0 if self.time_index is None else len(self.time_index)
        return (*self.lat_lon.shape[:2], t, len(self.features))

    @property
    def grid_shape(self):
        """(s1, s2)"""
        return self.lat_lon.shape[:2]

    @property
    def size(self):
        return int(np.prod(self.shape))

    def __contains__(self, feature):
        return str(feature).lower() in self.features

    def __repr__(self):
        return (f'LazyGridDataset(shape={self.shape}, '
                f'features={self.features})')

    # ------------------------------------------------------------------
    def _derive_window(self, s1, s2, t, features):
        """Derive ``features`` on the (s1, s2, t) window, with the
        1-row top halo that makes wind-rotation windows bit-exact."""
        start1, stop1, _ = s1.indices(self.shape[0])
        halo = 1 if start1 > 0 else 0
        # a height-1 window at row 0 would hand _grid_angle a single
        # row (the roll delta wraps onto itself -> wrong angle);
        # extend one row BELOW and crop it after, which reproduces the
        # full-domain row-0 angle (row 0 reuses the row-0/row-1 delta)
        halo_bot = 1 if (halo == 0 and stop1 - start1 == 1
                         and stop1 < self.shape[0]) else 0
        win = self.raw.isel(s1=slice(start1 - halo, stop1 + halo_bot),
                            s2=s2, t=t)
        if self.raw.time_index is not None:
            # the deriver must see the RAW file timestamps, never the
            # time_shift-ed labels: the eager path derives first and
            # shifts only the label index afterwards
            # (derivers.py:312-314), so time-DEPENDENT derivations
            # (sza) anchor to the file clock. Handing the shifted
            # index here moved sza by time_shift (~5.8 deg at -30 min)
            tsl = t if isinstance(t, slice) else slice(t, t + 1)
            win.time_index = self.raw.time_index[tsl]
        der = Deriver(win, features,
                      nan_method_kwargs=self.nan_method_kwargs,
                      FeatureRegistry=self.registry,
                      interp_kwargs=self.interp_kwargs)
        block = der.data.data
        if halo:
            block = block[1:]
        if halo_bot:
            block = block[:-1]
        return block

    def sample(self, idx):
        """Crop by an index tuple (s1, s2, t, feature_list_or_slice)
        — the sampler hot path. Reads only the sampled window (+1 halo
        row) from disk and derives on it.

        Matches ``GridDataset``'s plain-numpy indexing semantics
        exactly: the window is derived on the CONTIGUOUS span, then
        the caller's ORIGINAL index expression is re-applied locally —
        so integer squeezing, slice steps, and numpy's mixed
        basic/advanced rules (an integer axis combined with an integer
        -array feature index moves the broadcast axis to the front,
        as ``data[s1, s2, t, f]`` does) all come from numpy itself.
        Deriving on the contiguous span matters: wind rotation's row
        angle uses adjacent rows, so deriving on strided rows directly
        would diverge from eager. Negative steps are rejected (row
        order matters to the rotation)."""
        s1, s2, t, f = idx
        # which features to derive, and the index that re-applies the
        # caller's feature selection on the derived block's last axis
        two_step = (isinstance(f, (list, tuple)) and f
                    and isinstance(f[0], str))
        if two_step:
            # eager: data[s1, s2, t][..., positions] — two separate
            # indexing ops, so name lists never join the advanced-
            # index broadcast; derive in the requested order
            feats = [x.lower() for x in f]
            f_local = slice(None)
        elif isinstance(f, slice):
            feats = self.features[f]
            f_local = slice(None)
        elif np.ndim(f) == 0:
            feats = [self.features[int(f)]]
            f_local = 0
        else:
            pos = [int(i) for i in np.atleast_1d(f)]
            feats, remap = [], []
            for i in pos:
                name = self.features[i]
                if name not in feats:
                    feats.append(name)
                remap.append(feats.index(name))
            f_local = np.asarray(remap)
        spans, local = [], []
        for ax, ix in enumerate((s1, s2, t)):
            n = self.shape[ax]
            if isinstance(ix, slice):
                start, stop, step = ix.indices(n)
                if step < 0:
                    raise NotImplementedError(
                        'negative-step slices are unsupported in lazy '
                        'sampling (wind rotation depends on row '
                        "order) — use mode='eager'")
                spans.append(slice(start, max(stop, start)))
                local.append(slice(None, None, step))
            else:
                i = int(ix)
                i += n if i < 0 else 0
                spans.append(slice(i, i + 1))
                local.append(0)
        block = self._derive_window(*spans, feats)
        if self._means is not None:
            mean = np.array([self._means.get(x, 0.0) for x in feats],
                            dtype=np.float32)
            std = np.array([self._stds.get(x, 1.0) or 1.0
                            for x in feats], dtype=np.float32)
            block = (block - mean) / std
        if two_step:
            return block[tuple(local)]
        return block[(*local, f_local)]

    # ------------------------------------------------------------------
    def normalize(self, means, stds):
        """Record per-feature stats; applied to every sampled window
        (the eager path normalizes its block in place once — same
        elementwise float32 op, so samples stay bit-identical)."""
        merged = dict(self._means or {})
        merged.update({k.lower(): float(v) for k, v in means.items()})
        self._means = merged
        merged_s = dict(self._stds or {})
        merged_s.update({k.lower(): float(v) for k, v in stds.items()})
        self._stds = merged_s

    def feature_nanstats(self, feature):
        """(nanmean, nanvar) of one derived feature, streamed over
        full-spatial time blocks (never materializes the feature).
        Used by StatsCollection in place of ``np.nanmean(m[feature])``.
        """
        feature = str(feature).lower()
        if feature in self._stats_cache:
            return self._stats_cache[feature]
        s1, s2, n_t, _ = self.shape
        block_t = max(1, self._stats_block_elems // max(s1 * s2, 1))
        count = 0
        total = 0.0
        total_sq = 0.0
        # shifted accumulation: sum (x - shift) and (x - shift)^2 with
        # shift = the first block's mean, so the closing
        # E[d^2] - E[d]^2 subtracts numbers of the VARIANCE's scale.
        # A raw one-pass E[x^2] - mean^2 cancels catastrophically for
        # large-mean/small-variance features (~15% of the variance
        # gone at mean~1e5, std~0.01 even in float64 accumulators).
        shift = None
        for t0 in range(0, n_t, block_t):
            block = self._derive_window(
                slice(0, s1), slice(0, s2),
                slice(t0, min(t0 + block_t, n_t)), [feature])
            arr = block[..., 0].astype(np.float64)
            if shift is None:
                m = np.nanmean(arr)
                shift = float(m) if np.isfinite(m) else 0.0
            d = arr - shift
            finite = np.isfinite(d)
            count += int(finite.sum())
            total += float(np.nansum(d))
            total_sq += float(np.nansum(d * d))
        if count == 0:
            stats = (float('nan'), float('nan'))
        else:
            dmean = total / count
            stats = (shift + dmean,
                     max(total_sq / count - dmean * dmean, 0.0))
        self._stats_cache[feature] = stats
        return stats
