"""Multi-container statistics: size-weighted means/stds with JSON
caching (reference: sup3r/preprocessing/collections/stats.py:30-168)."""

import json
import logging
import os

import numpy as np

from sup3r_tpu.preprocessing.grid import GridDataset, PairedDataset

logger = logging.getLogger(__name__)


def unwrap_container(c):
    """Resolve any container (DataHandler, GridDataset, PairedDataset,
    LazyGridDataset) to its underlying dataset (duck-typed on the
    ``sample`` method so lazy datasets unwrap too)."""
    if isinstance(c, (GridDataset, PairedDataset)) or hasattr(
            c, 'sample'):
        return c
    data = getattr(c, 'data', None)
    if isinstance(data, (GridDataset, PairedDataset)) or hasattr(
            data, 'sample'):
        return data
    return c


class StatsCollection:
    """Compute per-feature means/stds over a list of GridDatasets,
    weighted by container size, with optional JSON persistence."""

    def __init__(self, containers, means=None, stds=None):
        """``means``/``stds``: dicts, or .json file paths to load/save."""
        self.containers = containers
        self.means = self.get_means(means)
        self.stds = self.get_stds(stds)
        self.save_stats(means, stds)
        self.normalize_containers()

    #: stats member preference for paired datasets: the reference
    #: computes stats from ``c.high_res`` (collections/stats.py:60-62)
    #: — for CC pairs that's the HOURLY member (whose NaN nights the
    #: nan-reductions skip); daily means of totals-ratio csr are NOT
    #: the same statistic. lr-only features absent from the hr member
    #: fall back to the other member (reference merges the lr stats,
    #: stats.py:64-73).
    _PREFERRED = ('high_res', 'hourly')

    def _datasets(self):
        """Stats member per container (paired datasets use the
        high-res/hourly member, like the reference)."""
        out = []
        for c in self.containers:
            data = unwrap_container(c)
            if hasattr(data, 'members'):
                members = data.members
                key = next((k for k in self._PREFERRED
                            if k in members), None)
                data = members[key] if key else list(
                    members.values())[-1]
            out.append(data)
        return out

    def _stat_members(self, feature):
        """Per-container stats member for one feature: the preferred
        (hr/hourly) member, falling back to any member that carries it
        (lr-only features)."""
        out = []
        prefs = self._datasets()
        for c, pref in zip(self.containers, prefs):
            data = unwrap_container(c)
            members = (list(data.members.values())
                       if hasattr(data, 'members') else [data])
            ordered = [pref] + [m for m in members if m is not pref]
            member = next((m for m in ordered
                           if feature in m.features), None)
            if member is None:
                raise KeyError(
                    f'Feature "{feature}" not found in any member of '
                    f'container {type(c).__name__} for stats')
            out.append(member)
        return out

    @staticmethod
    def _member_nanstats(member, feature):
        """(nanmean, nanvar) for one member/feature — streamed for
        lazy datasets, direct reductions otherwise."""
        if hasattr(member, 'feature_nanstats'):
            return member.feature_nanstats(feature)
        arr = member[feature]
        return float(np.nanmean(arr)), float(np.nanvar(arr))

    def _all_features(self):
        """Union of features over every container/member, preferred
        member's features first."""
        feats = []
        for c, pref in zip(self.containers, self._datasets()):
            data = unwrap_container(c)
            members = [pref] + [
                m for m in getattr(data, 'members', {}).values()
                if m is not pref]
            for m in members:
                for f in m.features:
                    if f not in feats:
                        feats.append(f)
        return feats

    @property
    def container_weights(self):
        sizes = [d.size for d in self._datasets()]
        total = sum(sizes)
        return np.array([s / total for s in sizes])

    @staticmethod
    def _loadable(arg):
        return isinstance(arg, str) and os.path.exists(arg)

    def _given_stats(self, stats, what):
        """Resolve a user-provided stats dict/file; warn when it only
        covers SOME features — the missing ones are computed instead
        of being silently normalized with (0, 1) (reference:
        collections/stats.py:75-100 _init_stats_dict)."""
        if self._loadable(stats):
            with open(stats) as f:
                stats = json.load(f)
        if not isinstance(stats, dict) or not stats:
            return {}
        out = {k: float(v) for k, v in stats.items()}
        missing = [f for f in self._all_features() if f not in out]
        if missing:
            from warnings import warn

            warn(f'Given {what} cover {sorted(out)} but not {missing};'
                 f' computing the missing {what} from the data. If the'
                 ' stats come from a prior run make sure they carry '
                 'over.')
        return out

    def get_means(self, means):
        """Resolve means: dict/file for covered features + computed
        weighted means for the rest."""
        out = self._given_stats(means, 'means')
        weights = self.container_weights
        for f in self._all_features():
            if f not in out:
                vals = [self._member_nanstats(m, f)[0]
                        for m in self._stat_members(f)]
                out[f] = float(np.sum(weights * np.array(vals)))
        return out

    def get_stds(self, stds):
        """Resolve stds: dict/file for covered features + computed
        sqrt-of-weighted-mean-variance for the rest."""
        out = self._given_stats(stds, 'stds')
        weights = self.container_weights
        for f in self._all_features():
            if f not in out:
                vals = [self._member_nanstats(m, f)[1]
                        for m in self._stat_members(f)]
                out[f] = float(np.sqrt(np.sum(weights
                                              * np.array(vals))))
        return out

    def save_stats(self, means, stds):
        """Write stats to the given .json paths if they don't exist."""
        if isinstance(means, str) and not os.path.exists(means):
            with open(means, 'w') as f:
                json.dump(self.means, f, indent=2)
        if isinstance(stds, str) and not os.path.exists(stds):
            with open(stds, 'w') as f:
                json.dump(self.stds, f, indent=2)

    def normalize_containers(self):
        """Normalize every container in place with the collected stats."""
        for c in self.containers:
            data = unwrap_container(c)
            members = (list(data.members.values())
                       if hasattr(data, 'members') else [data])
            for m in members:
                means = {f: self.means.get(f, 0.0) for f in m.features}
                stds = {f: self.stds.get(f, 1.0) for f in m.features}
                m.normalize(means, stds)
