"""Synopsis registry — mirrors Condor's reflective ``Class<S> + Object[]``
construction (conn/.../processor/compute/flink/SynopsisAggregator.java:66-86)
with a name -> class map plus positional params."""

from __future__ import annotations

from .base import Synopsis
from .cuckoo import CuckooFilter
from .ddsketch import DDSketch
from .histograms import BarSplittingHistogram, EquiWidthHistogram
from .histograms_extra import SplitAndMergeWithDDSketch
from .sampling import BiasedReservoirSampler, FiFoSampler, ReservoirSampler
from .sketches import BloomFilter, CountMinSketch, FastAGMS, HyperLogLogSketch
from .wavelets import (
    DistributedWaveletsManager,
    SliceWaveletsManager,
    WaveletSynopsis,
)

_REGISTRY: dict[str, type] = {
    cls.__name__: cls
    for cls in (
        CountMinSketch,
        HyperLogLogSketch,
        BloomFilter,
        CuckooFilter,
        FastAGMS,
        DDSketch,
        EquiWidthHistogram,
        BarSplittingHistogram,
        SplitAndMergeWithDDSketch,
        ReservoirSampler,
        FiFoSampler,
        BiasedReservoirSampler,
        WaveletSynopsis,
        DistributedWaveletsManager,
        SliceWaveletsManager,
    )
}


def register_synopsis(cls: type) -> type:
    """User-extension hook (SURVEY §2.9): register a custom Synopsis subclass."""
    if not issubclass(cls, Synopsis):
        raise TypeError("synopsis classes must subclass Synopsis")
    _REGISTRY[cls.__name__] = cls
    return cls


def get_synopsis_class(name: str) -> type:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown synopsis {name!r}; registered: {sorted(_REGISTRY)}"
        ) from None


def make_synopsis(name: str, params: tuple) -> Synopsis:
    return get_synopsis_class(name)(*params)
