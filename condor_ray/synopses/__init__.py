"""The twelve Condor synopses as vectorized NumPy kernels (SURVEY.md §2.1)."""

from .base import Synopsis
from .cuckoo import CuckooFilter
from .ddsketch import DDSketch
from .histograms import BarSplittingHistogram, EquiDepthHistogram, EquiWidthHistogram
from .histograms_extra import (
    EquiDepthHistBuilder,
    EquiWidthHistogram4LT,
    RealValuedBucket4LT,
    SplitAndMergeWithDDSketch,
)
from .registry import get_synopsis_class, make_synopsis, register_synopsis
from .sampling import (
    BiasedReservoirSampler,
    FiFoSampler,
    ReservoirSampler,
    TimestampedElement,
)
from .sketches import BloomFilter, CountMinSketch, FastAGMS, HyperLogLogSketch
from .wavelets import (
    DistributedWaveletsManager,
    NonMergeableSynopsisManager,
    SliceWaveletsManager,
    WaveletSynopsis,
)

__all__ = [
    "Synopsis",
    "CountMinSketch",
    "HyperLogLogSketch",
    "BloomFilter",
    "CuckooFilter",
    "FastAGMS",
    "DDSketch",
    "EquiWidthHistogram",
    "EquiDepthHistogram",
    "BarSplittingHistogram",
    "EquiDepthHistBuilder",
    "RealValuedBucket4LT",
    "EquiWidthHistogram4LT",
    "SplitAndMergeWithDDSketch",
    "ReservoirSampler",
    "FiFoSampler",
    "BiasedReservoirSampler",
    "TimestampedElement",
    "WaveletSynopsis",
    "DistributedWaveletsManager",
    "SliceWaveletsManager",
    "NonMergeableSynopsisManager",
    "register_synopsis",
    "get_synopsis_class",
    "make_synopsis",
]
