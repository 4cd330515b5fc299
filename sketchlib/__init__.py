"""sketchlib — PySpark-native distributed sketch / approximate-aggregation
library.

From-scratch reimplementation of the query semantics of
crepererum-oss/pdatastructs.rs (reference read-only at /root/reference)
as mergeable aggregators for Apache Spark: pure-numpy kernels
(HyperLogLog++, Count-Min, Bloom, t-digest, KLL, reservoir, top-k) plus a
DataFrame-level two-stage partial/final merge topology built on
mapInArrow/applyInPandas — no per-row Python anywhere.
"""

from .ams import CountSketch
from .bloom import BloomFilter
from .cms import CountMinSketch
from .ddsketch import DDSketch
from .codec import SketchCodecError, SketchParamMismatch
from .cuckoo import CuckooFilter, CuckooFilterFull
from .fd import FrequentDirections
from .hll import HLL
from .quotient import QuotientFilter, QuotientFilterFull
from .kll import KLL
from .kmv import KMV
from .reservoir import Reservoir
from .tdigest import TDigest
from .topk import LossyCounter, SpaceSaving, TopK

__all__ = [
    "HLL",
    "CountSketch",
    "CountMinSketch",
    "BloomFilter",
    "TDigest",
    "DDSketch",
    "KLL",
    "KMV",
    "LossyCounter",
    "SpaceSaving",
    "TopK",
    "Reservoir",
    "CuckooFilter",
    "CuckooFilterFull",
    "QuotientFilter",
    "QuotientFilterFull",
    "SketchCodecError",
    "SketchParamMismatch",
]

__version__ = "0.1.0"
