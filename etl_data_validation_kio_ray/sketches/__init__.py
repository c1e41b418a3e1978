from .heavyhitters import heavy_hitters, mg_summary
from .hist import CountingHist, FixedHistogram
from .hll import HyperLogLog
from .tdigest import TDigest

__all__ = [
    "CountingHist",
    "FixedHistogram",
    "HyperLogLog",
    "TDigest",
    "heavy_hitters",
    "mg_summary",
]
