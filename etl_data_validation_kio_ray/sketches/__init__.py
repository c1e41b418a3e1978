from .hist import CountingHist, FixedHistogram
from .hll import HyperLogLog
from .tdigest import TDigest

__all__ = ["CountingHist", "FixedHistogram", "HyperLogLog", "TDigest"]
