"""raysketch — a Ray-Data-native distributed sketch / approximate-aggregation library.

From-scratch re-expression of the capabilities of f0t1h/bloomfilter (see SURVEY.md):
a partitioned Bloom filter (Kirsch–Mitzenmacher double hashing, murmur3/xxh64 hash
pairs, high-bit hash sharding) extended with HyperLogLog, count-min, t-digest and KLL,
each a mergeable aggregate over zero-copy Arrow batches, plus dedup / similarity /
text-analysis pipelines for large-scale corpora.

No module in this package calls ``ray.init()`` — the caller owns the Ray session.
"""

__version__ = "0.1.0"

from raysketch.sketches.bloom import BloomSketch, PartitionedBloom  # noqa: F401
from raysketch.sketches.hll import HyperLogLog  # noqa: F401
from raysketch.sketches.cms import CountMinSketch  # noqa: F401
from raysketch.sketches.tdigest import TDigest  # noqa: F401
from raysketch.sketches.kll import KLL  # noqa: F401
from raysketch.sketches.ddsketch import DDSketch  # noqa: F401
