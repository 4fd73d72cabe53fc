"""Pure-numpy mergeable sketch kernels (no Ray dependency).

Every sketch follows the MergeableSketch protocol (state/base.py): seeded
construction, vectorized ``update_*`` over numpy arrays, associative
``merge``, ``query``, and canonical serialization — the plug-in surface the
reference lacks (/root/reference/src/EpicHyperSketch.jl exports only the CMS
pieces; SURVEY.md §2.11).
"""

from epichypersketch_jl_ray.state.base import MergeableSketch
from epichypersketch_jl_ray.state.countmin import CountMin
from epichypersketch_jl_ray.state.hll import HyperLogLog
from epichypersketch_jl_ray.state.kll import KLL
from epichypersketch_jl_ray.state.tdigest import TDigest
from epichypersketch_jl_ray.state.bloom import BloomFilter
from epichypersketch_jl_ray.state.minhash import MinHasher, simhash64
from epichypersketch_jl_ray.state.reservoir import ReservoirSample
from epichypersketch_jl_ray.state.spacesaving import SpaceSaving
from epichypersketch_jl_ray.state.ddsketch import DDSketch
from epichypersketch_jl_ray.state.grouped import GroupedSketch
from epichypersketch_jl_ray.state.theta import ThetaSketch
from epichypersketch_jl_ray.state.frequentdirections import FrequentDirections
from epichypersketch_jl_ray.state.countsketch import CountSketch
from epichypersketch_jl_ray.state.tuplestate import TupleState
from epichypersketch_jl_ray.state.keyset import Int64Set

__all__ = [
    "MergeableSketch",
    "CountMin",
    "HyperLogLog",
    "KLL",
    "TDigest",
    "BloomFilter",
    "MinHasher",
    "simhash64",
    "SpaceSaving",
    "ReservoirSample",
    "DDSketch",
    "GroupedSketch",
    "ThetaSketch",
    "FrequentDirections",
    "CountSketch",
    "TupleState",
    "Int64Set",
]
