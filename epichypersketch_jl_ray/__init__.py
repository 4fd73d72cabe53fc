"""epichypersketch_jl_ray — a Ray-Data-native distributed sketch / approximate
aggregation engine.

Re-expresses the query and data-processing capabilities of the reference
EpicHyperSketch.jl (count-min-sketch motif enumeration; see
/root/reference/src/EpicHyperSketch.jl) as idiomatic Ray Data pipelines:
``ray.data.Dataset`` → ``map_batches`` over zero-copy Arrow batches, stateful
actor pools for sketch building, driver/tree merge of mergeable sketch states,
and a broadcast (``ray.put``) read-only sketch for the selection pass.

Sub-packages
------------
state/      pure-numpy mergeable sketch kernels (CountMin, HLL, KLL, TDigest,
            Bloom, MinHash, SimHash) — no Ray dependency.
functions/  vectorized batch functions (hashing, tokenization, html extraction).
sources/    readers + deterministic fixture generators (webpages table).
stages/     Ray Data stage builders (UDAF harness, motif enumeration, dedup, ann).
pipelines/  end-user pipelines; each has a ``queries()`` entry in __ray_entry__.
"""

from epichypersketch_jl_ray.config import SketchConfig

__version__ = "0.1.0"

__all__ = ["SketchConfig", "__version__"]
