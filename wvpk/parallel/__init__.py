"""Multi-chip scaling: data-parallel lane sharding over a 1-D device mesh.

Blocks are self-seeded (SURVEY.md section 2.3), so batch decode is pure
data parallelism: shard the lane axis with `jax.sharding`, no collectives
on the hot path (ICI only carries the optional metrics all-reduce). This
replaces nothing in the reference — it has no distribution story at all —
and follows the "pick a mesh, annotate shardings, let XLA do the rest"
recipe.
"""

from .mesh import (make_mesh, shard_bucket_arrays, shard_lanes_call,
                   sharded_decode_bucket, sharded_decode_states)

__all__ = ["make_mesh", "shard_bucket_arrays", "shard_lanes_call",
           "sharded_decode_bucket", "sharded_decode_states"]
