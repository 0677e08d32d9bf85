"""Multi-chip execution (SURVEY.md §7.2): view-sharded shard_map step.

``sharded.make_mesh`` + ``sharded.sharded_forward_step`` run the fused
forward step over a 1-D ("views",) device mesh; see module docstring for
the collective schedule.  For multi-host pods, initialize
``jax.distributed`` first and build the mesh over all global devices —
the segment all_gather then rides ICI within a slice and DCN across hosts.
"""

from . import sharded

__all__ = ["sharded"]
