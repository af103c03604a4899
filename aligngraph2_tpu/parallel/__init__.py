from .mesh import make_mesh
from .sharded import (build_block_index, sharded_align_step,
                      make_sharded_step)

__all__ = ["make_mesh", "build_block_index", "sharded_align_step",
           "make_sharded_step"]
