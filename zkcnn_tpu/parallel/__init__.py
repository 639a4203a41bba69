from .sharding import (make_mesh, sharded_fold_coeffs, sharded_ntt,
                       sharded_segment_sum, sharded_dot)

__all__ = ["make_mesh", "sharded_fold_coeffs", "sharded_ntt",
           "sharded_segment_sum", "sharded_dot"]
