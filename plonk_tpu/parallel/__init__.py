from .sharding import make_domain_mesh, shard_poly, sharded_quotient_step

__all__ = ["make_domain_mesh", "shard_poly", "sharded_quotient_step"]
