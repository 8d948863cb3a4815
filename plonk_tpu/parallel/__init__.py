from .sharding import make_domain_mesh, shard_poly, sharded_quotient_step

__all__ = ["make_domain_mesh", "shard_poly", "sharded_quotient_step"]


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None):
    """Multi-host bring-up: jax.distributed.initialize + a mesh over every
    chip in the slice (SURVEY.md section 5.8 — the reference has no
    distributed layer; this is the TPU-native equivalent: ICI within a slice,
    DCN across hosts, collectives inserted by GSPMD).

    On single-host test rigs the call degrades to a local mesh.
    """
    import jax

    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    return make_domain_mesh(jax.devices())


__all__.append("init_distributed")
