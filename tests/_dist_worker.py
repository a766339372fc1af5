"""Worker script for the 2-process jax.distributed test.

Run as: python tests/_dist_worker.py <coordinator> <num_procs> <proc_id>

Exercises bayesian_torch_tpu.parallel.distributed.initialize with an
explicit coordinator (the multi-host path), then runs one real
cross-process collective (psum over a mesh spanning both processes)
and prints machine-checkable markers for the parent test.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")  # axon plugin ignores env var


def main():
    coordinator, num_procs, proc_id = (sys.argv[1], int(sys.argv[2]),
                                       int(sys.argv[3]))
    from bayesian_torch_tpu.parallel.distributed import initialize

    n_devices = initialize(coordinator_address=coordinator,
                           num_processes=num_procs, process_id=proc_id)
    assert jax.process_count() == num_procs, jax.process_count()
    print(f"DEVICES={n_devices}", flush=True)

    # one real collective across the process boundary: psum of the
    # process-local contribution (proc_id + 1) -> 1 + 2 = 3
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(jax.devices(), ("d",))
    local = jnp.asarray([float(proc_id + 1)])
    garr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("d")), local)

    @jax.jit
    def total(x):
        return jnp.sum(x)

    result = total(garr)
    # the jitted reduction replicates its scalar output across the mesh;
    # every process reads its own addressable copy (process_allgather on
    # a non-fully-addressable array requires tiled=True in current jax)
    val = float(result.addressable_data(0))
    print(f"PSUM={val}", flush=True)
    print("WORKER_OK", flush=True)


if __name__ == "__main__":
    main()
