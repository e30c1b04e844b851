"""Multi-process jax.distributed worker (VERDICT r3 #4).

Launched by tests/test_parallel.py::test_multiprocess_distributed as N
processes x 4 virtual CPU devices each. Joins the global runtime via
init_distributed, builds a GLOBAL mesh spanning every process's devices, and
runs the production shard_map collectives across the process boundary:

- make_sharded_link_step's psum over the `link` axis (the per-cell KPI
  aggregate) — the full PDSCH chain executes sharded over all global
  devices, half of them in the OTHER process;
- network_dl_step's all_gather over the `cell` axis (inter-cell
  interference exchange).

Prints one JSON line with the replicated (hence process-addressable)
results; the test compares them against the single-process reference.
Emulates the reference's networkSimulation.m:44-55 parfeval fan-out, except
the workers actually COMMUNICATE (the parfeval pool shares nothing).
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    coord, n_proc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    from isac_tpu.parallel.distributed import global_mesh, init_distributed

    info = init_distributed(coordinator_address=coord, num_processes=n_proc,
                            process_id=pid)
    assert info["num_processes"] == n_proc, info
    assert info["local_devices"] == 4, info
    n_dev = info["global_devices"]

    import __graft_entry__ as ge
    import jax.numpy as jnp
    from isac_tpu.parallel import (
        global_mesh as gm,  # noqa: F401 (re-export check)
        make_sharded_link_step,
        network_dl_step,
    )

    # ---- link-axis psum across the process boundary (full PDSCH chain) ----
    g, (tb, w, h, noise), tbs = ge._example_link_batch(
        n_prb=4, n_links=n_dev, mcs=10)
    mesh = global_mesh({"link": -1})
    fn, _ = make_sharded_link_step(g, mesh=mesh)
    out = fn(tb, w, h, noise)
    n_ok = int(np.asarray(out["n_ok"]))  # P() replicated -> addressable

    # ---- cell-axis all_gather across the process boundary ----
    C, n_tx, n_rx, S, K = n_dev, 2, 2, 4, 24
    rng = np.random.default_rng(0)

    def cplx(*shape):
        return (rng.standard_normal(shape)
                + 1j * rng.standard_normal(shape)).astype(np.complex64)

    txg = cplx(C, n_tx, S, K)
    hc = cplx(C, C, S, K, n_rx, n_tx)
    gains = rng.uniform(0.0, 1.0, (C, C)).astype(np.float32)
    nz = (cplx(C, n_rx, S, K) * 0.1).astype(np.complex64)
    mesh_c = global_mesh({"cell": -1})
    rx = network_dl_step(mesh_c)(txg, hc, gains, nz)
    # reduce to a replicated scalar so every process can fetch it
    from jax.sharding import NamedSharding, PartitionSpec as P

    tot = jax.jit(
        lambda x: jnp.sum(jnp.abs(x)).astype(jnp.float32),
        out_shardings=NamedSharding(mesh_c, P()),
    )(rx)
    rx_sum = float(np.asarray(tot))

    print(json.dumps({"pid": info["process_id"], "n_devices": n_dev,
                      "n_ok": n_ok, "rx_abs_sum": rx_sum}))


if __name__ == "__main__":
    main()
