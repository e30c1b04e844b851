"""Measure relay H2D / D2H bandwidth + per-call overhead."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
from isac_tpu.utils.compcache import enable_persistent_cache
enable_persistent_cache()
import jax, jax.numpy as jnp
print("backend", jax.default_backend(), flush=True)

@jax.jit
def consume(x):
    return jnp.float32(x.astype(jnp.float32).sum() * 1e-9)

@jax.jit
def produce(n, seed):
    return jax.random.normal(jax.random.PRNGKey(seed), (n,), jnp.float32)

for mb in (0.1, 1.0, 4.0, 16.0):
    n = int(mb * 1e6)
    arrs = [np.random.default_rng(i).integers(0, 2, n).astype(np.int8) for i in range(3)]
    float(consume(arrs[0]))  # warm
    t0 = time.perf_counter()
    for a in arrs[1:]:
        float(consume(a))
    dt = (time.perf_counter() - t0) / 2
    print(f"H2D int8 {mb:5.1f} MB: {dt*1e3:7.1f} ms  {mb/dt:8.1f} MB/s", flush=True)

for mb in (0.1, 1.0, 4.0, 16.0):
    n = int(mb * 1e6 // 4)
    float(np.asarray(produce(n, 0)).sum())  # warm compile
    t0 = time.perf_counter()
    for s in (1, 2):
        np.asarray(produce(n, s))
    dt = (time.perf_counter() - t0) / 2
    print(f"D2H f32  {mb:5.1f} MB: {dt*1e3:7.1f} ms  {mb/dt:8.1f} MB/s", flush=True)
