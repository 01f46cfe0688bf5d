"""r4 probe E: per-dispatch launch overhead through the axon tunnel.

The split training step runs 5 dispatches/iteration. If launch latency were
O(ms) and non-overlapped, merging seams would matter; if launches pipeline
behind compute, the seam count is free. Measures sequential DEPENDENT tiny
dispatches (worst case: no compute to hide behind).
"""
import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

f = jax.jit(lambda x: x + 1.0)
x = jnp.zeros((8, 128), jnp.float32)
x = f(x); float(jnp.sum(x[:1, :1]))
t0 = time.perf_counter()
N = 300
for _ in range(N):
    x = f(x)
float(jnp.sum(x[:1, :1]))
dt = (time.perf_counter() - t0) / N
print(f"dependent tiny dispatch: {dt*1e3:.3f} ms each "
      f"({jax.default_backend()})")

# same, but 5 distinct programs round-robin (the split step's shape)
fs = [jax.jit(lambda x, k=k: x + float(k + 1)) for k in range(5)]
for g in fs:
    x = g(x)
float(jnp.sum(x[:1, :1]))
t0 = time.perf_counter()
for _ in range(60):
    for g in fs:
        x = g(x)
float(jnp.sum(x[:1, :1]))
dt = (time.perf_counter() - t0) / 300
print(f"5-program round-robin:   {dt*1e3:.3f} ms per dispatch")
