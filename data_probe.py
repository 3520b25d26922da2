"""Ad-hoc TPU primitive microbenchmarks (not part of the test suite)."""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/data/.jaxcache")
import time

import jax
import jax.numpy as jnp
import numpy as np

from ebwt2indel_tpu.ops import packing, rank
from ebwt2indel_tpu.models import fm_index as fm_ops, traverse
from ebwt2indel_tpu.models.fm_index import FMIndex

def bench(name, fn, *args, iters=20):
    fn(*args)  # compile
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1000:.2f} ms", flush=True)
    return dt

rng = np.random.default_rng(0)
n = 10_000_000
codes = rng.integers(0, 4, n).astype(np.uint8)
codes[rng.random(n) < 0.01] = 4
pb = packing.pack_codes(codes)
fm = FMIndex.from_packed(pb)
print("n =", n, "blocks =", pb.blocks.shape, flush=True)

for B in (1 << 14, 1 << 17, 1 << 20):
    qs = jnp.asarray(rng.integers(0, n, B).astype(np.int32))
    f = jax.jit(lambda q: rank.parallel_rank(fm.blocks, q))
    dt = bench(f"parallel_rank B={B}", f, qs)
    print(f"   -> {B/dt/1e6:.1f} Mq/s, gather bytes {B*64/dt/1e9:.2f} GB/s",
          flush=True)

B = 1 << 14
nodes = np.zeros((B, 7), dtype=np.int32)
nodes[:, :6] = np.sort(rng.integers(0, n, (B, 6)), axis=1)
nodes[:, 6] = 5
nodesj = jnp.asarray(nodes)
f = jax.jit(lambda nd: fm_ops.extend_node(fm, nd))
dt = bench("extend_node B=16k", f, nodesj)
print(f"   -> {B/dt/1e6:.2f} Mnodes/s", flush=True)

# full node body (without queue)
thr = jnp.zeros(n, jnp.uint8)
def body(nd, t1, t2, t3):
    return traverse._node_body(fm, nd, jnp.int32(B), (t1, t2, t3),
                               (jnp.int32(0),)*4, K=16, k_right=30)
f = jax.jit(body)
dt = bench("node_body B=16k", f, nodesj, thr, thr, thr)
print(f"   -> {B/dt/1e6:.2f} Mnodes/s", flush=True)

# select
B = 1 << 16
c = jnp.asarray(rng.integers(0, 4, B).astype(np.int32))
r = jnp.asarray((rng.random(B) * np.asarray(pb.counts)[np.asarray(c)] * 0.9).astype(np.int32))
f = jax.jit(lambda rr, cc: rank.select(fm.blocks, fm.block_counts, rr, cc))
dt = bench("select B=64k", f, r, c)
print(f"   -> {B/dt/1e6:.2f} Mq/s", flush=True)

# fl walk step at cluster scale
B = 1 << 17
starts = jnp.asarray(rng.integers(0, n, B).astype(np.int32))
f = jax.jit(lambda s: fm_ops.fl(fm, jnp.where(fm_ops.f_char(fm, s) == 4, 0, s)))
dt = bench("fl B=128k", f, starts)
print(f"   -> {B/dt/1e6:.2f} Mq/s", flush=True)
