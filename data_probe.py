"""TPU microbenchmarks with chained dependencies (block_until_ready is not
reliable over the remote axon backend — every measurement must force a
download of a value that depends on all chained iterations)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)


def chain_bench(name, step, x0, iters=20, work_desc=None):
    """step: x -> x (device). Times `iters` chained applications; returns
    per-iteration seconds after subtracting the 1-iteration baseline."""
    f = jax.jit(lambda x, k: jax.lax.fori_loop(0, k, lambda i, v: step(v), x))
    # warm + compile both variants
    np.asarray(jax.tree_util.tree_leaves(f(x0, 1))[0]).ravel()[:1]
    t0 = time.perf_counter()
    r1 = f(x0, 1)
    np.asarray(jax.tree_util.tree_leaves(r1)[0]).ravel()[:1]
    base = time.perf_counter() - t0
    t0 = time.perf_counter()
    r = f(x0, iters + 1)
    np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    total = time.perf_counter() - t0
    per = (total - base) / iters
    print(f"{name}: {per*1000:.3f} ms/iter (base {base*1000:.1f} ms)",
          flush=True)
    if work_desc:
        amount, unit = work_desc
        print(f"   -> {amount/per/1e9:.2f} G{unit}/s", flush=True)
    return per


n = 10_000_000
R = 78126
tbl = jnp.asarray(rng.integers(0, 2**32, (R, 16), dtype=np.uint32))

# --- row gather, chained by feeding output back into the index
for B in (1 << 16, 1 << 19, 1 << 21):
    b0 = jnp.asarray(rng.integers(0, R, B).astype(np.int32))

    def gstep(b):
        rows = tbl[b]  # (B,16)
        return (b + rows[:, 0].astype(jnp.int32)) & jnp.int32(65535)

    chain_bench(f"row gather B={B}", gstep, b0, work_desc=(B * 64, "B"))

# --- scatter-set chained
E = 1 << 18
idx = jnp.asarray(rng.integers(0, n, E).astype(np.int32))
thr0 = jnp.zeros(n, jnp.uint8)

def sstep(t):
    t = t.at[idx].set(1, mode="drop")
    return t

chain_bench(f"scatter-set u8 E={E}", sstep, thr0, work_desc=(E, "entries"))

E = 1 << 20
idx2 = jnp.asarray(rng.integers(0, n, E).astype(np.int32))

def sstep2(t):
    return t.at[idx2].set(1, mode="drop")

chain_bench(f"scatter-set u8 E={E}", sstep2, thr0, work_desc=(E, "entries"))

# --- add-scatter int32 diff
diff0 = jnp.zeros(n, jnp.int32)
def astep(t):
    return t.at[idx].add(1, mode="drop")
chain_bench(f"scatter-add i32 E={1<<18}", astep, diff0,
            work_desc=(1 << 18, "entries"))

# --- compaction
E = 1 << 18
rows = jnp.asarray(rng.integers(0, 100, (E, 7), dtype=np.int32))
keep0 = jnp.asarray((rng.random(E) < 0.3))

def cstep(state):
    out, keep = state
    idxs = jnp.cumsum(keep.astype(jnp.int32)) - 1
    safe = jnp.where(keep, idxs, E)
    out = jnp.zeros_like(out).at[safe].set(rows, mode="drop")
    return out, keep ^ (out[:, 0] > 50)

chain_bench(f"compact E={E}", cstep,
            (jnp.zeros((E, 7), jnp.int32), keep0),
            work_desc=(E, "rows"))

# --- parallel_rank real op
from ebwt2indel_tpu.ops import rank, packing
codes = rng.integers(0, 4, n).astype(np.uint8)
pb = packing.pack_codes(codes)
blocks = jnp.asarray(pb.blocks)
for B in (1 << 18, 1 << 20):
    q0 = jnp.asarray(rng.integers(0, n, B).astype(np.int32))

    def rstep(q):
        pr = rank.parallel_rank(blocks, q)
        return (q + pr[:, 0]) % jnp.int32(n)

    chain_bench(f"parallel_rank B={B}", rstep, q0, work_desc=(B, "q"))
