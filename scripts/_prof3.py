"""Microbenchmarks of candidate primitives on the axon TPU."""
import time
import jax, jax.numpy as jnp
import numpy as np

key = jax.random.PRNGKey(0)
n, knb, M = 4536, 576, 122472


def timeit(name, fn, *a, reps=20):
    f = jax.jit(fn)
    r = f(*a); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(reps):
        r = f(*a)
    jax.block_until_ready(r)
    print(f"{name}: {(time.time()-t0)/reps*1000:8.2f} ms", flush=True)


idx = jax.random.randint(key, (n, knb), 0, M)
tbl = jax.random.normal(key, (M,))
tbl3 = jax.random.normal(key, (M, 3))
small = jax.random.normal(key, (27, 5001))
b = jax.random.randint(key, (n, knb), 0, 27)
itb = jax.random.randint(key, (n, knb), 0, 5000)

timeit("gather 2.6M from (122k,) f32", lambda i: tbl[i], idx)
timeit("gather 2.6M rows from (122k,3)", lambda i: tbl3[i], idx)
timeit("gather 2.6M from (27,5001) 2d", lambda bb, ii: small[bb, ii], b, itb)

mask = jax.random.bernoulli(key, 0.05, (n, 1728))
timeit("top_k(96) over (n,1728)", lambda m: jax.lax.top_k(m.astype(jnp.int32), 96), mask)
mask2 = jax.random.bernoulli(key, 0.1, (n, 3328))
timeit("top_k(364) over (n,3328)", lambda m: jax.lax.top_k(m.astype(jnp.int32), 364), mask2)


def cumsum_compact(m, cap):
    nn, S = m.shape
    pos = jnp.cumsum(m, axis=1) - 1
    dst = jnp.where(m & (pos < cap), pos, cap)
    row = jax.lax.broadcasted_iota(jnp.int32, (nn, S), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (nn, S), 1)
    out = jnp.full((nn, cap + 1), -1, jnp.int32)
    out = out.at[row, dst].set(col, mode="drop")
    return out[:, :cap]

timeit("cumsum+scatter(96) over (n,1728)", lambda m: cumsum_compact(m, 96), mask)
timeit("cumsum+scatter(364) over (n,3328)", lambda m: cumsum_compact(m, 364), mask2)

# one-hot matmul param selection: (n,knb) type idx over nso=8, P=8 params
tj = jax.random.randint(key, (n, knb), 0, 8)
prow = jax.random.normal(key, (n, 8, 8))   # per-row param rows (ti fixed)

def onehot_params(tj, prow):
    oh = jax.nn.one_hot(tj, 8, dtype=jnp.float32)        # (n,knb,8)
    return jnp.einsum("nkc,ncp->nkp", oh, prow,
                      preferred_element_type=jnp.float32)

timeit("one-hot param matmul (n,knb,8)@(8,8)", onehot_params, tj, prow)

# direct small gather for comparison
ptab = jax.random.normal(key, (8, 8, 8))
ti = jax.random.randint(key, (n, 1), 0, 8)
timeit("small-table gather (n,knb) from (8,8,8)",
       lambda a, bb: ptab[a, bb], jnp.broadcast_to(ti, (n, knb)), tj)

# roll-based dense cell blocks
C, cap = 1331, 16
posc = jax.random.normal(key, (11, 11, 11, cap, 3))

def roll_pairs(p):
    acc = jnp.zeros((11, 11, 11, cap))
    for off in ((0, 0, 1), (0, 1, 0), (1, 1, 1), (0, 1, 1), (1, 0, 1)):
        q = jnp.roll(p, off, axis=(0, 1, 2))
        d = p[..., :, None, :] - q[..., None, :, :]
        r2 = (d * d).sum(-1)
        acc = acc + jnp.where(r2 < 9.0, jnp.exp(-r2), 0.0).sum(-1)
    return acc

timeit("5 roll+dense (C,16,16) pair blocks", roll_pairs, posc)

# scatter-add segment reduction (force accumulation pattern)
vals = jax.random.normal(key, (n, knb, 3))
timeit("scatter-add 2.6M rows -> (122k,3)",
       lambda v, i: jnp.zeros((M, 3)).at[i].add(v), vals, idx)

# transcendental throughput reference
x = jax.random.normal(key, (n, knb))
timeit("exp+mul chain x10 on (n,knb)",
       lambda x: sum(jnp.exp(x * (0.1 * i)) for i in range(10)), x)
