"""Microbenchmark BA inner ops with in-jit fori loops (100 reps inside one
XLA program) so the ~25ms per-call tunnel RTT doesn't mask device cost."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

R = 64 * 1024      # observations (local BA: 64 cams x 1024 kps)
M = 32768          # point capacity
C = 64
P, D = 8192, 16
REPS = 30

key = jax.random.PRNGKey(0)
vals3 = jax.random.normal(key, (R, 3))
vals6 = jax.random.normal(key, (R, 6))
pid = jax.random.randint(key, (R,), 0, M)
pid_p = jax.random.randint(key, (R,), 0, P)
cid = jnp.repeat(jnp.arange(C), R // C)
r_pd = jax.random.randint(key, (P, D), 0, R)
x_c = jax.random.normal(key, (C, 6))
Wb = jax.random.normal(key, (R, 6, 3))
sM = jax.random.normal(key, (M, 3))


def t(name, fn, *args):
    def loop(*a):
        def body(i, acc):
            # acc-dependent input defeats loop-invariant hoisting; jnp.sum
            # consumes the whole result so nothing is dead-code-eliminated
            r = fn(a[0] + acc * 1e-20, *a[1:])
            return acc + jnp.sum(r)
        return jax.lax.fori_loop(0, REPS, body, 0.0)

    f = jax.jit(loop)
    o = f(*args)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    o = f(*args)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:38s} {dt:8.3f} ms/op", flush=True)


t("seg_pt scatter [R->M,3]",
  lambda v: jax.ops.segment_sum(v, pid, num_segments=M), vals3)
t("seg_cam scatter [R->C,6]",
  lambda v: jax.ops.segment_sum(v, cid, num_segments=C), vals6)
t("seg_cam reshape-sum",
  lambda v: v.reshape(C, -1, 6).sum(1), vals6)
t("gather-sum [P,D]<-R [P,3]",
  lambda v: v[r_pd].sum(1), vals3)
t("gather [R,3]<-M", lambda s: s[pid], sM)
t("einsum Wb^T x", lambda x: jnp.einsum('rjk,rj->rk', Wb, x[cid]), x_c)


def cg_scatter(x):
    u = jnp.einsum('rjk,rj->rk', Wb, x[cid])
    s = jax.ops.segment_sum(u, pid, num_segments=M)
    tt = jnp.einsum('rjk,rk->rj', Wb, s[pid])
    return jax.ops.segment_sum(tt, cid, num_segments=C)


def cg_free(x):
    u = jnp.einsum('rjk,rj->rk', Wb, x[cid])
    s = u[r_pd].sum(1)                       # gather-based seg_pt [P,3]
    tt = jnp.einsum('rjk,rk->rj', Wb, s[pid_p])
    return tt.reshape(C, -1, 6).sum(1)


t("CG step (2 scatters)", cg_scatter, x_c)
t("CG step (scatter-free)", cg_free, x_c)
