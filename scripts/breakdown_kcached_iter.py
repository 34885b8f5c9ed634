"""Micro-breakdown of the kcached per-iteration cost at UAI1 full-grid
scale (s=61, N=3728, E=383488, w=64): times each stage of the depth
iteration separately on the live backend, amortized inside one jit with
loop-carried dependencies (CLAUDE.md measurement caveats — XLA hoists
loop-invariant bodies, so every stage feeds the carry).

All large operands are passed as jit ARGUMENTS (device-resident), never
closure constants — captured constants are embedded in the lowered
module and a 3 GB K upload per compile wedges the remote compile helper.

Stages:
  gather    x[senders]                        ([E, w] stream)
  contract  broadcast-reduce against bf16 K   (the K stream)
  segsum    sorted masked segment mean        (XLA scatter path at this N)
  iter_fwd  the full iterate
  iter_all  full iterate fwd + bwd (grad wrt x and K)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/breakdown_kcached_iter.py
"""
import time

import numpy as np


def timed(fn, x, consts, iters, label):
    """fn(x, *consts) -> array like x; amortized over `iters` in one jit."""
    import jax

    f = jax.jit(lambda x, *cs: jax.lax.fori_loop(
        0, iters, lambda i, c: fn(c, *cs) + 1e-12 * c, x))
    r = f(x, *consts)
    float(r.ravel()[0])  # compile + sync
    t0 = time.perf_counter()
    r = f(x, *consts)
    float(r.ravel()[0])
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{label:>10}: {dt:7.2f} ms/iter", flush=True)
    return dt


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from graph_pde_tpu.data import (load_or_generate_darcy, prepare_darcy,
                                    darcy_gkn_graphs)
    from graph_pde_tpu.ops.segment import masked_segment_mean, gather_rows

    n = 8  # matches time_uai1_step's cached dataset (n=1 regenerates)
    fields = load_or_generate_darcy(n, 241, seed=0)
    arrays, _ = prepare_darcy(fields, n=n, r=4)  # s=61
    graphs = darcy_gkn_graphs(arrays, m=None, radius=0.1, seed=0)
    senders = jnp.asarray(graphs.senders[0])
    receivers = jnp.asarray(graphs.receivers[0])
    mask = jnp.asarray(
        np.arange(graphs.senders.shape[1]) < int(np.asarray(graphs.n_edge)[0]))
    e = senders.shape[0]
    nn = graphs.x.shape[1]
    w = 64
    print(f"N={nn} E={e} w={w}", flush=True)

    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (nn, w), jnp.float32)
    kk3 = jax.random.normal(key, (e, w, w), jnp.float32).astype(jnp.bfloat16)
    xj0 = jax.random.normal(key, (e, w), jnp.float32)
    senders, receivers, mask, kk3, xj0, x0 = jax.device_put(
        (senders, receivers, mask, kk3, xj0, x0))

    iters = 20

    timed(lambda x, s: x[s].sum(0, keepdims=True) * 1e-12 + x,
          x0, (senders,), iters, "gather")

    def contract(xj, k3):
        msg = jnp.sum(k3 * xj.astype(k3.dtype)[:, :, None], axis=1,
                      dtype=jnp.float32)
        return msg[:, :w] * 1e-6 + xj  # keep shape [E, w], carry dep

    timed(contract, xj0, (kk3,), iters, "contract")

    def segsum(xj, recv, m):
        out = masked_segment_mean(xj, recv, m, nn)
        return xj + out.sum() * 1e-12

    timed(segsum, xj0, (receivers, mask), iters, "segsum")

    def iter_fwd(x, k3, s, recv, m):
        xj = x[s]
        msg = jnp.sum(k3 * xj.astype(k3.dtype)[:, :, None], axis=1,
                      dtype=jnp.float32)
        return jax.nn.relu(masked_segment_mean(msg, recv, m, nn))

    timed(iter_fwd, x0, (kk3, senders, receivers, mask), iters, "iter_fwd")

    def iter_all(x, k3, s, recv, m):
        def loss(x, k3):
            return jnp.sum(iter_fwd(x, k3, s, recv, m) ** 2)

        gx, gk = jax.grad(loss, argnums=(0, 1))(x, k3)
        return x + 1e-12 * gx + 1e-12 * gk.sum(axis=(0, 1))[None].astype(
            jnp.float32)

    timed(iter_all, x0, (kk3, senders, receivers, mask), iters, "iter_all")

    # one-hot gather variant (MXU) for comparison at this N
    timed(lambda x, s: gather_rows(x, s, method="onehot").sum(
        0, keepdims=True) * 1e-12 + x, x0, (senders,), 5, "gather_oh")


if __name__ == "__main__":
    main()
