"""Backward-of-gather shootout at UAI1 full-grid scale: the kcached
iteration's dx = scatter-add(dxj, senders) (the transpose XLA inserts
for x[senders]). Candidates:

  xla_grad    jax.grad through x[senders] (what autodiff does today)
  segsum      jax.ops.segment_sum(dxj, senders) unsorted
  permblock   dxj[perm] gather into sender-sorted order + block-local
              one-hot sorted reduction (ops/segment.py blockoh)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/scatter_senders_shootout.py
"""
import time

import numpy as np


def timed(fn, x, consts, iters, label):
    import jax

    f = jax.jit(lambda x, *cs: jax.lax.fori_loop(
        0, iters, lambda i, c: fn(c, *cs) + 1e-12 * c, x))
    r = f(x, *consts)
    float(r.ravel()[0])
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
    from graph_pde_tpu.ops.segment import sorted_block_segment_reduce

    n = 8
    fields = load_or_generate_darcy(n, 241, seed=0)
    arrays, _ = prepare_darcy(fields, n=n, r=4)
    graphs = darcy_gkn_graphs(arrays, m=None, radius=0.1, seed=0)
    send_np = np.asarray(graphs.senders[0])
    e = send_np.shape[0]
    nn = graphs.x.shape[1]
    w = 64
    perm_np = np.argsort(send_np, kind="stable").astype(np.int32)
    ssort_np = send_np[perm_np]
    eb = 512
    rb = ssort_np.reshape(-1, eb)
    span = int((rb[:, -1] - rb[:, 0]).max()) + 1
    print(f"N={nn} E={e} sender-sorted block span={span}", flush=True)

    key = jax.random.PRNGKey(0)
    dxj0 = jax.random.normal(key, (e, w), jnp.float32)
    x0 = jax.random.normal(key, (nn, w), jnp.float32)
    senders = jnp.asarray(send_np)
    perm = jnp.asarray(perm_np)
    ssort = jnp.asarray(ssort_np)
    ones_mask = jnp.ones((e,), bool)
    dxj0, x0, senders, perm, ssort, ones_mask = jax.device_put(
        (dxj0, x0, senders, perm, ssort, ones_mask))

    iters = 20

    def xla_grad(d, x, s):
        g = jax.grad(lambda xx: jnp.vdot(xx[s], d))(x)
        return d + 1e-12 * g.sum(0)[None, :]

    timed(xla_grad, dxj0, (x0, senders), iters, "xla_grad")

    def segsum(d, s):
        out = jax.ops.segment_sum(d, s, num_segments=nn,
                                  indices_are_sorted=False)
        return d + 1e-12 * out.sum(0)[None, :]

    timed(segsum, dxj0, (senders,), iters, "segsum")

    def permblock(d, p, ss, m):
        ds = d[p]
        out = sorted_block_segment_reduce(ds, ss, m, nn,
                                          span=max(64, span), mean=False)
        return d + 1e-12 * out.sum(0)[None, :]

    timed(permblock, dxj0, (perm, ssort, ones_mask), iters, "permblock")

    # parity
    a = np.asarray(jax.ops.segment_sum(dxj0, senders, num_segments=nn))
    b = np.asarray(sorted_block_segment_reduce(
        dxj0[perm], ssort, ones_mask, nn, span=max(64, span), mean=False))
    err = np.abs(a - b).max() / np.abs(a).max()
    print(f"permblock max rel err vs segsum: {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
