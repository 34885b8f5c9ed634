"""Shootout of sorted-segment-mean implementations at UAI1 full-grid
scale (N=3728, E=383488, w=64) — the 9.13 ms/iter bottleneck found by
scripts/breakdown_kcached_iter.py. Candidates (flat receiver-sorted
layout, padding at tail with receiver N-1):

  scatter   jax.ops.segment_sum sorted (current fallback)
  cumsum    masked cumsum over E + diff at CSR rowptr boundaries
  blockoh   per-edge-block one-hot against block-relative receivers
            (span bounded because receivers are sorted), partials
            scattered at nb*128 rows instead of E

fwd and fwd+bwd (grad wrt data), amortized, all operands jit args.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/segsum_shootout.py
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
    print(f"{label:>14}: {dt:7.2f} ms/iter", flush=True)
    return dt


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from graph_pde_tpu.data import (load_or_generate_darcy, prepare_darcy,
                                    darcy_gkn_graphs)
    from graph_pde_tpu.ops.segment import masked_segment_mean

    n = 8
    fields = load_or_generate_darcy(n, 241, seed=0)
    arrays, _ = prepare_darcy(fields, n=n, r=4)  # s=61
    graphs = darcy_gkn_graphs(arrays, m=None, radius=0.1, seed=0)
    recv_np = np.asarray(graphs.receivers[0])
    e = recv_np.shape[0]
    nn = graphs.x.shape[1]
    w = 64
    n_valid = int(np.asarray(graphs.n_edge)[0])
    mask_np = np.arange(e) < n_valid
    print(f"N={nn} E={e} (valid {n_valid}) w={w}", flush=True)

    # block-span diagnostics for blockoh
    eb = 1024
    e_pad = (e + eb - 1) // eb * eb
    recv_pad = np.concatenate([recv_np, np.full(e_pad - e, nn - 1,
                                                recv_np.dtype)])
    rb = recv_pad.reshape(-1, eb)
    span = (rb[:, -1] - rb[:, 0] + 1).max()
    print(f"eb={eb}: max nodes/block span = {span}", flush=True)

    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    data0 = jax.random.normal(key, (e, w), jnp.float32)
    receivers = jnp.asarray(recv_np)
    mask = jnp.asarray(mask_np)
    data0, receivers, mask = jax.device_put((data0, receivers, mask))

    iters = 20

    def scatter_mean(d, recv, m):
        return masked_segment_mean(d, recv, m, nn)

    def cumsum_mean(d, recv, m):
        mf = m.astype(d.dtype)
        aug = jnp.concatenate([d * mf[:, None], mf[:, None]], axis=1)
        cs = jnp.cumsum(aug, axis=0)
        cs0 = jnp.concatenate([jnp.zeros((1, cs.shape[1]), cs.dtype), cs],
                              axis=0)
        rowptr = jnp.searchsorted(recv, jnp.arange(nn + 1, dtype=recv.dtype),
                                  side="left")
        seg = cs0[rowptr[1:]] - cs0[rowptr[:-1]]
        counts = jnp.maximum(seg[:, -1:], 1.0)
        return seg[:, :-1] / counts

    nb_local = 128
    n_blocks = e_pad // eb

    def blockoh_mean(d, recv, m):
        mf = m.astype(d.dtype)
        aug = jnp.concatenate([d * mf[:, None], mf[:, None]], axis=1)
        if e_pad != e:
            aug = jnp.concatenate(
                [aug, jnp.zeros((e_pad - e, aug.shape[1]), aug.dtype)])
            recv = jnp.concatenate(
                [recv, jnp.full((e_pad - e,), nn - 1, recv.dtype)])
        rb = recv.reshape(n_blocks, eb)
        base = rb[:, 0]
        local = rb - base[:, None]  # in [0, nb_local) by span bound
        seg = jax.lax.broadcasted_iota(jnp.int32, (n_blocks, eb, nb_local), 2)
        oh = (local[:, :, None] == seg).astype(aug.dtype)
        part = jax.lax.dot_general(
            oh, aug.reshape(n_blocks, eb, -1),
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # [nb, nb_local, w+1]
        ids = (base[:, None]
               + jnp.arange(nb_local, dtype=recv.dtype)[None]).reshape(-1)
        out = jax.ops.segment_sum(part.reshape(-1, part.shape[-1]), ids,
                                  num_segments=nn + nb_local)[:nn]
        counts = jnp.maximum(out[:, -1:], 1.0)
        return out[:, :-1] / counts

    ref = np.asarray(scatter_mean(data0, receivers, mask))
    for name, fn in (("cumsum", cumsum_mean), ("blockoh", blockoh_mean)):
        got = np.asarray(fn(data0, receivers, mask))
        err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-9)
        print(f"{name} max rel err vs scatter: {err:.2e}", flush=True)

    for name, fn in (("scatter", scatter_mean), ("cumsum", cumsum_mean),
                     ("blockoh", blockoh_mean)):
        def fwd(d, recv, m, fn=fn):
            out = fn(d, recv, m)
            return d + out.sum() * 1e-12

        timed(fwd, data0, (receivers, mask), iters, name + "_fwd")

        def fwdbwd(d, recv, m, fn=fn):
            g = jax.grad(lambda dd: jnp.sum(fn(dd, recv, m) ** 2))(d)
            return d + 1e-12 * g

        timed(fwdbwd, data0, (receivers, mask), iters, name + "_fwdbwd")


if __name__ == "__main__":
    main()
