"""Does fp8 storage of the cached kernel matrices K beat bf16?

The kcached per-iteration contraction is HBM-bound on the K stream
(PERF_NOTES.md): bf16 K reads at the ~290 GB/s single-stream floor.
fp8 (e4m3/e5m2) storage would halve the bytes again IF the v5e can
convert fp8->bf16/f32 at stream rate. This measures, at bench scale
(E=92k) and UAI1 full-grid scale (E=383k):

  contract   broadcast-reduce msg = sum_i K3[e,i,o] * x[e,i]
  iter_all   full iterate fwd+bwd (gradients wrt x and K)

for K stored in bf16 / f8_e4m3 / f8_e5m2 (multiplies upcast to bf16).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/fp8_shootout.py
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
    print(f"{label:>24}: {dt:7.2f} ms/iter", flush=True)
    return dt


def run_scale(e, nn, w, iters):
    import jax
    import jax.numpy as jnp

    from graph_pde_tpu.ops.segment import masked_segment_mean

    print(f"--- E={e} N={nn} w={w}", flush=True)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (nn, w), jnp.float32)
    xj0 = jax.random.normal(key, (e, w), jnp.float32)
    kf = jax.random.normal(key, (e, w, w), jnp.float32)
    senders = jax.random.randint(key, (e,), 0, nn, jnp.int32)
    receivers = jnp.sort(jax.random.randint(key, (e,), 0, nn, jnp.int32))
    mask = jnp.ones((e,), bool)

    for name, dt in (("bf16", jnp.bfloat16),
                     ("f8_e4m3", jnp.float8_e4m3fn),
                     ("f8_e5m2", jnp.float8_e5m2)):
        kk3 = jax.device_put(kf.astype(dt))

        def contract(xj, k3):
            k = k3.astype(jnp.bfloat16)
            msg = jnp.sum(k * xj.astype(k.dtype)[:, :, None], axis=1,
                          dtype=jnp.float32)
            return msg[:, :w] * 1e-6 + xj

        timed(contract, xj0, (kk3,), iters, f"contract {name}")

        def iter_fwd(x, k3, s, recv, m):
            xj = x[s]
            k = k3.astype(jnp.bfloat16)
            msg = jnp.sum(k * xj.astype(k.dtype)[:, :, None], axis=1,
                          dtype=jnp.float32)
            return jax.nn.relu(masked_segment_mean(msg, recv, m, nn))

        def iter_all(x, k3, s, recv, m):
            def loss(x, k3):
                return jnp.sum(iter_fwd(x, k3, s, recv, m) ** 2)

            gx, gk = jax.grad(loss, argnums=(0, 1))(x, k3)
            return (x + 1e-12 * gx
                    + 1e-12 * gk.sum(axis=(0, 1))[None].astype(jnp.float32))

        timed(iter_all, x0, (kk3, senders, receivers, mask), iters,
              f"iter_all {name}")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    run_scale(92160, 4160, 64, 20)
    run_scale(383488, 3728, 64, 10)


if __name__ == "__main__":
    main()
