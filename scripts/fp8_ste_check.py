"""Does quantize_ste keep the cached K loop-resident as fp8 on TPU?

fp8_shootout.py measured the win with an fp8-DTYPED K (23.9 -> 20.2
ms full iterate at E=383k) — a dtype we cannot train with (fp8 dK
cotangent, RESULTS.md). quantize_ste returns a bf16-dtyped array whose
VALUES are fp8-rounded, with the fp8 array pinned behind an
optimization_barrier; whether XLA materializes the loop-resident
buffer as the 1-byte fp8 value (upcast fused into each consumer) or as
the 2-byte bf16 convert result is a compiler choice this measures.

Expected at E=383k, w=64 (fwd contract, depth-loop of 10):
  bf16 storage   ~7.5 ms/iter   (2-byte K stream)
  fp8-dtyped     ~5.6 ms/iter   (1-byte; the untrainable reference)
  quantize_ste   ~5.6 if the fp8 buffer stays resident, ~7.5 if not

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/fp8_ste_check.py
"""
import time

E, W, ITERS = 383488, 64, 10


def main():
    import jax
    import jax.numpy as jnp

    from graph_pde_tpu.ops.cached_contraction import quantize_ste

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    key = jax.random.PRNGKey(0)
    xj0 = jax.device_put(jax.random.normal(key, (E, W), jnp.float32))
    kf = jax.device_put(jax.random.normal(key, (E, W, W), jnp.bfloat16))

    def timed(make_k, label, unroll=False):
        def f(xj, kraw):
            k = make_k(kraw)

            def body(i, c):
                kb = (k.astype(jnp.bfloat16)
                      if k.dtype != jnp.bfloat16 else k)
                msg = jnp.sum(kb * c.astype(kb.dtype)[:, :, None], axis=1,
                              dtype=jnp.float32)
                return msg[:, :W] * 1e-6 + c

            if unroll:
                # matches gkn_apply's UNROLLED depth loop (fusion can
                # duplicate the fp8->bf16 convert into each consumer;
                # a fori_loop boundary blocks that and rematerializes
                # a bf16 copy per iteration — measured 2x cost)
                c = xj
                for i in range(ITERS):
                    c = body(i, c)
                return c
            return jax.lax.fori_loop(0, ITERS, body, xj)

        jf = jax.jit(f)
        r = jf(xj0, kf)
        float(r.ravel()[0])
        t0 = time.perf_counter()
        r = jf(xj0, kf)
        float(r.ravel()[0])
        dt = (time.perf_counter() - t0) / ITERS * 1000
        print(f"{label:>16}: {dt:7.2f} ms/iter", flush=True)

    timed(lambda k: k, "bf16")
    timed(lambda k: k.astype(jnp.float8_e4m3fn), "fp8-dtyped")
    timed(lambda k: quantize_ste(k, jnp.float8_e4m3fn), "quantize_ste")
    timed(lambda k: k, "bf16 unroll", unroll=True)
    timed(lambda k: k.astype(jnp.float8_e4m3fn), "fp8 unroll",
          unroll=True)
    timed(lambda k: quantize_ste(k, jnp.float8_e4m3fn), "ste unroll",
          unroll=True)
    # and the trained-path gradient side: full fwd+bwd wrt K through STE
    def loss(xj, kraw):
        k = quantize_ste(kraw, jnp.float8_e4m3fn)

        def body(i, c):
            msg = jnp.sum(k * c.astype(k.dtype)[:, :, None], axis=1,
                          dtype=jnp.float32)
            return msg[:, :W] * 1e-6 + c

        # unrolled short chain so grad-of-loop stays cheap to compile
        c = xj
        for _ in range(3):
            c = body(0, c)
        return jnp.sum(c ** 2)

    g = jax.jit(jax.grad(loss, argnums=1))
    r = g(xj0, kf)
    print("ste grad dtype/finite:", r.dtype,
          bool(jnp.isfinite(r.astype(jnp.float32)).all()), flush=True)


if __name__ == "__main__":
    main()
