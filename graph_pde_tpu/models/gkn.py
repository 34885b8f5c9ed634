"""GKN — Graph Kernel Network.

One configurable model covering every reference GKN variant:

- ``KernelNN`` (graph-neural-operator/UAI1_full_resolution.py:14-33):
  kappa = DenseNet([ker_in, ker_width, ker_width, width^2]), ReLU after
  every conv iteration, linear decoder.
- ``KernelNN3`` (multipole-graph-neural-operator/neurips1_GKN.py:16-37,
  UAI3_resolution.py:13-32): kappa = DenseNet([ker_in, ker_width//2,
  ker_width, width^2]), no ReLU after the last iteration.
- Burgers ``KernelNN`` (multipole-graph-neural-operator/neurips5_GKN.py:
  15-39): KernelNN3 kappa + two-layer decoder.
- ``UAI8`` 5-layer kappa sweep (graph-neural-operator/UAI8_kernel.py:21)
  via an explicit ``kernel_layers`` override.

Forward: x = P(x); depth x [shared edge-kernel conv + optional ReLU];
decode. The conv weights are shared across iterations (Picard iteration of
the kernel integral operator), matching the reference's single ``conv1``.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..graph.graph import Graph
from ..ops.dense import dense_init, dense_apply, linear_init, pyg_uniform_init
from ..ops.edge_conv import edge_kernel_conv


@dataclasses.dataclass(frozen=True)
class GKNConfig:
    width: int = 64
    ker_width: int = 1024
    depth: int = 6
    ker_in: int = 6
    in_width: int = 6
    out_width: int = 1
    kernel_layers: Optional[Tuple[int, ...]] = None  # default: KernelNN
    relu_last: bool = True      # ReLU after the final conv iteration
    decoder_mlp: bool = False   # two-layer decoder (neurips5_GKN.py:36-39)
    aggr: str = "mean"
    root_weight: bool = True
    use_bias: bool = True
    impl: str = "auto"
    compute_dtype: Optional[str] = None  # e.g. 'bfloat16'
    # kcached only: differentiate the depth loop via the loop-level
    # custom VJP (ops/kcached_loop.py). MEASURED SLOWER than plain
    # autodiff (231 vs 205 ms/step at UAI1 full-grid scale) — the depth
    # loop unrolls under jit, so XLA's own transpose already fuses the
    # T dK outer products into one write; the hand VJP only adds
    # stacking/transpose overhead (PERF_NOTES.md round-2). Kept as a
    # tested building block. Ignored for blocked-CSR graphs.
    loop_vjp: bool = False
    # 'vmap': per-graph forward vmapped over the stack. 'flatten': the
    # batch becomes ONE disjoint-union graph (PyG's batching layout,
    # graph/graph.py flatten_stacked) — for small graphs this feeds the
    # gather/segment kernels one B*E-edge stream instead of B islands.
    batch_mode: str = "vmap"
    # kcached only: storage dtype for the cached kernel matrices K.
    # None = f32/bf16 per compute_dtype and the HBM gate below;
    # 'float8_e4m3' / 'float8_e5m2' quantize the cached K to fp8
    # values behind a straight-through estimator (forward sees
    # fp8-rounded K, the dK cotangent passes through at full
    # precision — ops/cached_contraction.py quantize_ste). A naive
    # fp8-dtyped K makes the dK cotangent fp8 too and wrecks
    # convergence (uai3 A/B in RESULTS.md).
    k_storage: Optional[str] = None
    # kcached + receiver-sorted big-graph regime only: run each depth
    # iteration's contract+aggregate as ONE pallas kernel (the [E, w]
    # message array never hits HBM — ops/fused_iterate.py). MEASURED
    # EXACT PARITY with the staged XLA path at UAI1 full-grid scale
    # (181.8 vs 181.7 ms/step, scripts/time_uai1_step.py): XLA already
    # fuses the staged intermediates, i.e. the kcached iteration is at
    # its K-stream floor. Default 'off'; 'auto' enables it where the
    # block-local one-hot reduction would apply; 'on' forces (tests).
    kcached_fused: str = "off"

    def resolved_kernel_layers(self) -> Tuple[int, ...]:
        if self.kernel_layers is not None:
            return tuple(self.kernel_layers)
        return (self.ker_in, self.ker_width, self.ker_width,
                self.width ** 2)

    @staticmethod
    def kernel_nn3_layers(ker_in: int, ker_width: int, width: int):
        return (ker_in, ker_width // 2, ker_width, width ** 2)


def gkn_init(key, cfg: GKNConfig):
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    params = {
        "fc1": linear_init(k1, cfg.in_width, cfg.width),
        "kernel": dense_init(k2, cfg.resolved_kernel_layers()),
    }
    # PyG uniform(in_channels) init for root/bias (nn_conv.py:261-265)
    if cfg.root_weight:
        params["root"] = pyg_uniform_init(k3, cfg.width,
                                          (cfg.width, cfg.width))
    if cfg.use_bias:
        params["bias"] = pyg_uniform_init(k4, cfg.width, (cfg.width,))
    if cfg.decoder_mlp:
        params["fc2"] = linear_init(k5, cfg.width, cfg.ker_width)
        params["fc3"] = linear_init(k6, cfg.ker_width, cfg.out_width)
    else:
        params["fc2"] = linear_init(k5, cfg.width, cfg.out_width)
    return params


def _gather_src(x, graph: Graph):
    """x[senders] with the scatter-free transpose when the builder
    verified the sender-sorted span AND the edge stream is large enough
    to amortize it (ops/segment.py use_sender_sort — default-on at all
    scales regressed the bench epoch 27%, round-4 bisect)."""
    from ..ops.segment import gather_rows, gather_rows_st, use_sender_sort

    if use_sender_sort(graph.sender_perm, graph.sender_span,
                       graph.senders.shape[0]):
        return gather_rows_st(x, graph.senders, graph.sender_perm,
                              graph.sender_span)
    return gather_rows(x, graph.senders)


def _use_ss(graph: Graph) -> bool:
    from ..ops.segment import use_sender_sort

    return use_sender_sort(graph.sender_perm, graph.sender_span,
                           graph.senders.shape[0])


def gkn_apply(params, cfg: GKNConfig, graph: Graph) -> jnp.ndarray:
    """Forward on one padded graph -> [N_pad, out_width]."""
    x = graph.x @ params["fc1"]["w"] + params["fc1"]["b"]
    edge_mask = graph.edge_mask()
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None

    if cfg.impl == "kcached":
        # kappa(e) depends only on edge_attr — it is invariant across the
        # depth iterations (the reference recomputes nn(pseudo) every
        # call, nn_conv.py:274). Compute the kernel matrices ONCE and
        # reuse; trades HBM for the per-iteration kernel-MLP GEMMs.
        # Gated by memory: E * width^2 must fit comfortably.
        from ..ops.dense import dense_apply
        from ..ops.cached_contraction import apply_cached_kernel
        from ..ops.segment import (masked_segment_mean,
                                   blocked_segment_mean)

        e = graph.senders.shape[0]
        # bf16 K storage when requested OR when the cached matrices would
        # be HBM-heavy (full-grid edge counts: f32 K at UAI1 scale is
        # ~6.9 GB; bf16 measured 3.1x faster than the per-iteration path)
        big = e * cfg.width * cfg.width * 4 > 2 * 1024 ** 3
        k_dtype = (jnp.bfloat16 if (dtype is not None or big)
                   else jnp.float32)
        kp, attr = params["kernel"], graph.edge_attr
        if dtype is not None:
            # full-bf16 kappa MLP: at full-grid scale (UAI1: E~383k,
            # ker_width 1024) the MLP GEMMs dominate the step; bf16
            # activations halve both the MXU time and the activation
            # HBM traffic. Params stay f32 (optimizer master copy),
            # cast at use.
            kp = jax.tree_util.tree_map(lambda p: p.astype(dtype), kp)
            attr = attr.astype(dtype)
        from ..ops.cached_contraction import maybe_quantize_k
        from ..ops.fused_iterate import (fused_iterate_supported,
                                         sorted_iterate_setup,
                                         fused_iterate_total)
        from ..ops.segment import _use_onehot

        kk = dense_apply(kp, attr).astype(k_dtype)

        # fused contract+aggregate pallas iteration (one kernel per
        # depth step, no [E, w] HBM round-trips) — exactly where the
        # block-local one-hot reduction would otherwise run.
        use_fused = (not graph.node_block and not cfg.loop_vjp
                     and graph.sorted_span > 0
                     and cfg.aggr in ("mean", "add")
                     and fused_iterate_supported(e, cfg.width, cfg.width,
                                                 graph.sorted_span)
                     and (cfg.kcached_fused == "on"
                          or (cfg.kcached_fused == "auto"
                              and not _use_onehot(e, x.shape[0]))))
        if use_fused:
            span = graph.sorted_span
            k8 = None
            if cfg.k_storage is not None:
                # fp8 STORAGE with the kernels streaming 1 byte/elem:
                # both fused kernels read k8 and upcast in VMEM; the dK
                # cotangent lands on the full-precision kk (STE — an
                # fp8 dK cotangent wrecks convergence, RESULTS.md).
                fp8 = {"float8_e4m3": jnp.float8_e4m3fn,
                       "float8_e5m2": jnp.float8_e5m2}[cfg.k_storage]
                k8 = kk.astype(fp8)
            oh, ids, counts = sorted_iterate_setup(
                graph.receivers, edge_mask, x.shape[0], span)
            recip = (1.0 / counts) if cfg.aggr == "mean" else None
            for t in range(cfg.depth):
                xj = _gather_src(x, graph)
                out = fused_iterate_total(
                    xj, kk, oh, ids, x.shape[0], span,
                    in_channels=cfg.width, out_channels=cfg.width, k8=k8)
                if recip is not None:
                    out = out * recip
                if "root" in params:
                    out = out + x @ params["root"]
                if "bias" in params:
                    out = out + params["bias"]
                x = out
                if t != cfg.depth - 1 or cfg.relu_last:
                    x = jax.nn.relu(x)
            return _gkn_decode(params, cfg, x)

        # fp8 STORAGE of the cached K behind a straight-through
        # estimator: forward quantizes, backward passes dK through
        # at full precision — an fp8 dK cotangent measurably
        # wrecks convergence (uai3 A/B in RESULTS.md). Valid here
        # because the depth loop below is UNROLLED (contract 8.04
        # -> 6.90 ms/iter at E=383k, scripts/fp8_ste_check.py);
        # across a fori_loop boundary it is 2x slower instead.
        kk = maybe_quantize_k(kk, cfg.k_storage)
        if cfg.loop_vjp and not graph.node_block:
            # one custom VJP over the whole depth loop: dK materialized
            # once instead of per-iteration (ops/kcached_loop.py)
            from ..ops.kcached_loop import kcached_depth_loop

            x = kcached_depth_loop(
                x, kk, params.get("root"), params.get("bias"),
                graph.senders, graph.receivers, edge_mask,
                depth=cfg.depth, width=cfg.width, aggr=cfg.aggr,
                relu_last=cfg.relu_last, sorted_span=graph.sorted_span)
            return _gkn_decode(params, cfg, x)
        for t in range(cfg.depth):
            xj = _gather_src(x, graph)
            msg = apply_cached_kernel(xj, kk, cfg.width, cfg.width)
            if graph.node_block:
                out = blocked_segment_mean(msg, graph.receivers, edge_mask,
                                           x.shape[0], graph.node_block,
                                           aggr=cfg.aggr)
            elif cfg.aggr == "mean":
                out = masked_segment_mean(msg, graph.receivers, edge_mask,
                                          x.shape[0],
                                          sorted_span=graph.sorted_span)
            else:
                from ..ops.segment import masked_segment_sum

                out = masked_segment_sum(msg, graph.receivers, edge_mask,
                                         x.shape[0],
                                         sorted_span=graph.sorted_span)
            if "root" in params:
                out = out + x @ params["root"]
            if "bias" in params:
                out = out + params["bias"]
            x = out
            if t != cfg.depth - 1 or cfg.relu_last:
                x = jax.nn.relu(x)
        return _gkn_decode(params, cfg, x)

    for t in range(cfg.depth):
        x = edge_kernel_conv(
            x, graph.senders, graph.receivers, graph.edge_attr, edge_mask,
            params["kernel"],
            in_channels=cfg.width, out_channels=cfg.width, aggr=cfg.aggr,
            root=params.get("root"), bias=params.get("bias"),
            impl=cfg.impl, compute_dtype=dtype,
            node_block=graph.node_block, sorted_span=graph.sorted_span,
            sender_sort=(graph.sender_perm, graph.sender_span)
            if _use_ss(graph) else None)
        if t != cfg.depth - 1 or cfg.relu_last:
            x = jax.nn.relu(x)
    return _gkn_decode(params, cfg, x)


def _gkn_decode(params, cfg: GKNConfig, x):
    if cfg.decoder_mlp:
        x = jax.nn.relu(x @ params["fc2"]["w"] + params["fc2"]["b"])
        x = x @ params["fc3"]["w"] + params["fc3"]["b"]
    else:
        x = x @ params["fc2"]["w"] + params["fc2"]["b"]
    return x


def gkn_apply_batched(params, cfg: GKNConfig, graphs: Graph) -> jnp.ndarray:
    """Batched forward over a stacked batch -> [B, N_pad, out_width].

    batch_mode='flatten' runs the whole batch as one disjoint-union
    graph (identical math: per-edge messages are unchanged and the mean
    counts each graph's valid edges per receiver; padding nodes never
    appear on valid edges)."""
    if cfg.batch_mode == "flatten" and graphs.node_block == 0:
        from ..graph.graph import flatten_stacked

        b, n_pad = graphs.x.shape[0], graphs.x.shape[1]
        out = gkn_apply(params, cfg, flatten_stacked(graphs))
        return out.reshape(b, n_pad, -1)
    return jax.vmap(lambda g: gkn_apply(params, cfg, g))(graphs)


__all__ = ["GKNConfig", "gkn_init", "gkn_apply", "gkn_apply_batched"]
