"""Multi-device tests on the 8-virtual-CPU mesh: DP+TP train step parity
and node-sharded (halo) execution parity."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graph_pde_tpu.data import darcy_dataset, prepare_darcy, darcy_gkn_graphs
from graph_pde_tpu.models import GKNConfig, gkn_init, gkn_apply
from graph_pde_tpu.parallel import (
    make_mesh, batch_sharding, param_sharding, replicated_sharding,
    partition_graph, gkn_apply_node_sharded,
)
from graph_pde_tpu.train import GKNTask, TrainConfig, make_train_step
from graph_pde_tpu.train.optim import adam_steplr


@pytest.fixture(scope="module")
def setup():
    fields = darcy_dataset(8, 16, seed=0)
    arrays, _ = prepare_darcy(fields, n=8)
    graphs = darcy_gkn_graphs(arrays, radius=0.25, seed=0)
    cfg = GKNConfig(width=16, ker_width=32, depth=2, ker_in=6, in_width=6,
                    impl="reference")
    params = gkn_init(jax.random.PRNGKey(0), cfg)
    return arrays, graphs, cfg, params


def test_dp_train_step_matches_single_device(setup):
    arrays, graphs, cfg, params = setup
    task = GKNTask(cfg, u_normalizer=arrays.u_normalizer, loss_type="l1",
                   use_sample_idx=False)
    tx = adam_steplr(1e-3, weight_decay=5e-4, steps_per_epoch=1)
    step = make_train_step(task, tx)

    # single device
    p1, o1, m1 = step(params, tx.init(params), graphs)

    # 8-way data parallel: shard the batch, replicate params
    mesh = make_mesh((8, 1))
    g_sh = jax.device_put(graphs, batch_sharding(mesh, graphs))
    p_sh = jax.device_put(params, replicated_sharding(mesh, params))
    o_sh = jax.device_put(tx.init(params),
                          replicated_sharding(mesh, tx.init(params)))
    p2, o2, m2 = step(p_sh, o_sh, g_sh)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_tp_forward_matches_replicated(setup):
    arrays, graphs, cfg, params = setup
    mesh = make_mesh((4, 2))
    # TP-shard the kernel MLP over 'model'; params enter as real jit
    # ARGUMENTS (not closure constants) so input shardings are honored
    p_tp = jax.device_put(params, param_sharding(mesh, params))
    g_sh = jax.device_put(graphs, batch_sharding(mesh, graphs))

    def fwd(p, g):
        return jax.vmap(lambda gg: gkn_apply(p, cfg, gg))(g)

    out_ref = jax.jit(fwd)(params, graphs)
    out_tp = jax.jit(fwd)(p_tp, g_sh)
    np.testing.assert_allclose(np.asarray(out_tp), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-5)


def test_tp_kernel_mlp_actually_partitioned(setup):
    """GSPMD could silently all-gather the TP-sharded weights and compute
    replicated; assert from the compiled module that it does not.

    Two checks on the SPMD-partitioned HLO:
      1. the largest kernel-MLP GEMM runs on a per-device HALVED weight
         (alternating Megatron scheme, sharding.py:36-44: even layer index
         -> column parallel [ker_width, width^2/tp], odd -> row parallel
         [ker_width/tp, width^2]) instead of the replicated
         [ker_width, width^2],
      2. partial sums from the row-parallel layer are combined with an
         all-reduce (evidence the contraction itself was distributed).
    """
    arrays, graphs, cfg, params = setup
    mesh = make_mesh((4, 2))
    p_tp = jax.device_put(params, param_sharding(mesh, params))
    g_sh = jax.device_put(graphs, batch_sharding(mesh, graphs))

    def fwd(p, g):
        return jax.vmap(lambda gg: gkn_apply(p, cfg, gg))(g)

    compiled = jax.jit(fwd).lower(p_tp, g_sh).compile()
    txt = compiled.as_text()

    kw, w = cfg.ker_width, cfg.width
    tp = 2
    last = len(params["kernel"]) - 1
    if last % 2 == 0:  # column parallel: output dim sharded
        local = f"f32[{kw},{w * w // tp}]"
    else:              # row parallel: input dim sharded
        local = f"f32[{kw // tp},{w * w}]"
    replicated = f"f32[{kw},{w * w}]"
    assert local in txt, (
        f"last kernel-MLP layer not partitioned: no {local} in HLO")
    assert replicated not in txt, (
        "full last-layer weight materialized despite TP sharding")
    assert "all-reduce" in txt, (
        "no all-reduce in compiled module: row-parallel partial sums "
        "were not combined collectively")


def test_node_sharded_forward_matches_single(setup):
    arrays, graphs, cfg, params = setup
    # take the first graph, unbatched
    g0 = jax.tree_util.tree_map(lambda a: a[0], graphs)
    ref = gkn_apply(params, cfg, g0)

    mesh = make_mesh((8,), axis_names=("data",))
    parts = partition_graph(g0, 8)
    out = gkn_apply_node_sharded(params, cfg, parts, mesh, axis="data")
    # node-sharded layout re-pads N; compare on valid nodes
    n = int(g0.n_node)
    nmask = parts["node_mask"].reshape(-1)
    np.testing.assert_allclose(np.asarray(out)[nmask][:n],
                               np.asarray(ref)[:n], rtol=1e-4, atol=1e-5)


def test_node_sharded_fused_pallas_matches_single(setup):
    """Fused pallas conv INSIDE shard_map (interpret mode on the CPU
    mesh): validates the fused-kernel + shard_map interaction — the
    gather out of the all-gathered features, the per-device edge
    bucket, and the collective boundary around the pallas_call."""
    arrays, graphs, cfg, params = setup
    g0 = jax.tree_util.tree_map(lambda a: a[0], graphs)
    ref = gkn_apply(params, cfg, g0)

    mesh = make_mesh((8,), axis_names=("data",))
    parts = partition_graph(g0, 8)
    out = gkn_apply_node_sharded(params, cfg, parts, mesh, axis="data",
                                 impl="pallas_interpret")
    n = int(g0.n_node)
    nmask = parts["node_mask"].reshape(-1)
    np.testing.assert_allclose(np.asarray(out)[nmask][:n],
                               np.asarray(ref)[:n], rtol=1e-4, atol=1e-5)


def test_node_sharded_grads_flow(setup):
    arrays, graphs, cfg, params = setup
    g0 = jax.tree_util.tree_map(lambda a: a[0], graphs)
    mesh = make_mesh((8,), axis_names=("data",))
    parts = partition_graph(g0, 8)

    def loss(p):
        out = gkn_apply_node_sharded(p, cfg, parts, mesh, axis="data")
        return jnp.sum(out ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)


def test_ring_halo_matches_single(setup):
    from graph_pde_tpu.parallel import (
        partition_graph_ring, gkn_apply_node_sharded_ring,
    )

    arrays, graphs, cfg, params = setup
    g0 = jax.tree_util.tree_map(lambda a: a[0], graphs)
    ref = gkn_apply(params, cfg, g0)

    mesh = make_mesh((8,), axis_names=("data",))
    parts = partition_graph_ring(g0, 8)
    out = gkn_apply_node_sharded_ring(params, cfg, parts, mesh,
                                      axis="data")
    n = int(g0.n_node)
    nmask = parts["node_mask"].reshape(-1)
    np.testing.assert_allclose(np.asarray(out)[nmask][:n],
                               np.asarray(ref)[:n], rtol=1e-4, atol=1e-5)


@pytest.fixture(scope="module")
def mgkn_setup():
    from graph_pde_tpu.data import darcy_dataset, darcy_mgkn_graphs
    from graph_pde_tpu.models import MGKNGeneralConfig, mgkn_general_init

    fields = darcy_dataset(2, 17, seed=0)
    arrays, _ = prepare_darcy(fields, n=2)
    graphs, _ = darcy_mgkn_graphs(
        arrays, points=(48, 16, 8), radius_inner=(0.25, 0.5, 1.0),
        radius_inter=(0.2, 0.4), seed=0, edge_multiple=16)
    g0 = jax.tree_util.tree_map(lambda a: a[0], graphs)
    return g0


@pytest.mark.parametrize("variant", ["mkgn", "induced"])
def test_mgkn_node_sharded_forward_matches_single(mgkn_setup, variant):
    """The multipole hierarchy's sharded V-cycle (per-level node blocks,
    down/up edges as the inter-shard pattern — SURVEY.md section 2.6)
    must reproduce the single-device forward exactly."""
    from graph_pde_tpu.models import (MGKNGeneralConfig, mgkn_general_init,
                                      mgkn_general_apply)
    from graph_pde_tpu.parallel import (partition_multilevel_graph,
                                        mgkn_general_apply_node_sharded)

    g0 = mgkn_setup
    cfg = MGKNGeneralConfig(width=16, ker_width=32, depth=2, ker_in=6,
                            in_width=6, points=(48, 16, 8),
                            variant=variant, impl="reference")
    params = mgkn_general_init(jax.random.PRNGKey(0), cfg)
    ref = mgkn_general_apply(params, cfg, g0)  # [48, 1]

    mesh = make_mesh((8,), axis_names=("data",))
    parts, meta = partition_multilevel_graph(g0, 8)
    out = mgkn_general_apply_node_sharded(params, cfg, parts, meta, mesh,
                                          axis="data")
    n0 = cfg.points[0]
    np.testing.assert_allclose(np.asarray(out)[:n0], np.asarray(ref)[:n0],
                               rtol=1e-4, atol=1e-5)


def test_mgkn_node_sharded_fused_pallas_matches_reference(mgkn_setup):
    """Fused conv kernel inside the MGKN per-level-halo shard_map
    (round-4 verdict item 8) must match the XLA-message sharded path."""
    from graph_pde_tpu.models import MGKNGeneralConfig, mgkn_general_init
    from graph_pde_tpu.parallel import (partition_multilevel_graph,
                                        mgkn_general_apply_node_sharded)

    g0 = mgkn_setup
    cfg = MGKNGeneralConfig(width=16, ker_width=32, depth=2, ker_in=6,
                            in_width=6, points=(48, 16, 8),
                            variant="mkgn", impl="reference")
    params = mgkn_general_init(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh((8,), axis_names=("data",))
    parts, meta = partition_multilevel_graph(g0, 8)
    out = mgkn_general_apply_node_sharded(params, cfg, parts, meta, mesh,
                                          axis="data")
    out_f = mgkn_general_apply_node_sharded(params, cfg, parts, meta,
                                            mesh, axis="data",
                                            impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out),
                               rtol=1e-3, atol=1e-4)


def test_mgkn_node_sharded_grads_flow(mgkn_setup):
    from graph_pde_tpu.models import MGKNGeneralConfig, mgkn_general_init
    from graph_pde_tpu.parallel import (partition_multilevel_graph,
                                        mgkn_general_apply_node_sharded)

    g0 = mgkn_setup
    cfg = MGKNGeneralConfig(width=16, ker_width=32, depth=2, ker_in=6,
                            in_width=6, points=(48, 16, 8),
                            variant="mkgn", impl="reference")
    params = mgkn_general_init(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh((8,), axis_names=("data",))
    parts, meta = partition_multilevel_graph(g0, 8)

    def loss(p):
        out = mgkn_general_apply_node_sharded(p, cfg, parts, meta, mesh,
                                              axis="data")
        return jnp.sum(out[: cfg.points[0]] ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # every conv kind must receive signal (down, mid, up all touched)
    for kind in ("conv_down", "conv_mid", "conv_up"):
        for lvl in grads[kind]:
            mx = max(np.abs(np.asarray(l)).max()
                     for l in jax.tree_util.tree_leaves(lvl))
            assert mx > 0, kind


def test_mgkn_orthogonal_node_sharded_matches_single():
    """Sharded orthogonal-MGKN V-cycle (sharded fine levels +
    agglomerated coarse levels — the parallel-multigrid pattern) must
    reproduce the single-device forward."""
    from graph_pde_tpu.data import (burgers_dataset, prepare_burgers,
                                    burgers_multipole_data)
    from graph_pde_tpu.models import (MultipoleGraph1D,
                                      MGKNOrthogonalConfig,
                                      mgkn_orthogonal_init,
                                      mgkn_orthogonal_apply)
    from graph_pde_tpu.parallel import (partition_multipole1d,
                                        mgkn_orthogonal_apply_node_sharded)

    s = 256
    bfields = burgers_dataset(1, s, seed=0)
    arrays = prepare_burgers(bfields, n=1)
    xs, ys, senders, receivers, attrs = burgers_multipole_data(arrays)
    g0 = MultipoleGraph1D(
        x=jnp.asarray(xs[0]),
        senders=[jnp.asarray(se) for se in senders],
        receivers=[jnp.asarray(r) for r in receivers],
        attrs=[jnp.asarray(a[0]) for a in attrs],
        y=jnp.asarray(ys[0]))
    cfg = MGKNOrthogonalConfig(width=16, ker_width=32, depth=2, ker_in=4,
                               in_width=2, s=s, impl="reference")
    params = mgkn_orthogonal_init(jax.random.PRNGKey(0), cfg)
    ref = mgkn_orthogonal_apply(params, cfg, g0)

    mesh = make_mesh((8,), axis_names=("data",))
    parts, meta = partition_multipole1d(g0, 8)
    # fine levels sharded, coarse agglomerated
    assert meta["lvl_sharded"][0] and not meta["lvl_sharded"][-1]
    out = mgkn_orthogonal_apply_node_sharded(params, cfg, parts, meta,
                                             mesh, axis="data")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    # fused conv kernel inside the same shard_map (verdict item 8)
    out_f = mgkn_orthogonal_apply_node_sharded(params, cfg, parts, meta,
                                               mesh, axis="data",
                                               impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out),
                               rtol=1e-3, atol=1e-4)


def test_ring_halo_grads(setup):
    from graph_pde_tpu.parallel import (
        partition_graph_ring, gkn_apply_node_sharded_ring,
    )

    arrays, graphs, cfg, params = setup
    g0 = jax.tree_util.tree_map(lambda a: a[0], graphs)
    mesh = make_mesh((8,), axis_names=("data",))
    parts = partition_graph_ring(g0, 8)

    def loss(p):
        out = gkn_apply_node_sharded_ring(p, cfg, parts, mesh, axis="data")
        return jnp.sum(out ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)
