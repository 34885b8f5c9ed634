"""Cross-implementation parity: the plain-torch reference oracle
(oracle/torch_ref.py — an INDEPENDENT re-implementation of the
reference's semantics, no code shared with graph_pde_tpu) against the
JAX framework, with identical weights on identical graphs.

These tests are the op/model-level leg of the convergence A/B
(docs/ORACLE.md); the trained-convergence leg lives in results/oracle/.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")


def _dense_params_from_torch(mlp):
    """torch KernelMLP (Linear stack, weight [out,in]) -> our dense
    pytree (tuple of {'w' [in,out], 'b'})."""
    return tuple(
        {"w": jnp.asarray(lin.weight.detach().numpy().T),
         "b": jnp.asarray(lin.bias.detach().numpy())}
        for lin in mlp.linears)


def _random_sorted_graph(rng, n, deg, attr_dim, pad_to=None):
    dst = np.repeat(np.arange(n), deg)
    src = rng.integers(0, n, size=dst.size)
    order = np.argsort(dst, kind="stable")
    return src[order].astype(np.int32), dst[order].astype(np.int32)


def test_edge_conv_matches_torch_oracle():
    """edge_kernel_conv == the oracle's NNConv_old re-implementation
    (graph-neural-operator/nn_conv.py:197-288 semantics) with copied
    weights, across every execution path."""
    from oracle.torch_ref import EdgeKernelConvMean, KernelMLP
    from graph_pde_tpu.graph import build_graph
    from graph_pde_tpu.ops.edge_conv import edge_kernel_conv

    rng = np.random.default_rng(0)
    n, deg, w, a = 24, 6, 8, 5
    src, dst = _random_sorted_graph(rng, n, deg, a)
    attr = rng.normal(size=(src.size, a)).astype(np.float32)
    x = rng.normal(size=(n, w)).astype(np.float32)

    torch.manual_seed(0)
    conv = EdgeKernelConvMean(w, KernelMLP([a, 16, w * w]))
    with torch.no_grad():
        ref = conv(torch.tensor(x), torch.tensor(
            np.stack([src, dst]).astype(np.int64)),
            torch.tensor(attr)).numpy()

    g = build_graph(x, src, dst, attr)
    kp = _dense_params_from_torch(conv.kernel)
    root = jnp.asarray(conv.root.detach().numpy())
    bias = jnp.asarray(conv.bias.detach().numpy())
    for impl in ("reference", "scan", "pallas"):
        out = edge_kernel_conv(
            g.x, g.senders, g.receivers, g.edge_attr, g.edge_mask(),
            kp, in_channels=w, out_channels=w, aggr="mean",
            root=root, bias=bias, impl=impl)
        np.testing.assert_allclose(np.asarray(out)[:n], ref, rtol=2e-4,
                                   atol=2e-5, err_msg=impl)


def test_gkn_forward_matches_torch_oracle():
    """Full KernelNN3 forward (UAI3_resolution.py:13-32) == gkn_apply
    with copied weights on a Nystrom radius graph built by the oracle's
    own RandomMeshGenerator re-implementation."""
    from oracle.torch_ref import GKN3, NystromRadiusMesh
    from graph_pde_tpu.graph import build_graph
    from graph_pde_tpu.models import GKNConfig, gkn_init, gkn_apply

    rng = np.random.default_rng(1)
    s, m, w, kw, depth = 17, 40, 8, 16, 3
    gen = torch.Generator().manual_seed(3)
    mesh = NystromRadiusMesh(s, m, gen)
    mesh.sample()
    ei = mesh.radius_edges(0.3)
    theta = rng.normal(size=(s * s,)).astype(np.float32)
    fields = [rng.normal(size=(s * s,)).astype(np.float32)
              for _ in range(4)]
    attr = mesh.edge_attributes(theta).astype(np.float32)
    x = mesh.node_features(fields).astype(np.float32)

    torch.manual_seed(1)
    model = GKN3(w, kw, depth, ker_in=6, in_width=6)
    with torch.no_grad():
        ref = model(torch.tensor(x),
                    torch.tensor(ei.astype(np.int64)),
                    torch.tensor(attr)).numpy()

    cfg = GKNConfig(width=w, ker_width=kw, depth=depth, ker_in=6,
                    in_width=6, relu_last=True, impl="reference",
                    kernel_layers=(6, kw // 2, kw, w * w))
    params = gkn_init(jax.random.PRNGKey(0), cfg)
    params["fc1"] = {"w": jnp.asarray(model.encode.weight.detach().numpy().T),
                     "b": jnp.asarray(model.encode.bias.detach().numpy())}
    params["fc2"] = {"w": jnp.asarray(model.decode.weight.detach().numpy().T),
                     "b": jnp.asarray(model.decode.bias.detach().numpy())}
    params["kernel"] = _dense_params_from_torch(model.conv.kernel)
    params["root"] = jnp.asarray(model.conv.root.detach().numpy())
    params["bias"] = jnp.asarray(model.conv.bias.detach().numpy())

    g = build_graph(x, ei[0], ei[1], attr)
    out = np.asarray(gkn_apply(params, cfg, g))[: mesh.m, 0]
    np.testing.assert_allclose(out, ref[:, 0], rtol=5e-4, atol=5e-5)


def test_mgkn_orthogonal_matches_torch_oracle():
    """MGKN orthogonal V-cycle (MGKN_orthogonal_burgers1d.py:21-86) ==
    mgkn_orthogonal_apply with copied weights on the oracle's own
    multi_pole_grid1d re-implementation."""
    from oracle.torch_ref import (MGKNOrthogonal1D, edge_attr_1d,
                                  fmm_grid_1d)
    from graph_pde_tpu.models import (MGKNOrthogonalConfig,
                                      mgkn_orthogonal_init,
                                      mgkn_orthogonal_apply,
                                      MultipoleGraph1D)

    rng = np.random.default_rng(2)
    s, w, kw, depth = 32, 8, 32, 2
    grids, edges = fmm_grid_1d(s, periodic=True)
    theta = rng.normal(size=(s,)).astype(np.float32)
    th_levels = [theta[:: 2 ** lev] for lev in range(len(grids))]
    x = np.stack([grids[0], th_levels[0]], axis=1).astype(np.float32)
    attrs = []
    for i, ei in enumerate(edges):
        lev = 0 if i == 0 else i - 1
        attrs.append(edge_attr_1d(grids[lev], th_levels[lev],
                                  ei).astype(np.float32))

    torch.manual_seed(2)
    model = MGKNOrthogonal1D(w, kw, depth, ker_in=4, in_width=2, s=s)
    with torch.no_grad():
        ref = model(torch.tensor(x),
                    [torch.tensor(e) for e in edges],
                    [torch.tensor(a) for a in attrs]).numpy()

    cfg = MGKNOrthogonalConfig(width=w, ker_width=kw, depth=depth,
                               ker_in=4, in_width=2, s=s,
                               impl="reference")
    params = mgkn_orthogonal_init(jax.random.PRNGKey(0), cfg)
    params["fc1"] = {"w": jnp.asarray(model.encode.weight.detach().numpy().T),
                     "b": jnp.asarray(model.encode.bias.detach().numpy())}
    params["fc2"] = {"w": jnp.asarray(model.fc2.weight.detach().numpy().T),
                     "b": jnp.asarray(model.fc2.bias.detach().numpy())}
    params["fc3"] = {"w": jnp.asarray(model.fc3.weight.detach().numpy().T),
                     "b": jnp.asarray(model.fc3.bias.detach().numpy())}
    for lev, conv in enumerate(model.convs):
        params["conv"][lev]["kernel"] = _dense_params_from_torch(
            conv.kernel)
        params["conv"][lev]["root"] = jnp.asarray(
            conv.root.detach().numpy())
        params["conv"][lev]["bias"] = jnp.asarray(
            conv.bias.detach().numpy())

    graph = MultipoleGraph1D(
        x=jnp.asarray(x),
        senders=[jnp.asarray(e[0].astype(np.int32)) for e in edges],
        receivers=[jnp.asarray(e[1].astype(np.int32)) for e in edges],
        attrs=[jnp.asarray(a) for a in attrs],
        y=jnp.zeros((s,)))
    out = np.asarray(mgkn_orthogonal_apply(params, cfg, graph))
    np.testing.assert_allclose(out[:, 0], ref[:, 0], rtol=5e-4,
                               atol=5e-5)


def test_mgkn_general_matches_torch_oracle():
    """MKGN general V-cycle (MGKN_general_darcy2d.py:21-95: residual
    down/up convs without root/bias, in-place-slice mid convs with root
    weight, kw/2^l kernel widths) == mgkn_general_apply with copied
    weights on the oracle's own RandomMultiMeshGenerator
    re-implementation."""
    import argparse

    from oracle.run_mgkn_general import MKGNGeneral, MultiMesh
    from graph_pde_tpu.graph import build_multilevel_graph
    from graph_pde_tpu.models import (MGKNGeneralConfig,
                                      mgkn_general_init,
                                      mgkn_general_apply)

    rng = np.random.default_rng(4)
    s, w, kw, depth = 17, 8, 16, 2
    m = [40, 20, 8]
    gen = torch.Generator().manual_seed(5)
    mesh = MultiMesh(s, m, gen)
    idx, idx_all = mesh.sample()
    args = argparse.Namespace(radius_inner=[0.3, 0.6, 1.0],
                              radius_inter=[0.2, 0.4], m=m)
    ei_mid, ei_down, ei_up = mesh.connectivity(args.radius_inner,
                                               args.radius_inter)
    theta = rng.normal(size=(s * s,)).astype(np.float32)
    a_mid, a_down, a_up = mesh.attributes(theta)
    x = np.concatenate(
        [mesh.grid_sample_all]
        + [rng.normal(size=(s * s,)).astype(np.float32)[idx_all][:, None]
           for _ in range(4)], axis=1).astype(np.float32)

    torch.manual_seed(4)
    model = MKGNGeneral(width=w, ker_width=kw, depth=depth, ker_in=6,
                        points=m, level=3, in_width=6)
    tl = lambda a: torch.tensor(np.ascontiguousarray(a),
                                dtype=torch.long)
    tt = lambda a: torch.tensor(np.ascontiguousarray(a),
                                dtype=torch.float32)
    with torch.no_grad():
        ref = model(tt(x), [tl(e) for e in ei_mid],
                    [tt(a) for a in a_mid], [tl(e) for e in ei_down],
                    [tt(a) for a in a_down], [tl(e) for e in ei_up],
                    [tt(a) for a in a_up]).numpy()

    cfg = MGKNGeneralConfig(width=w, ker_width=kw, depth=depth, ker_in=6,
                            in_width=6, points=tuple(m), variant="mkgn",
                            impl="reference")
    params = mgkn_general_init(jax.random.PRNGKey(0), cfg)

    def lin(linear):
        return {"w": jnp.asarray(linear.weight.detach().numpy().T),
                "b": jnp.asarray(linear.bias.detach().numpy())}

    params["fc_in"] = lin(model.fc_in)
    params["fc_out1"] = lin(model.fc_out1)
    params["fc_out2"] = lin(model.fc_out2)
    for l in range(2):
        params["conv_down"][l]["kernel"] = _dense_params_from_torch(
            model.conv_down[l].kernel)
        params["conv_up"][l]["kernel"] = _dense_params_from_torch(
            model.conv_up[l].kernel)
    for l in range(3):
        params["conv_mid"][l]["kernel"] = _dense_params_from_torch(
            model.conv_mid[l].kernel)
        params["conv_mid"][l]["root"] = jnp.asarray(
            model.conv_mid[l].root.detach().numpy())

    g = build_multilevel_graph(
        x, m,
        [np.asarray(e) for e in ei_mid], [np.asarray(a) for a in a_mid],
        [np.asarray(e) for e in ei_down],
        [np.asarray(a) for a in a_down],
        [np.asarray(e) for e in ei_up], [np.asarray(a) for a in a_up])
    out = np.asarray(mgkn_general_apply(params, cfg, g))
    np.testing.assert_allclose(out[:, 0], ref[:, 0], rtol=5e-4,
                               atol=5e-5)
