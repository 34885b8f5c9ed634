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
