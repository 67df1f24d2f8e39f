import numpy as np

from sir_gcn_tpu import (
    add_self_loops,
    batch_graphs,
    build_graph,
    remove_self_loops,
    reverse_edges,
    to_bidirected,
)


def test_build_graph_basic():
    src = np.array([0, 1, 2, 0])
    dst = np.array([1, 2, 0, 2])
    g = build_graph(src, dst, 3, n_pad=8, e_pad=8)
    assert g.n_pad == 8 and g.e_pad == 8
    assert int(g.num_nodes) == 3 and int(g.num_edges) == 4
    # dst sorted
    d = np.asarray(g.dst)
    assert np.all(np.diff(d) >= 0)
    # masks
    assert np.asarray(g.edge_mask).sum() == 4
    assert np.asarray(g.node_mask).sum() == 3
    # degrees exclude padding
    assert np.asarray(g.in_deg)[:3].tolist() == [1.0, 1.0, 2.0]
    assert np.asarray(g.out_deg)[:3].tolist() == [2.0, 1.0, 1.0]
    assert np.asarray(g.in_deg)[3:].sum() == 0
    # row_ptr covers all padded edges
    rp = np.asarray(g.row_ptr)
    assert rp[0] == 0 and rp[-1] == 8
    # CSR segments consistent with dst
    for u in range(8):
        seg = d[rp[u]:rp[u + 1]]
        assert np.all(seg == u)


def test_edge_perm_recovers_original_order():
    rng = np.random.default_rng(1)
    src = rng.integers(0, 10, 30)
    dst = rng.integers(0, 10, 30)
    g = build_graph(src, dst, 10)
    perm = np.asarray(g.edge_perm)
    mask = np.asarray(g.edge_mask)
    efeat = rng.normal(size=(30, 4))
    # original-order features gathered into sorted order line up with dst
    sorted_feat = efeat[perm[mask]]
    assert np.allclose(sorted_feat, efeat[np.argsort(dst, kind="stable")])


def test_batch_graphs_offsets():
    g1 = (np.array([0, 1]), np.array([1, 0]), 2)
    g2 = (np.array([0, 1, 2]), np.array([1, 2, 0]), 3)
    gb = batch_graphs([g1, g2], n_pad=8, e_pad=8, g_pad=4)
    assert int(gb.num_graphs) == 2
    n2g = np.asarray(gb.node2graph)
    assert n2g[:2].tolist() == [0, 0]
    assert n2g[2:5].tolist() == [1, 1, 1]
    bnn = np.asarray(gb.batch_num_nodes())
    assert bnn[:2].tolist() == [2.0, 3.0]
    assert bnn[2:].sum() == 0
    # second graph's edges shifted by 2
    em = np.asarray(gb.edge_mask)
    s, d = np.asarray(gb.src)[em], np.asarray(gb.dst)[em]
    assert set(zip(s.tolist(), d.tolist())) == {
        (0, 1), (1, 0), (2, 3), (3, 4), (4, 2)
    }


def test_transforms():
    src = np.array([0, 1, 1])
    dst = np.array([1, 2, 1])
    s, d = reverse_edges(src, dst)
    assert s.tolist() == [1, 2, 1] and d.tolist() == [0, 1, 1]

    s, d = remove_self_loops(src, dst)
    assert len(s) == 2 and 1 not in set(zip(s.tolist(), d.tolist()))

    s, d = add_self_loops(np.array([0]), np.array([1]), 3)
    assert len(s) == 4

    s, d = to_bidirected(np.array([0, 1]), np.array([1, 2]))
    pairs = set(zip(s.tolist(), d.tolist()))
    assert pairs == {(0, 1), (1, 0), (1, 2), (2, 1)}


def test_drop_edge_mask():
    import jax

    from sir_gcn_tpu import drop_edge_mask

    g = build_graph(np.arange(100), np.arange(100) % 7, 100, e_pad=128)
    key = jax.random.PRNGKey(0)
    m = drop_edge_mask(key, g, 0.5)
    m = np.asarray(m)
    # never keeps padding edges
    assert not m[~np.asarray(g.edge_mask)].any()
    kept = m[np.asarray(g.edge_mask)].mean()
    assert 0.3 < kept < 0.7
    # rate 0 returns the plain mask
    m0 = np.asarray(drop_edge_mask(key, g, 0.0))
    assert (m0 == np.asarray(g.edge_mask)).all()
