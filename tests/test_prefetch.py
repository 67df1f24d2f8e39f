import numpy as np
import pytest

from sir_gcn_tpu.data import prefetch


def test_prefetch_preserves_order_and_items():
    items = list(range(100))
    out = list(prefetch(iter(items), size=4))
    assert out == items


def test_prefetch_propagates_exceptions():
    def gen():
        yield 1
        raise ValueError("boom")

    it = prefetch(gen(), size=2)
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        list(it)


def test_prefetch_with_collection(rng):
    from sir_gcn_tpu.data.batching import GraphCollection

    graphs = [(rng.integers(0, 5, 8), rng.integers(0, 5, 8), 5)
              for _ in range(20)]
    coll = GraphCollection(graphs,
                           node_feats=[rng.normal(size=(5, 3))
                                       for _ in range(20)],
                           labels=np.arange(20, dtype=np.float32))
    direct = list(coll.loader(np.arange(20), 8))
    pre = list(prefetch(coll.loader(np.arange(20), 8)))
    assert len(direct) == len(pre)
    for a, b in zip(direct, pre):
        np.testing.assert_array_equal(a["labels"], b["labels"])
