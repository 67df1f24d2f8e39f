import jax
import jax.numpy as jnp
import numpy as np


def test_checkpoint_roundtrip(tmp_path):
    import optax

    from sir_gcn_tpu.train import init_state, make_adamw
    from sir_gcn_tpu.utils import load_checkpoint, save_checkpoint

    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones(3)}
    tx = make_adamw(1e-3)
    state = init_state({"params": params}, tx)
    save_checkpoint(str(tmp_path / "ckpt"), state, step=7)

    fresh = init_state(
        {"params": jax.tree_util.tree_map(jnp.zeros_like, params)}, tx)
    restored = load_checkpoint(str(tmp_path / "ckpt"), fresh)
    np.testing.assert_allclose(np.asarray(restored.params["w"]),
                               np.asarray(params["w"]))


def test_metrics():
    from sir_gcn_tpu.train.metrics import (
        accuracy,
        balanced_accuracy,
        mae,
        mse,
        roc_auc,
    )

    logits = np.array([[2.0, 1.0], [0.0, 3.0], [1.0, 0.0]])
    labels = np.array([0, 1, 1])
    assert abs(accuracy(logits, labels) - 2 / 3) < 1e-6

    # balanced accuracy: class 0 recall 1.0, class 1 recall 0.5
    assert abs(balanced_accuracy(logits, labels, 2) - 0.75) < 1e-6

    # AUC vs hand computation: scores .9,.8,.3,.2 labels 1,0,1,0 -> 0.75
    assert abs(roc_auc(np.array([0.9, 0.8, 0.3, 0.2]),
                       np.array([1, 0, 1, 0])) - 0.75) < 1e-6
    # tie-aware: all equal scores -> 0.5
    assert abs(roc_auc(np.ones(4), np.array([1, 0, 1, 0])) - 0.5) < 1e-6

    assert mae(np.array([1.0, 2.0]), np.array([2.0, 0.0])) == 1.5
    assert mse(np.array([1.0, 2.0]), np.array([2.0, 0.0])) == 2.5


def test_plateau_scheduler_matches_torch_semantics():
    from sir_gcn_tpu.train import ReduceLROnPlateau

    s = ReduceLROnPlateau(factor=0.5, patience=2)
    # improving: no decay
    for v in [10.0, 9.0, 8.0]:
        assert s.step(v) == 1.0
    # stall for patience+1 epochs -> decay
    assert s.step(8.0) == 1.0   # bad 1
    assert s.step(8.0) == 1.0   # bad 2
    assert s.step(8.0) == 0.5   # bad 3 > patience
    # counter resets after decay
    assert s.step(8.0) == 0.5
    assert s.step(8.0) == 0.5
    assert s.step(8.0) == 0.25
