"""Checkpoint backend tests (the train-state resume e2e lives in
test_train_engine.py; this covers the optional Orbax backend)."""
import jax
import jax.numpy as jnp
import numpy as np


def _variables():
    return {'params': {'w': jnp.arange(12., dtype=jnp.float32).reshape(3, 4),
                       'b': jnp.ones((4,))},
            'batch_stats': {'m': jnp.zeros((4,))}}


def test_orbax_backend_roundtrip(tmp_path):
    """Variables round-trip intact; meta restores without any template;
    async save finalizes atomically."""
    from sc2bench_tpu.utils.ckpt import load_ckpt_orbax, save_ckpt_orbax
    variables = _variables()
    template = jax.tree.map(jnp.zeros_like, variables)

    d = tmp_path / 'ck_orbax'
    save_ckpt_orbax(d, variables, meta={'epoch': 3})
    restored, meta = load_ckpt_orbax(d, template)
    for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert meta == {'epoch': 3}

    d2 = tmp_path / 'ck_orbax_async'
    ck = save_ckpt_orbax(d2, variables, async_save=True)
    ck.wait_until_finished()
    restored2, meta2 = load_ckpt_orbax(d2, template)
    assert meta2 is None
    np.testing.assert_array_equal(
        np.asarray(restored2['params']['w']),
        np.asarray(variables['params']['w']))


def test_orbax_overwrite_preserves_old_until_new_is_durable(tmp_path):
    """Re-saving to the same directory must never leave a window with no
    valid checkpoint: the previous save survives until the new one is
    finalized, and the swap yields the new values."""
    from sc2bench_tpu.utils.ckpt import load_ckpt_orbax, save_ckpt_orbax
    v1 = _variables()
    v2 = jax.tree.map(lambda a: a + 100.0, v1)
    template = jax.tree.map(jnp.zeros_like, v1)
    d = tmp_path / 'ck'
    save_ckpt_orbax(d, v1)

    ck = save_ckpt_orbax(d, v2, async_save=True)
    # before finalize, the OLD checkpoint must still load
    restored_old, _ = load_ckpt_orbax(d, template)
    np.testing.assert_array_equal(
        np.asarray(restored_old['params']['w']),
        np.asarray(v1['params']['w']))
    ck.wait_until_finished()
    restored_new, _ = load_ckpt_orbax(d, template)
    np.testing.assert_array_equal(
        np.asarray(restored_new['params']['w']),
        np.asarray(v2['params']['w']))
