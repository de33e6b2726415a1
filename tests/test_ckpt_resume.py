"""Checkpoint backend tests (the train-state resume e2e lives in
test_train_engine.py; this covers the optional Orbax backend)."""
def test_orbax_backend_roundtrip(tmp_path):
    """Optional Orbax backend: variables round-trip with values intact,
    including async save."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sc2bench_tpu.utils.ckpt import load_ckpt_orbax, save_ckpt_orbax
    variables = {'params': {'w': jnp.arange(12., dtype=jnp.float32
                                            ).reshape(3, 4),
                            'b': jnp.ones((4,))},
                 'batch_stats': {'m': jnp.zeros((4,))}}
    d = tmp_path / 'ck_orbax'
    save_ckpt_orbax(d, variables, meta={'epoch': 3})
    template = jax.tree.map(jnp.zeros_like, variables)
    restored, meta = load_ckpt_orbax(d, template, meta_template={'epoch': 0})
    for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert meta == {'epoch': 3}

    d2 = tmp_path / 'ck_orbax_async'
    ck = save_ckpt_orbax(d2, variables, async_save=True)
    ck.wait_until_finished()
    restored2, _ = load_ckpt_orbax(d2, template)
    np.testing.assert_array_equal(
        np.asarray(restored2['params']['w']),
        np.asarray(variables['params']['w']))
