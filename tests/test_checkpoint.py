

def test_convert_cli_roundtrip(tmp_path):
    """convert CLI: native -> torch pkl -> native, params identical."""
    import jax
    import numpy as np

    from rife_tpu.cli.convert import main as convert
    from rife_tpu.engine.checkpoint import load_checkpoint, save_params
    from rife_tpu.models.registry import MODEL_REGISTRY

    d = MODEL_REGISTRY["rife"]
    params = d.init(jax.random.PRNGKey(5), d.config)
    native = str(tmp_path / "a.ckpt")
    save_params(native, params, meta={"model": "rife"})

    pkl = str(tmp_path / "flownet.pkl")
    convert(["--input", native, "--output", pkl, "--to", "torch"])
    back = str(tmp_path / "b.ckpt")
    convert(["--input", pkl, "--output", back])

    name, restored = load_checkpoint(back)
    assert name == "rife"
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))


def test_train_driver_checkpoint_loads_in_serving_cli(tmp_path):
    """cli/train epoch checkpoints save the full TrainState (params +
    opt_state + step); load_checkpoint must unwrap to params so the
    serving CLIs / benchmark runner can consume a trained run directly
    (round-4 regression: KeyError block0)."""
    import numpy as np
    import optax

    import jax
    import jax.numpy as jnp

    from rife_tpu.engine import load_checkpoint
    from rife_tpu.engine.checkpoint import save_params
    from rife_tpu.models.registry import MODEL_REGISTRY

    d = MODEL_REGISTRY["rife"]
    params = d.init(jax.random.PRNGKey(0), d.config)
    tx = optax.adamw(1e-4)
    path = str(tmp_path / "flownet.rtpu")
    save_params(path, {
        "params": jax.tree.map(np.asarray, params),
        "opt_state": jax.tree.map(np.asarray, tx.init(params)),
        "step": np.asarray(5),
    }, meta={"model": "rife", "step": 5})
    name, loaded = load_checkpoint(path)
    assert name == "rife"
    ref_leaves = jax.tree.leaves(params)
    got_leaves = jax.tree.leaves(loaded)
    assert len(ref_leaves) == len(got_leaves)
    for a, b in zip(ref_leaves, got_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    from rife_tpu.cli.interp_img import build_engine

    eng = build_engine(path, None)
    z = jnp.zeros((1, 32, 64, 3), jnp.float32)
    assert np.asarray(eng.interpolate(z, z)).shape == (1, 32, 64, 3)
