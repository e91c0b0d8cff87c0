

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
