"""Checkpointing: native msgpack trees + torch-pkl import.

Upgrades over the reference's bare torch.save state_dict
(model/RIFE.py:52-54): the native format stores params, optimizer state
and step together for true resume (SURVEY.md §5 checkpoint/resume), and
the loader transparently accepts reference flownet.pkl files via the
torch importer.
"""
from __future__ import annotations

import json
import os
import struct

import jax
import jax.numpy as jnp
import numpy as np

_MAGIC = b"RIFETPU1"


def _flatten(tree, prefix=""):
    if isinstance(tree, dict):
        for k in sorted(tree):
            yield from _flatten(tree[k], f"{prefix}{k}/")
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _flatten(v, f"{prefix}{i}/")
    else:
        yield prefix[:-1], np.asarray(tree)


def save_params(path: str, params, meta: dict | None = None):
    """Single-file checkpoint: header json + npz-style raw tensors."""
    flat = dict(_flatten(params))
    header = {
        "meta": meta or {},
        "tensors": {
            k: {"dtype": str(v.dtype), "shape": list(v.shape)} for k, v in flat.items()
        },
    }
    hb = json.dumps(header).encode()
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<Q", len(hb)))
        f.write(hb)
        for k in sorted(flat):
            f.write(np.ascontiguousarray(flat[k]).tobytes())
    os.replace(tmp, path)


def _unflatten(flat: dict):
    root: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            # Index gaps are real: leafless tuple entries (e.g. optax
            # EmptyState) write no tensors.  Fill them with {} (also
            # leafless) so leaf order is preserved on restore.
            hi = max(int(k) for k in keys)
            return [listify(node[str(i)]) if str(i) in node else {}
                    for i in range(hi + 1)]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def load_params(path: str):
    """Returns (params_tree, meta)."""
    with open(path, "rb") as f:
        assert f.read(8) == _MAGIC, "not a rife_tpu checkpoint"
        (hlen,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(hlen))
        flat = {}
        for k in sorted(header["tensors"]):
            info = header["tensors"][k]
            n = int(np.prod(info["shape"])) if info["shape"] else 1
            dt = np.dtype(info["dtype"])
            buf = f.read(n * dt.itemsize)
            flat[k] = np.frombuffer(buf, dtype=dt).reshape(info["shape"]).copy()
    return _unflatten(flat), header["meta"]


def load_checkpoint(path: str, model: str | None = None):
    """Load native or torch-pkl checkpoints.

    Returns (model_name, params).  Torch pickles are converted through
    the importer; model auto-detection replaces the reference's
    import-cascade (inference_img.py:25-46).  A directory containing a
    legacy trio (flownet/contextnet/unet.pkl) loads as "hd" (v1,
    SE-block IFNet_HD) or "hdv2" depending on its keys.
    """
    from rife_tpu.models.registry import MODEL_REGISTRY, detect_model_from_state_dict
    from rife_tpu.models.torch_import import load_torch_pickle

    if os.path.isdir(path) and os.path.exists(os.path.join(path, "contextnet.pkl")):
        sd = {}
        for prefix, fname in (("flownet", "flownet.pkl"),
                              ("contextnet", "contextnet.pkl"),
                              ("fusionnet", "unet.pkl")):
            part = load_torch_pickle(os.path.join(path, fname))
            if any(k.startswith("module.") for k in part):
                part = {k.replace("module.", "", 1): v for k, v in part.items()}
            sd.update({f"{prefix}.{k}": v for k, v in part.items()})
        name = detect_model_from_state_dict(sd)  # "hd" (v1) or "hdv2"
        d = MODEL_REGISTRY[name]
        return name, jax.tree.map(jnp.asarray, d.import_torch(sd, d.config))

    with open(path, "rb") as f:
        magic = f.read(8)
    if magic == _MAGIC:
        params, meta = load_params(path)
        if isinstance(params, dict) and "params" in params \
                and "opt_state" in params:
            # cli/train epoch checkpoints save the full TrainState
            # (params + optimizer + step) — serving needs params only.
            params = params["params"]
        name = model or meta.get("model", "rife")
        return name, jax.tree.map(jnp.asarray, params)

    sd = load_torch_pickle(path)
    name = model or detect_model_from_state_dict(sd)
    d = MODEL_REGISTRY[name]
    params = d.import_torch(sd, d.config)
    return name, jax.tree.map(jnp.asarray, params)
