"""Keras -> Flax weight transplantation.

Lets users of the TF reference (badwinner2.build_model, badwinner2.py:212-324;
resnet/wr_resnet.WRResNet, resnet/wr_resnet.py:5-33) carry trained weights
into the Flax ports, and anchors the numerical logit-parity tests
(BASELINE.md configs[1,3]).

The mapping is positional: Keras functional models enumerate layers in call
order, and Flax ``nn.compact`` inserts submodule params in call order, so the
k-th Conv2D/BatchNormalization/Dense/MagTransform on each side correspond.
Both frameworks store conv kernels as HWIO and dense kernels as (in, out), so
no transposes are needed — only BN's (gamma, beta, moving_mean,
moving_variance) -> (scale, bias, mean, var) renaming.
"""

from __future__ import annotations

from typing import Any, Iterator


def _walk(tree: dict, path: tuple = ()) -> Iterator[tuple[tuple, Any]]:
    """Depth-first leaf walk preserving dict insertion order (= Flax module
    creation order, which is call order under nn.compact)."""
    if hasattr(tree, "items"):
        for k, v in tree.items():
            yield from _walk(v, path + (k,))
    else:
        yield path, tree


def _to_mutable(tree):
    if hasattr(tree, "items"):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return tree


def _set_leaf(tree: dict, path: tuple, value) -> None:
    node = tree
    for k in path[:-1]:
        node = node[k]
    old = node[path[-1]]
    if tuple(old.shape) != tuple(value.shape):
        raise ValueError(
            f"shape mismatch at {'/'.join(path)}: "
            f"flax {tuple(old.shape)} vs keras {tuple(value.shape)}"
        )
    import jax.numpy as jnp

    node[path[-1]] = jnp.asarray(value, dtype=old.dtype)


def _keras_layers_by_kind(model) -> dict[str, list]:
    """Group a Keras model's weight-bearing layers by kind, in layer order."""
    kinds: dict[str, list] = {
        "conv": [], "bn": [], "dense": [], "mag": [], "pcen": []
    }
    for layer in model.layers:
        name = type(layer).__name__
        if not layer.weights:
            continue
        if name == "Conv2D":
            kinds["conv"].append(layer)
        elif name == "BatchNormalization":
            kinds["bn"].append(layer)
        elif name == "Dense":
            kinds["dense"].append(layer)
        elif "MagTransform" in name:
            kinds["mag"].append(layer)
        elif name == "PCEN":
            kinds["pcen"].append(layer)
        else:
            raise ValueError(f"unhandled Keras layer kind: {name}")
    return kinds


def _flax_slots(variables) -> dict[str, list]:
    """Collect transplant slots from a Flax variables dict, in creation
    order.  Each slot is a dict of path tuples."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    slots: dict[str, list] = {
        "conv": [], "bn": [], "dense": [], "mag": [], "pcen": []
    }
    bn_params: dict[tuple, dict] = {}
    pcen_paths: dict[tuple, dict] = {}
    for path, _leaf in _walk(params):
        owner, leaf = path[:-1], path[-1]
        owner_name = owner[-1] if owner else ""
        if owner_name.startswith("Conv_") and leaf == "kernel":
            slots["conv"].append({"kernel": path, "bias": owner + ("bias",)})
        elif owner_name.startswith("Dense_") and leaf == "kernel":
            slots["dense"].append({"kernel": path, "bias": owner + ("bias",)})
        elif owner_name.startswith("BatchNorm_"):
            bn_params.setdefault(owner, {})[leaf] = path
        elif leaf == "a_power":
            slots["mag"].append({"a": path})
        elif owner_name.startswith("PCENLayer_"):
            pcen_paths.setdefault(owner, {})[leaf] = path
    for path, _leaf in _walk(stats):
        owner, leaf = path[:-1], path[-1]
        if owner[-1].startswith("BatchNorm_"):
            bn_params.setdefault(owner, {})[leaf] = ("batch_stats",) + path
    # bn_params keys follow params insertion order for BNs with params; pure
    # stats BNs (scale/center off) were inserted during the stats walk —
    # re-derive call order from the walk over stats (every BN has stats).
    ordered_bn = []
    seen = set()
    for path, _leaf in _walk(stats):
        owner = path[:-1]
        if owner[-1].startswith("BatchNorm_") and owner not in seen:
            seen.add(owner)
            ordered_bn.append(bn_params[owner])
    slots["bn"] = ordered_bn
    slots["pcen"] = list(pcen_paths.values())
    return slots


def transplant_keras_weights(variables, keras_model):
    """Copy a Keras model's weights into a Flax ``variables`` dict
    (``{"params": ..., "batch_stats": ...}``) and return the new dict.

    Raises if the two models don't pair up layer-for-layer.
    """
    kinds = _keras_layers_by_kind(keras_model)
    slots = _flax_slots(variables)
    out = {
        "params": _to_mutable(variables["params"]),
        "batch_stats": _to_mutable(variables.get("batch_stats", {})),
    }

    def set_path(path, value):
        if path[0] == "batch_stats":
            _set_leaf(out["batch_stats"], path[1:], value)
        else:
            _set_leaf(out["params"], path, value)

    for kind in ("conv", "dense", "bn", "mag", "pcen"):
        if len(kinds[kind]) != len(slots[kind]):
            raise ValueError(
                f"{kind}: keras has {len(kinds[kind])} layers, "
                f"flax has {len(slots[kind])} slots"
            )

    for layer, slot in zip(kinds["conv"] + kinds["dense"],
                           slots["conv"] + slots["dense"]):
        set_path(slot["kernel"], layer.kernel.numpy())
        if getattr(layer, "use_bias", True) and layer.bias is not None:
            set_path(slot["bias"], layer.bias.numpy())

    for layer, slot in zip(kinds["bn"], slots["bn"]):
        if layer.gamma is not None and "scale" in slot:
            set_path(slot["scale"], layer.gamma.numpy())
        if layer.beta is not None and "bias" in slot:
            set_path(slot["bias"], layer.beta.numpy())
        set_path(slot["mean"], layer.moving_mean.numpy())
        set_path(slot["var"], layer.moving_variance.numpy())

    for layer, slot in zip(kinds["mag"], slots["mag"]):
        set_path(slot["a"], layer.weights[0].numpy())

    for layer, slot in zip(kinds["pcen"], slots["pcen"]):
        by_name = {w.name.split("/")[-1].split(":")[0]: w for w in layer.weights}
        for tf_name, flax_name in (
            ("gain", "gain"), ("bias", "bias"), ("root", "root"),
            ("smooth", "smooth"),
        ):
            for key, w in by_name.items():
                if tf_name in key and flax_name in slot:
                    set_path(slot[flax_name], w.numpy().reshape(-1)[:1])
                    break

    if not out["batch_stats"]:
        out.pop("batch_stats")
    return out
