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
    """Group a Keras model's weight-bearing layers by kind, in layer order.

    Nested functional sub-models (e.g. a keras.applications backbone used as
    a layer inside the reference's classifier graph, audiomodel.py:798) are
    flattened in place.  ``DepthwiseConv2D`` rides in the ``conv`` kind —
    creation order pairs it with the flax grouped conv; its (k, k, C, 1)
    kernel is transposed at set time.  ``Normalization`` (the EfficientNet
    stem statistics layer) has weights but no flax slot: its constants are
    static module attributes (backbones.EfficientNet.norm_mean/var), read
    separately by :func:`normalization_constants`.
    """
    kinds: dict[str, list] = {
        "conv": [], "bn": [], "dense": [], "mag": [], "pcen": []
    }
    for layer in model.layers:
        name = type(layer).__name__
        if hasattr(layer, "layers") and layer.layers:
            sub = _keras_layers_by_kind(layer)
            for k in kinds:
                kinds[k].extend(sub[k])
            continue
        if not layer.weights:
            continue
        if name in ("Conv2D", "DepthwiseConv2D"):
            kinds["conv"].append(layer)
        elif name == "BatchNormalization":
            kinds["bn"].append(layer)
        elif name == "Dense":
            kinds["dense"].append(layer)
        elif "MagTransform" in name:
            kinds["mag"].append(layer)
        elif name == "PCEN":
            kinds["pcen"].append(layer)
        elif name == "Normalization":
            continue  # static constants, not a transplant slot
        else:
            raise ValueError(f"unhandled Keras layer kind: {name}")
    return kinds


def normalization_constants(model):
    """Extract the (mean, variance) of a keras ``Normalization`` layer if the
    model (or a nested sub-model) has one — the EfficientNet stem stores the
    ImageNet statistics there when pretrained weights are loaded."""
    for layer in model.layers:
        if hasattr(layer, "layers") and layer.layers:
            found = normalization_constants(layer)
            if found is not None:
                return found
        if type(layer).__name__ == "Normalization" and layer.weights:
            import numpy as np

            mean = np.asarray(layer.mean).reshape(-1)
            var = np.asarray(layer.variance).reshape(-1)
            return tuple(float(v) for v in mean), tuple(
                float(v) for v in var
            )
    return None


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
        kernel = layer.weights[0].numpy()
        if type(layer).__name__ == "DepthwiseConv2D":
            # keras depthwise (k, k, C, mult=1) -> flax grouped-conv
            # (k, k, 1, C)
            kernel = kernel.transpose(0, 1, 3, 2)
        set_path(slot["kernel"], kernel)
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
        # badwinner v1's MagTransform stores a scalar (), v2 a (1,) vector
        # (badwinner.py:31-44 vs badwinner2.py:32-49); flax always uses (1,)
        set_path(slot["a"], layer.weights[0].numpy().reshape(-1))

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


# ---------------------------------------------------------------------------
# Pretrained-backbone weight import (audiomodel.get_base_model's
# weights="imagenet" path, audiomodel.py:972-1141) — gated on a locally
# available weight file, mirroring the zero-egress treatment of the
# embedding models (infer/embeddings.py).
# ---------------------------------------------------------------------------

# keras.applications constructor per registry backbone name
_KERAS_APP_BUILDERS = {
    "resnet": "ResNet50",
    "resnetv2": "ResNet50V2",
    "resnet152": "ResNet152",
    "vgg16": "VGG16",
    "vgg19": "VGG19",
    "mobilenet": "MobileNetV2",
    "densenet121": "DenseNet121",
    "efficientnetb0": "EfficientNetB0",
    "efficientnetb1": "EfficientNetB1",
    "efficientnetb5": "EfficientNetB5",
    "efficientnetv2b0": "EfficientNetV2B0",
    "efficientnetv2b3": "EfficientNetV2B3",
    "efficientnetv2bs": "EfficientNetV2S",
    "efficientnetv2bm": "EfficientNetV2M",
    "inceptionv3": "InceptionV3",
    "inceptionresnetv2": "InceptionResNetV2",
}

# keras.applications.efficientnet IMAGENET_STDDEV_RGB — the graph built with
# weights="imagenet" appends Rescaling(1/sqrt(std)) (keras issue #49930)
IMAGENET_STDDEV_RGB = (0.229, 0.224, 0.225)


def load_keras_backbone(model_name: str, weights_path, input_shape,
                        imagenet_stats: bool = True):
    """Build the keras.applications graph for ``model_name`` and load a
    LOCAL weight file into it (TF required; no downloads).  Returns
    ``(keras_model, backbone_args)`` where ``backbone_args`` are the static
    constants (EfficientNet normalization statistics + imagenet rescale) to
    pass to the flax backbone constructor.

    ``imagenet_stats`` controls the EfficientNet-v1 1/sqrt(std) rescale:
    keras adds that layer ONLY when building with ``weights="imagenet"``,
    so it belongs with the official ImageNet notop files (the documented
    use of --backbone-weights); pass False for a weight file saved from a
    ``weights=None`` graph (e.g. your own fine-tuned checkpoint)."""
    import os

    name = model_name.lower()
    if name not in _KERAS_APP_BUILDERS:
        raise ValueError(
            f"{model_name!r} is not a keras.applications backbone; "
            f"importable: {sorted(_KERAS_APP_BUILDERS)}"
        )
    if not os.path.exists(str(weights_path)):
        raise FileNotFoundError(
            f"backbone weight file not found: {weights_path} — download the "
            "keras.applications 'notop' weight file on a connected machine "
            "and point --backbone-weights at it"
        )
    try:
        import tensorflow as tf
    except Exception as e:  # pragma: no cover
        raise RuntimeError(
            "importing backbone weights requires tensorflow/keras to build "
            "the source graph"
        ) from e
    tf.config.set_visible_devices([], "GPU")
    builder = getattr(tf.keras.applications, _KERAS_APP_BUILDERS[name])
    model = builder(weights=None, include_top=False, input_shape=input_shape)
    model.load_weights(str(weights_path))

    backbone_args = []
    norm = normalization_constants(model)
    if norm is not None:
        mean, var = norm
        backbone_args += [("norm_mean", mean), ("norm_var", var)]
    if imagenet_stats and name.startswith("efficientnet") and not (
        name.startswith("efficientnetv2")
    ):
        # official imagenet EfficientNet weights expect the extra
        # 1/sqrt(std) rescale keras adds for weights="imagenet"
        backbone_args.append(
            ("extra_rescale",
             tuple(1.0 / v**0.5 for v in IMAGENET_STDDEV_RGB))
        )
    return model, tuple(backbone_args)


def transplant_backbone_into_classifier(variables, keras_model):
    """Copy a keras backbone's weights into the backbone submodule of a
    ``BackboneClassifier`` variables dict (the PCEN frontend and Dense head
    keep their fresh init, exactly like the reference which trains those
    from scratch on top of the pretrained trunk)."""
    params = _to_mutable(variables["params"])
    stats = _to_mutable(variables.get("batch_stats", {}))
    skip = ("PCENLayer", "MagTransform", "Dense", "LMELayer")
    backbone_keys = [
        k for k in params
        if hasattr(params[k], "items") and not k.startswith(skip)
    ]
    if len(backbone_keys) != 1:
        raise ValueError(
            f"expected exactly one backbone submodule, found {backbone_keys}"
        )
    key = backbone_keys[0]
    sub = {"params": params[key]}
    if key in stats:
        sub["batch_stats"] = stats[key]
    new_sub = transplant_keras_weights(sub, keras_model)
    params[key] = new_sub["params"]
    if "batch_stats" in new_sub:
        stats[key] = new_sub["batch_stats"]
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out
