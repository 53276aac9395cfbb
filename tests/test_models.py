"""Model shape/behavior tests vs the documented reference layer plans."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_training_tpu.models import (
    BadWinner2,
    WRResNet,
    build_model,
    logmeanexp,
)
from audio_training_tpu.models.registry import (
    MID_FEATURES_SHAPE,
    SHORT_FEATURES_SHAPE,
    MODEL_NAMES,
)

# Small mel geometry keeps CPU compile fast while still exercising every
# layer (96 mels hits badwinner2's (22,3) condense branch,
# badwinner2.py:261-262).  The time axis must survive the conv/pool stack:
# 243 -> ... -> 16 after the (1,9) time-context conv.
SMALL = (2, 96, 243, 1)


def _init_and_run(spec, inputs, train=False):
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = spec.module.init(rngs, *inputs, train=False)
    out = spec.module.apply(
        variables,
        *inputs,
        train=train,
        rngs={"dropout": jax.random.PRNGKey(2)} if train else None,
        mutable=["batch_stats"] if train else False,
    )
    if train:
        out = out[0]
    return out, variables


def test_badwinner2_shapes_and_range():
    x = jnp.asarray(np.random.default_rng(0).random(SMALL), jnp.float32)
    spec = build_model("badwinner2", num_labels=7)
    out, variables = _init_and_run(spec, [x])
    assert out.shape == (2, 7)
    assert (np.asarray(out) >= 0).all() and (np.asarray(out) <= 1).all()
    # MagTransform trainable power param exists (badwinner2.py:32-49)
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    names = ["/".join(str(p) for p in path) for path, _ in flat]
    assert any("MagTransform" in n and "a_power" in n for n in names)


def test_badwinner2_softmax_single_label():
    x = jnp.zeros(SMALL, jnp.float32)
    spec = build_model("badwinner2", num_labels=5, multi_label=False)
    out, _ = _init_and_run(spec, [x])
    np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, rtol=1e-5)


def test_badwinner2_train_mode_runs():
    x = jnp.asarray(np.random.default_rng(1).random(SMALL), jnp.float32)
    spec = build_model("badwinner2", num_labels=3)
    out, _ = _init_and_run(spec, [x], train=True)
    assert out.shape == (2, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_badwinner2_160mel_condense_shape():
    # 160-mel path uses the (44,3) condense conv (badwinner2.py:259-260);
    # verify the mel axis fully collapses before the (5,3) pool: with
    # 160 mels -> conv stack leaves H=5 -> pool(5,3) -> H=1.
    x = jnp.zeros((1, 160, 513, 1), jnp.float32)
    spec = build_model("badwinner2", num_labels=2)
    out, _ = _init_and_run(spec, [x])
    assert out.shape == (1, 2)


def test_condense_dx_dots_grad_matches_autodiff():
    """The dots-based data gradient of the big-condense conv
    (layers._condense_conv; 22.4 -> ~4 ms/step at B=128 on TPU, see
    docs/PERFORMANCE.md round 3c) is the same math reassociated: dw is
    bitwise the standard wgrad, dx matches autodiff to f32 tolerance."""
    from audio_training_tpu.models.layers import _condense_conv, _valid_conv

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 10, 12, 3)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((7, 3, 3, 4)) * 0.1, jnp.float32)
    hp = jax.lax.Precision.HIGHEST

    def f_custom(x_, w_):
        return (_condense_conv(hp, x_, w_) ** 2).sum()

    def f_ref(x_, w_):
        return (_valid_conv(x_, w_, hp) ** 2).sum()

    # identical forward
    np.testing.assert_array_equal(
        np.asarray(_condense_conv(hp, x, w)),
        np.asarray(_valid_conv(x, w, hp)),
    )
    gc = jax.grad(f_custom, argnums=(0, 1))(x, w)
    gr = jax.grad(f_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gc[0]), np.asarray(gr[0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(gc[1]), np.asarray(gr[1]))


def test_badwinner2_param_tree_has_condense_conv0():
    """dx_dots swaps the inner conv module but must keep the nn.Conv param
    paths (Conv_4/Conv_0/{kernel,bias}) so checkpoints/transplant/parity
    pairing are unchanged."""
    x = jnp.zeros((1, 160, 513, 1), jnp.float32)
    spec = build_model("badwinner2", num_labels=2)
    v = spec.module.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    p = v["params"]["Conv_4"]["Conv_0"]
    assert p["kernel"].shape == (44, 3, 128, 128)
    assert p["bias"].shape == (128,)


def test_badwinner2_lme():
    x = jnp.asarray(np.random.default_rng(2).random(SMALL), jnp.float32)
    spec = build_model("badwinner2", num_labels=4, lme=True)
    out, _ = _init_and_run(spec, [x])
    assert out.shape == (2, 4)


def test_badwinner2_res():
    x = jnp.asarray(np.random.default_rng(3).random((1, 160, 243, 1)),
                    jnp.float32)
    spec = build_model("badwinner2-res", num_labels=3)
    out, _ = _init_and_run(spec, [x])
    assert out.shape == (1, 3)


def test_wr_resnet():
    x = jnp.asarray(np.random.default_rng(4).random((2, 64, 96, 1)),
                    jnp.float32)
    spec = build_model("wr-resnet", num_labels=6)
    out, _ = _init_and_run(spec, [x])
    assert out.shape == (2, 6)
    assert (np.asarray(out) >= 0).all() and (np.asarray(out) <= 1).all()


def test_wr_resnet_bird():
    x = jnp.asarray(np.random.default_rng(5).random((1, 64, 96, 1)),
                    jnp.float32)
    spec = build_model("wr-resnet-bird", num_labels=4)
    out, _ = _init_and_run(spec, [x])
    assert out.shape == (1, 4)


def test_badwinner_v1():
    x = jnp.asarray(np.random.default_rng(6).random((2, 120, 480, 1)),
                    jnp.float32)
    spec = build_model("badwinner", num_labels=2)
    out, _ = _init_and_run(spec, [x])
    assert out.shape == (2, 2)


def test_cnn_features_model():
    s = jnp.zeros((2, *SHORT_FEATURES_SHAPE), jnp.float32)
    m = jnp.zeros((2, *MID_FEATURES_SHAPE), jnp.float32)
    spec = build_model("cnn-features", num_labels=5)
    out, _ = _init_and_run(spec, [s, m])
    assert out.shape == (2, 5)


def test_merge_model():
    mel = jnp.zeros(SMALL, jnp.float32)
    s = jnp.zeros((2, *SHORT_FEATURES_SHAPE), jnp.float32)
    m = jnp.zeros((2, *MID_FEATURES_SHAPE), jnp.float32)
    spec = build_model("merge", num_labels=3)
    out, _ = _init_and_run(spec, [mel, s, m])
    assert out.shape == (2, 3)


def test_dual_badwinner2():
    mel = jnp.zeros(SMALL, jnp.float32)
    spec = build_model("dual-badwinner2", num_labels=3)
    out, _ = _init_and_run(spec, [mel, mel])
    assert out.shape == (2, 3)


def test_embeddings_linear():
    x = jnp.zeros((4, 1280), jnp.float32)  # Perch embedding dim
    spec = build_model("embeddings", num_labels=10)
    out, _ = _init_and_run(spec, [x])
    assert out.shape == (4, 10)


@pytest.mark.parametrize("name", ["mobilenet", "efficientnetb0"])
def test_backbone_classifier(name):
    x = jnp.asarray(np.random.default_rng(7).random((1, 64, 96, 1)),
                    jnp.float32)
    spec = build_model(name, num_labels=3)
    out, _ = _init_and_run(spec, [x])
    assert out.shape == (1, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_backbone_classifier_inception():
    """The inception family (audiomodel.py:1056-1072) routes through the
    same BackboneClassifier adapter; needs a taller input than the other
    zoo smokes — the VALID stem reduces ~10x before the 3x3/2 reduction
    blocks.  Keras-exactness is anchored separately in
    test_tf_model_parity.test_more_backbones_parity."""
    x = jnp.asarray(np.random.default_rng(7).random((1, 96, 101, 1)),
                    jnp.float32)
    spec = build_model("inceptionv3", num_labels=3)
    out, _ = _init_and_run(spec, [x])
    assert out.shape == (1, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_backbone_classifier_external_frontend():
    """external_frontend=True skips the in-model PCEN/MagTransform — the
    input is already PCEN'd (fused featurizer serving path); no PCEN params
    exist in the tree."""
    x = jnp.asarray(np.random.default_rng(7).random((1, 64, 96, 3)),
                    jnp.float32)
    spec = build_model("efficientnetb0", num_labels=3,
                       external_frontend=True)
    out, variables = _init_and_run(spec, [x])
    assert out.shape == (1, 3)
    flat = str(list(variables["params"].keys()))
    assert "PCEN" not in flat and "MagTransform" not in flat


def test_fold_gray_stem_exact():
    """fold_gray_stem: logits on the 1-channel mel equal the 3-channel
    repeat path (tfdataset.raw_to_mel's tf.repeat, tfdataset.py:175-180) —
    conv(repeat(x,3), W) == conv(x, W.sum(axis=2)) up to fp reassociation."""
    from audio_training_tpu.models import fold_gray_stem

    x1 = jnp.asarray(np.random.default_rng(9).random((2, 64, 96, 1)),
                     jnp.float32)
    spec = build_model("efficientnetb0", num_labels=5, logits_only=True,
                       external_frontend=True)
    x3 = jnp.repeat(x1, 3, axis=-1)
    variables = spec.module.init({"params": jax.random.PRNGKey(3)}, x3,
                                 train=False)
    ref = spec.module.apply(variables, x3, train=False)
    folded = fold_gray_stem(spec, variables)
    out = spec.module.apply(folded, x1, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-5)


def test_fold_gray_stem_refuses_per_channel_constants():
    """Per-channel normalization makes the fold inexact -> ValueError."""
    from audio_training_tpu.models import fold_gray_stem

    spec = build_model(
        "efficientnetb0", num_labels=3, external_frontend=True,
        backbone_args=(("norm_mean", (0.485, 0.456, 0.406)),
                       ("norm_var", (0.052, 0.050, 0.051))),
    )
    with pytest.raises(ValueError, match="per-channel"):
        fold_gray_stem(spec, {"params": {}})
    spec_v2 = build_model("efficientnetv2b0", num_labels=3,
                          external_frontend=True)
    with pytest.raises(ValueError, match="EfficientNetV2"):
        fold_gray_stem(spec_v2, {"params": {}})


def test_logmeanexp_between_mean_and_max():
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.random((4, 10)), jnp.float32)
    lme = np.asarray(logmeanexp(x, axis=1, sharpness=5, keepdims=False))
    assert (lme >= np.asarray(x).mean(1) - 1e-5).all()
    assert (lme <= np.asarray(x).max(1) + 1e-5).all()


def test_random_forest_adapter():
    from audio_training_tpu.models import build_random_forest

    rf = build_random_forest(n_estimators=5)
    X = np.random.default_rng(9).random((40, 10))
    y = (X[:, 0] > 0.5).astype(int)
    rf.fit(X, y)
    assert rf.score(X, y) > 0.9


def test_unknown_model_name():
    with pytest.raises(ValueError):
        build_model("not-a-model", num_labels=2)
    assert "badwinner2" in MODEL_NAMES and "efficientnetv2bm" in MODEL_NAMES


def test_handrolled_resnet50_headless():
    """Faithful hand-rolled ResNet50 (resnet/resnet.py:5-78): VALID 7x7/2
    stem after ZeroPad(3), stride on the first 1x1, 2x2 AvgPool + Flatten
    head — 64x64x3 -> (B, 2048) like the Keras original."""
    import jax
    import numpy as np

    from audio_training_tpu.models.resnet import ResNet50

    m = ResNet50()
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 64, 64, 3)).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(variables, x, train=False)
    assert out.shape == (2, 2048)
    assert bool(jnp.isfinite(out).all())
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(
        variables["params"]))
    assert 23_000_000 < n_params < 24_000_000  # classic ResNet50 trunk
