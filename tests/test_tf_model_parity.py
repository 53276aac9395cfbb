"""Numerical logit parity vs the actual TF reference models (BASELINE.md
configs[1,3]): build the reference Keras graphs (badwinner2.build_model,
/root/reference/badwinner2.py:212-324; resnet/wr_resnet.WRResNet,
/root/reference/resnet/wr_resnet.py:5-33), randomize every weight, transplant
them into the Flax ports, and assert the outputs agree in fp32.

The reference tree is used as a black-box oracle only (imported, not copied).
"""

import pathlib
import sys

import numpy as np
import pytest

from tests.conftest import requires_tf

REFERENCE = pathlib.Path("/root/reference")

pytestmark = [
    requires_tf,
    pytest.mark.slow,
    pytest.mark.skipif(
        not (REFERENCE / "badwinner2.py").exists(),
        reason="reference tree not available",
    ),
]


@pytest.fixture(scope="module")
def tf():
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")
    return tf


def _randomize_keras_weights(tf, model, seed=0):
    """Give every weight (incl. BN moving stats) a non-default value so the
    parity check exercises the full transplant, not just fresh inits."""
    rng = np.random.default_rng(seed)
    for w in model.weights:
        name = w.name
        shape = tuple(w.shape)
        if "moving_variance" in name:
            val = rng.uniform(0.5, 2.0, shape)
        elif "a-power" in name:
            val = rng.uniform(-1.5, 0.5, shape)
        else:
            val = rng.normal(0.0, 0.35, shape)
        w.assign(val.astype(np.float32))


def _flax_apply(module, variables, x):
    import jax.numpy as jnp

    return np.asarray(module.apply(variables, jnp.asarray(x), train=False))


def test_badwinner2_logit_parity(tf):
    sys.path.insert(0, str(REFERENCE))
    try:
        import badwinner2 as ref_badwinner2
    finally:
        sys.path.pop(0)

    import jax

    from audio_training_tpu.models.badwinner2 import BadWinner2
    from audio_training_tpu.models.transplant import transplant_keras_weights

    num_labels = 5
    shape = (96, 201, 1)
    keras_model = ref_badwinner2.build_model(
        shape, None, num_labels, multi_label=True
    )
    _randomize_keras_weights(tf, keras_model, seed=1)

    rng = np.random.default_rng(2)
    x = np.abs(rng.normal(0.0, 1.0, (2, *shape))).astype(np.float32)
    ref_out = keras_model.predict(x, verbose=0)

    module = BadWinner2(num_labels=num_labels, multi_label=True)
    variables = module.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    variables = transplant_keras_weights(variables, keras_model)
    out = _flax_apply(module, variables, x)

    assert out.shape == ref_out.shape
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=2e-5)


def test_wr_resnet_logit_parity(tf):
    sys.path.insert(0, str(REFERENCE / "resnet"))
    try:
        import wr_resnet as ref_wr_resnet
    finally:
        sys.path.pop(0)

    import jax

    from audio_training_tpu.models.transplant import transplant_keras_weights
    from audio_training_tpu.models.wr_resnet import WRResNet

    classes, depth, k = 3, 10, 2
    shape = (64, 96, 1)
    keras_model = ref_wr_resnet.WRResNet(
        input_shape=shape, classes=classes, depth=depth, k=k
    )
    _randomize_keras_weights(tf, keras_model, seed=3)

    rng = np.random.default_rng(4)
    x = rng.normal(0.0, 1.0, (2, *shape)).astype(np.float32)
    ref_out = keras_model.predict(x, verbose=0)

    module = WRResNet(classes=classes, depth=depth, k=k)
    variables = module.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    variables = transplant_keras_weights(variables, keras_model)
    out = _flax_apply(module, variables, x)

    assert out.shape == ref_out.shape
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=2e-5)


def test_wr_resnet_bird_logit_parity(tf):
    """wr_resnet_bird in keras_slip_compat mode vs the actual reference
    graph.  tensorflow_probability isn't installed; the reference only uses
    tfp.math.reduce_logmeanexp, injected here as the exact identity
    logsumexp(x) - log(n) so the reference module imports unmodified."""
    import sys
    import types

    fake = types.ModuleType("tensorflow_probability")

    def reduce_logmeanexp(x, axis=None, keepdims=False):
        # keras.ops (not raw tf.*) so it also works on Keras-3 symbolic
        # tensors inside the reference's functional graph
        import keras

        return (keras.ops.logsumexp(x, axis=axis, keepdims=keepdims)
                - np.log(float(x.shape[axis])))

    fake.math = types.SimpleNamespace(reduce_logmeanexp=reduce_logmeanexp)
    sys.modules.setdefault("tensorflow_probability", fake)
    sys.path.insert(0, str(REFERENCE / "resnet"))
    try:
        import wr_resnet_bird as ref  # NOTE: builds a model at import
    finally:
        sys.path.pop(0)

    import jax

    from audio_training_tpu.models.transplant import transplant_keras_weights
    from audio_training_tpu.models.wr_resnet_bird import WRResNetBird

    classes, depth, k = 3, 10, 2
    shape = (48, 64, 1)
    keras_model = ref.WRResNet(input_shape=shape, classes=classes,
                               depth=depth, k=k)
    _randomize_keras_weights(tf, keras_model, seed=5)

    rng = np.random.default_rng(6)
    x = rng.normal(0.0, 1.0, (2, *shape)).astype(np.float32)
    ref_out = keras_model.predict(x, verbose=0)

    module = WRResNetBird(classes=classes, depth=depth, k=k,
                          keras_slip_compat=True)
    variables = module.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    variables = transplant_keras_weights(variables, keras_model)
    out = _flax_apply(module, variables, x)

    assert out.shape == ref_out.shape
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=2e-5)


def test_badwinner2_res_logit_parity(tf):
    """badwinner2-res (build_model_res, badwinner2.py:127-209) vs the
    reference graph: 4-conv res blocks, 48x3 condense, orthogonal head."""
    sys.path.insert(0, str(REFERENCE))
    try:
        import badwinner2 as ref_badwinner2
    finally:
        sys.path.pop(0)

    import jax

    from audio_training_tpu.models.badwinner2 import BadWinner2Res
    from audio_training_tpu.models.transplant import transplant_keras_weights

    num_labels = 5
    shape = (160, 201, 1)  # big-condense path requires 160 mels
    keras_model = ref_badwinner2.build_model_res(
        shape, None, num_labels, multi_label=True
    )
    _randomize_keras_weights(tf, keras_model, seed=7)

    rng = np.random.default_rng(8)
    x = np.abs(rng.normal(0.0, 1.0, (2, *shape))).astype(np.float32)
    ref_out = keras_model.predict(x, verbose=0)

    module = BadWinner2Res(num_labels=num_labels, multi_label=True)
    variables = module.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    variables = transplant_keras_weights(variables, keras_model)
    out = _flax_apply(module, variables, x)

    assert out.shape == ref_out.shape
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=2e-5)
