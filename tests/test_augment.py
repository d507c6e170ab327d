"""ADA augment pipeline tests."""

import numpy as np

import jax
import jax.numpy as jnp

from layoutdetr_tpu.training.augment import AdaController, AugmentConfig, augment_pipe


def test_augment_p0_is_identity():
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(2, 16, 16, 3)).astype(np.float32))
    out = augment_pipe(imgs, 0.0, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(imgs), atol=1e-5)


def test_augment_p1_changes_images_and_jits():
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.normal(size=(2, 16, 16, 3)).astype(np.float32))
    f = jax.jit(lambda im, p, k: augment_pipe(im, p, k))
    out = np.asarray(f(imgs, 1.0, jax.random.PRNGKey(1)))
    assert out.shape == imgs.shape
    assert np.isfinite(out).all()
    assert np.abs(out - np.asarray(imgs)).max() > 0.01

    # p is a traced argument: changing it must not retrigger compilation.
    out2 = np.asarray(f(imgs, 0.5, jax.random.PRNGKey(2)))
    assert np.isfinite(out2).all()


def test_ada_controller_direction():
    ctl = AdaController(target=0.6, interval=1, kimg=1.0, initial_p=0.5)
    p_up = ctl.update(1, 16, signs_real_mean=0.9)  # overfit -> p up
    assert p_up > 0.5
    ctl2 = AdaController(target=0.6, interval=1, kimg=1.0, initial_p=0.5)
    p_down = ctl2.update(1, 16, signs_real_mean=0.1)  # underfit -> p down
    assert p_down < 0.5
    # Clamped at 0.
    ctl3 = AdaController(target=0.6, interval=1, kimg=0.001, initial_p=0.0)
    assert ctl3.update(1, 16, signs_real_mean=0.0) == 0.0
