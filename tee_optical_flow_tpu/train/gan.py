"""Adversarial training helpers.

Parity with the reference's GAN utilities (finetune-SAM/utils/utils.py:
update_d :1087, gradient penalty :1113): one discriminator update with
WGAN-GP, expressed functionally for optax.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def gradient_penalty(disc_apply: Callable, disc_params, real: jnp.ndarray,
                     fake: jnp.ndarray, rng) -> jnp.ndarray:
    """WGAN-GP penalty: (||grad_x D(x_interp)|| - 1)^2 averaged over batch."""
    eps = jax.random.uniform(rng, (real.shape[0],) + (1,) * (real.ndim - 1))
    interp = eps * real + (1.0 - eps) * fake

    def d_sum(x):
        return jnp.sum(disc_apply(disc_params, x))

    grads = jax.grad(d_sum)(interp)
    norms = jnp.sqrt(jnp.sum(grads ** 2, axis=tuple(range(1, grads.ndim))) + 1e-12)
    return jnp.mean((norms - 1.0) ** 2)


def discriminator_loss(disc_apply: Callable, disc_params, real, fake,
                       rng, gp_weight: float = 10.0):
    """Wasserstein discriminator loss with gradient penalty
    (the reference's update_d step, functional form)."""
    d_real = jnp.mean(disc_apply(disc_params, real))
    d_fake = jnp.mean(disc_apply(disc_params, fake))
    gp = gradient_penalty(disc_apply, disc_params, real, fake, rng)
    return d_fake - d_real + gp_weight * gp, (d_real, d_fake, gp)


def make_update_d(disc_apply: Callable, tx) -> Callable:
    """Build a jitted discriminator update step."""

    @jax.jit
    def update_d(disc_params, opt_state, real, fake, rng):
        (loss, aux), grads = jax.value_and_grad(
            lambda p: discriminator_loss(disc_apply, p, real, fake, rng),
            has_aux=True)(disc_params)
        updates, new_opt = tx.update(grads, opt_state, disc_params)
        import optax

        new_params = optax.apply_updates(disc_params, updates)
        return new_params, new_opt, loss, aux

    return update_d
