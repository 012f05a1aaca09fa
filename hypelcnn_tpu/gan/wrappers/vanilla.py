"""Vanilla GAN shadow-translation trainer (x2y or y2x via ``swap_inputs``).

Parity with reference `gan/wrappers/gan_wrapper.py:14-67`: tfgan gan_model +
gan_loss defaults — wasserstein generator/discriminator losses with a
tensor pool feeding the discriminator — Adam(beta1=0.5), sequential
generator-then-discriminator updates per step, discriminator l2
regularization included in its loss (tfgan adds scope regularization).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from hypelcnn_tpu.gan.losses import (
    l2_regularization,
    wasserstein_discriminator_loss,
    wasserstein_generator_loss,
)
from hypelcnn_tpu.gan.models import ShadowDiscriminator, ShadowGenerator
from hypelcnn_tpu.gan.wrappers.base import (
    GANState,
    GANTrainerBase,
    PoolState,
    apply_update,
    gan_adam,
    pool_apply,
    translate_patch,
)

POOL_SIZE = 50  # tfgan tensor_pool default


class VanillaGANTrainer(GANTrainerBase):
    name = "gan"

    def __init__(self, band_count: int, config: Dict[str, Any], max_steps: int,
                 swap_inputs: bool):
        super().__init__(band_count, config, max_steps)
        self.swap_inputs = swap_inputs
        self.generator = ShadowGenerator(
            band_size=band_count,
            impl="toeplitz" if config.get("fused_generator") else "conv")
        self.discriminator = ShadowDiscriminator(band_size=band_count)
        self.gen_tx = gan_adam(config.get("generator_lr", 2e-4), max_steps)
        self.disc_tx = gan_adam(config.get("discriminator_lr", 1e-4), max_steps)
        self.disc_reg_scale = config.get("discriminator_reg_scale", 1e-5)

    def init_state(self, key: jax.Array) -> GANState:
        k1, k2 = jax.random.split(key)
        dummy = jnp.zeros((2, 1, 1, self.band_count), dtype=jnp.float32)
        gen_params = self.generator.init(k1, dummy)["params"]
        disc_params = self.discriminator.init(k2, dummy, dummy)["params"]
        params = {"generator": gen_params, "discriminator": disc_params}
        opt_states = {"generator": self.gen_tx.init(gen_params),
                      "discriminator": self.disc_tx.init(disc_params)}
        pool = PoolState.create(POOL_SIZE, (1, 1, self.band_count))
        return GANState(step=jnp.zeros((), jnp.int32), params=params,
                        opt_states=opt_states, pool=pool)

    def _direction(self, x, y):
        return (y, x) if self.swap_inputs else (x, y)

    def build_train_step(self):
        gen_apply = self.generator.apply
        disc_apply = self.discriminator.apply

        def step(state: GANState, x, y, key):
            gen_inputs, real_data = self._direction(x, y)

            # --- generator update ---
            def gen_loss_fn(gp):
                gen_data = gen_apply({"params": gp}, gen_inputs)
                d_gen = disc_apply({"params": state.params["discriminator"]},
                                   gen_data, gen_inputs)
                return wasserstein_generator_loss(d_gen)

            g_loss, g_grads = jax.value_and_grad(gen_loss_fn)(state.params["generator"])
            new_gen, new_gen_opt = apply_update(self.gen_tx, g_grads,
                                                state.opt_states["generator"],
                                                state.params["generator"])

            # --- discriminator update (sees updated generator + pooled fakes) ---
            gen_data = gen_apply({"params": new_gen}, gen_inputs)
            new_pool, pooled_data, pooled_inputs = pool_apply(
                state.pool, gen_data, gen_inputs, key)

            def disc_loss_fn(dp):
                d_gen = disc_apply({"params": dp}, pooled_data, pooled_inputs)
                d_real = disc_apply({"params": dp}, real_data, gen_inputs)
                return (wasserstein_discriminator_loss(d_real, d_gen)
                        + l2_regularization(dp, self.disc_reg_scale, exclude=("fc3",)))

            d_loss, d_grads = jax.value_and_grad(disc_loss_fn)(state.params["discriminator"])
            new_disc, new_disc_opt = apply_update(self.disc_tx, d_grads,
                                                  state.opt_states["discriminator"],
                                                  state.params["discriminator"])

            new_state = GANState(
                step=state.step + 1,
                params={"generator": new_gen, "discriminator": new_disc},
                opt_states={"generator": new_gen_opt, "discriminator": new_disc_opt},
                pool=new_pool)
            return new_state, {"generator_loss": g_loss, "discriminator_loss": d_loss}

        return step

    def translate(self, params, x: jax.Array, is_shadow: bool) -> jax.Array:
        # a single generator handles its trained direction only; both flags
        # route to it (reference GANInferenceWrapper has one generator scope)
        return translate_patch(
            lambda v: self.generator.apply({"params": params["generator"]}, v), x)
