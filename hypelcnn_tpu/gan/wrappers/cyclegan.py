"""CycleGAN shadow-translation trainer (optionally with identity loss).

Parity with reference `gan/wrappers/cycle_gan_wrapper.py`:

- two generator/discriminator pairs under ModelX2Y / ModelY2X,
- least-squares adversarial losses (tfgan cyclegan defaults) with a tensor
  pool per discriminator,
- aux loss = cycle_consistency_weight * (|F(G(x))-x| + |G(F(y))-y|)
  + identity_weight * (|G(x)-x| + |F(y)-y|), added to BOTH partial generator
  losses (so the joint generator update counts it twice — tfgan semantics
  preserved).  NOTE the reference's "identity" terms compare each generator
  to its own *input* domain (`cyclegan_model_with_identity`,
  `cycle_gan_wrapper.py:308-318`), not the standard same-domain mapping —
  preserved as-is.
- joint updates: one Adam step over both generators, then one over both
  discriminators (tfgan gan_train_ops for CycleGAN).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from hypelcnn_tpu.gan.losses import (
    cycle_consistency_loss,
    identity_loss,
    l2_regularization,
    least_squares_discriminator_loss,
    least_squares_generator_loss,
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

POOL_SIZE = 50


class CycleGANTrainer(GANTrainerBase):
    name = "cycle_gan"

    def __init__(self, band_count: int, config: Dict[str, Any], max_steps: int):
        super().__init__(band_count, config, max_steps)
        self.generator = ShadowGenerator(
            band_size=band_count,
            impl="toeplitz" if config.get("fused_generator") else "conv")
        self.discriminator = ShadowDiscriminator(band_size=band_count)
        self.cycle_weight = config.get("cycle_consistency_loss_weight", 10.0)
        self.use_identity = config.get("use_identity_loss", True)
        self.identity_weight = config.get("identity_loss_weight", 0.5)
        self.disc_reg_scale = config.get("discriminator_reg_scale", 1e-5)
        self.gen_tx = gan_adam(config.get("generator_lr", 2e-4), max_steps)
        self.disc_tx = gan_adam(config.get("discriminator_lr", 1e-4), max_steps)

    def init_state(self, key: jax.Array) -> GANState:
        keys = jax.random.split(key, 4)
        dummy = jnp.zeros((2, 1, 1, self.band_count), dtype=jnp.float32)
        params = {
            "gen_x2y": self.generator.init(keys[0], dummy)["params"],
            "gen_y2x": self.generator.init(keys[1], dummy)["params"],
            "disc_x2y": self.discriminator.init(keys[2], dummy, dummy)["params"],
            "disc_y2x": self.discriminator.init(keys[3], dummy, dummy)["params"],
        }
        gen_joint = {"gen_x2y": params["gen_x2y"], "gen_y2x": params["gen_y2x"]}
        disc_joint = {"disc_x2y": params["disc_x2y"], "disc_y2x": params["disc_y2x"]}
        opt_states = {"generators": self.gen_tx.init(gen_joint),
                      "discriminators": self.disc_tx.init(disc_joint)}
        pool = {"x2y": PoolState.create(POOL_SIZE, (1, 1, self.band_count)),
                "y2x": PoolState.create(POOL_SIZE, (1, 1, self.band_count))}
        return GANState(step=jnp.zeros((), jnp.int32), params=params,
                        opt_states=opt_states, pool=pool)

    def build_train_step(self):
        g_apply = self.generator.apply
        d_apply = self.discriminator.apply

        def aux_loss(gen_params, x, y):
            gen_y = g_apply({"params": gen_params["gen_x2y"]}, x)      # G(x)
            gen_x = g_apply({"params": gen_params["gen_y2x"]}, y)      # F(y)
            rec_x = g_apply({"params": gen_params["gen_y2x"]}, gen_y)  # F(G(x))
            rec_y = g_apply({"params": gen_params["gen_x2y"]}, gen_x)  # G(F(y))
            aux = self.cycle_weight * cycle_consistency_loss(x, rec_x, y, rec_y)
            if self.use_identity:
                aux = aux + self.identity_weight * (identity_loss(x, gen_y)
                                                    + identity_loss(y, gen_x))
            return aux, gen_y, gen_x

        def step(state: GANState, x, y, key):
            disc_params = {"disc_x2y": state.params["disc_x2y"],
                           "disc_y2x": state.params["disc_y2x"]}

            # --- joint generator update ---
            def gen_loss_fn(gen_params):
                aux, gen_y, gen_x = aux_loss(gen_params, x, y)
                adv_x2y = least_squares_generator_loss(
                    d_apply({"params": disc_params["disc_x2y"]}, gen_y, x))
                adv_y2x = least_squares_generator_loss(
                    d_apply({"params": disc_params["disc_y2x"]}, gen_x, y))
                # aux added to both partial generator losses (tfgan semantics)
                return (adv_x2y + aux) + (adv_y2x + aux)

            gen_joint = {"gen_x2y": state.params["gen_x2y"],
                         "gen_y2x": state.params["gen_y2x"]}
            g_loss, g_grads = jax.value_and_grad(gen_loss_fn)(gen_joint)
            new_gens, new_gen_opt = apply_update(self.gen_tx, g_grads,
                                                 state.opt_states["generators"], gen_joint)

            # --- joint discriminator update (updated generators + pools) ---
            gen_y = g_apply({"params": new_gens["gen_x2y"]}, x)
            gen_x = g_apply({"params": new_gens["gen_y2x"]}, y)
            k1, k2 = jax.random.split(key)
            pool_x2y, pooled_y, _ = pool_apply(state.pool["x2y"], gen_y, x, k1)
            pool_y2x, pooled_x, _ = pool_apply(state.pool["y2x"], gen_x, y, k2)

            def disc_loss_fn(dp):
                loss_x2y = least_squares_discriminator_loss(
                    d_apply({"params": dp["disc_x2y"]}, y, x),
                    d_apply({"params": dp["disc_x2y"]}, pooled_y, x))
                loss_y2x = least_squares_discriminator_loss(
                    d_apply({"params": dp["disc_y2x"]}, x, y),
                    d_apply({"params": dp["disc_y2x"]}, pooled_x, y))
                reg = l2_regularization(dp, self.disc_reg_scale, exclude=("fc3",))
                return loss_x2y + loss_y2x + reg

            d_loss, d_grads = jax.value_and_grad(disc_loss_fn)(disc_params)
            new_discs, new_disc_opt = apply_update(self.disc_tx, d_grads,
                                                   state.opt_states["discriminators"],
                                                   disc_params)

            new_state = GANState(
                step=state.step + 1,
                params={**new_gens, **new_discs},
                opt_states={"generators": new_gen_opt, "discriminators": new_disc_opt},
                pool={"x2y": pool_x2y, "y2x": pool_y2x})
            return new_state, {"generator_loss": g_loss, "discriminator_loss": d_loss}

        return step

    def translate(self, params, x: jax.Array, is_shadow: bool) -> jax.Array:
        gen = params["gen_x2y"] if is_shadow else params["gen_y2x"]
        return translate_patch(lambda v: self.generator.apply({"params": gen}, v), x)
