"""CUT (Contrastive Unpaired Translation) shadow trainer.

Parity with reference `gan/wrappers/cut_wrapper.py`:

- model passes (`cut_model`, `:256-356`): G(x); D(G(x)), D(y); encoder+
  feature-discriminator embeddings of G(x), x, y, and G(y) (the identity
  pass);
- losses (`cut_loss` + CUTWrapper.define_loss, `:90-208,626-636`):
  least-squares adversarial; generator loss adds
  nce_loss_weight * NCE(emb(G(x)), emb(x)) +
  identity_weight * NCE(emb(G(y)), emb(y)); the feature-discriminator
  trains on NCE(emb(G(x)), emb(x)) + its own l2 regularization;
- three Adam(beta1=0.5) optimizers with the constant-then-linear-decay LR,
  run SEQUENTIALLY each global step: G, then D, then featD — each seeing
  the previous update's parameters (`get_sequential_train_hooks_cut`,
  `:67-87`, CUTTrainSteps(1,1,1) `:665`).

The ``cut_forward``/``cut_losses``/``make_cut_substeps`` helpers are shared
with the DCLGAN / DCL-CycleGAN trainers, which run two CUT units.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from hypelcnn_tpu.gan.losses import (
    l2_regularization,
    least_squares_discriminator_loss,
    least_squares_generator_loss,
    nce_loss,
)
from hypelcnn_tpu.gan.models import (
    ShadowDiscriminator,
    ShadowFeatureDiscriminator,
    ShadowGenerator,
)
from hypelcnn_tpu.gan.wrappers.base import (
    GANState,
    GANTrainerBase,
    apply_update,
    gan_adam,
    translate_patch,
)


def make_cut_substeps(generator, discriminator, feat_discriminator, config, txs):
    """Build the three sequential CUT sub-updates over a params dict with
    keys ``gen`` / ``disc`` / ``featd``."""
    nce_w = config.get("nce_loss_weight", 10.0)
    id_w = config.get("identity_loss_weight", 0.5) if config.get("use_identity_loss", True) else 0.0
    tau = config.get("tau", 0.07)
    featd_reg_scale = config.get("gen_disc_reg_scale", 1e-4)
    disc_reg_scale = config.get("discriminator_reg_scale", 1e-5)
    g_apply, d_apply, f_apply = generator.apply, discriminator.apply, feat_discriminator.apply

    def embeddings(gen_params, featd_params, data):
        feats = g_apply({"params": gen_params}, data, encoder_only=True)
        return f_apply({"params": featd_params}, feats)

    def nce_terms(gen_params, featd_params, x, y, gen_data):
        emb_gen = embeddings(gen_params, featd_params, gen_data)
        emb_x = embeddings(gen_params, featd_params, x)
        gen_dis_loss = nce_loss(emb_gen, emb_x, tau)
        identity_dis_loss = 0.0
        if id_w:
            id_y = g_apply({"params": gen_params}, y)
            emb_id_y = embeddings(gen_params, featd_params, id_y)
            emb_y = embeddings(gen_params, featd_params, y)
            identity_dis_loss = nce_loss(emb_id_y, emb_y, tau)
        return gen_dis_loss, identity_dis_loss

    def update(params, opt_states, x, y):
        """One sequential G -> D -> featD pass; returns new (params, opt_states, metrics)."""
        # --- generator ---
        def gen_loss_fn(gp):
            gen_data = g_apply({"params": gp}, x)
            adv = least_squares_generator_loss(
                d_apply({"params": params["disc"]}, gen_data, x))
            gen_dis_loss, identity_dis_loss = nce_terms(gp, params["featd"], x, y, gen_data)
            return adv + nce_w * gen_dis_loss + id_w * identity_dis_loss

        g_loss, g_grads = jax.value_and_grad(gen_loss_fn)(params["gen"])
        new_gen, gen_opt = apply_update(txs["gen"], g_grads, opt_states["gen"], params["gen"])

        # --- discriminator (sees updated generator) ---
        gen_data = g_apply({"params": new_gen}, x)

        def disc_loss_fn(dp):
            d_gen = d_apply({"params": dp}, gen_data, x)
            d_real = d_apply({"params": dp}, y, x)
            return (least_squares_discriminator_loss(d_real, d_gen)
                    + l2_regularization(dp, disc_reg_scale, exclude=("fc3",)))

        d_loss, d_grads = jax.value_and_grad(disc_loss_fn)(params["disc"])
        new_disc, disc_opt = apply_update(txs["disc"], d_grads, opt_states["disc"], params["disc"])

        # --- feature discriminator (sees updated generator) ---
        def featd_loss_fn(fp):
            gen_dis_loss, _ = nce_terms(new_gen, fp, x, y, gen_data)
            return gen_dis_loss + l2_regularization(fp, featd_reg_scale)

        f_loss, f_grads = jax.value_and_grad(featd_loss_fn)(params["featd"])
        new_featd, featd_opt = apply_update(txs["featd"], f_grads, opt_states["featd"],
                                            params["featd"])

        new_params = {"gen": new_gen, "disc": new_disc, "featd": new_featd}
        new_opt = {"gen": gen_opt, "disc": disc_opt, "featd": featd_opt}
        metrics = {"generator_loss": g_loss, "discriminator_loss": d_loss,
                   "gen_discriminator_loss": f_loss}
        return new_params, new_opt, metrics

    return update


def init_cut_params(generator, discriminator, feat_discriminator, band_count, key):
    keys = jax.random.split(key, 3)
    dummy = jnp.zeros((2, 1, 1, band_count), dtype=jnp.float32)
    gen_params = generator.init(keys[0], dummy)["params"]
    disc_params = discriminator.init(keys[1], dummy, dummy)["params"]
    enc = generator.apply({"params": gen_params}, dummy, encoder_only=True)
    featd_params = feat_discriminator.init(keys[2], enc)["params"]
    return {"gen": gen_params, "disc": disc_params, "featd": featd_params}


class CUTTrainer(GANTrainerBase):
    name = "cut"

    def __init__(self, band_count: int, config: Dict[str, Any], max_steps: int,
                 swap_inputs: bool):
        super().__init__(band_count, config, max_steps)
        self.swap_inputs = swap_inputs
        self.generator = ShadowGenerator(
            band_size=band_count,
            impl="toeplitz" if config.get("fused_generator") else "conv")
        self.discriminator = ShadowDiscriminator(band_size=band_count)
        self.feat_discriminator = ShadowFeatureDiscriminator(
            band_size=band_count,
            patch_count=config.get("patches", 6),
            embedded_feature_size=config.get("embedded_feat_size", 2))
        self.txs = {"gen": gan_adam(config.get("generator_lr", 2e-4), max_steps),
                    "disc": gan_adam(config.get("discriminator_lr", 1e-4), max_steps),
                    "featd": gan_adam(config.get("gen_discriminator_lr", 1e-4), max_steps)}
        self._substep = make_cut_substeps(self.generator, self.discriminator,
                                          self.feat_discriminator, config, self.txs)

    def init_state(self, key: jax.Array) -> GANState:
        params = init_cut_params(self.generator, self.discriminator,
                                 self.feat_discriminator, self.band_count, key)
        opt_states = {k: self.txs[k].init(params[k]) for k in ("gen", "disc", "featd")}
        return GANState(step=jnp.zeros((), jnp.int32), params=params,
                        opt_states=opt_states, pool=None)

    def build_train_step(self):
        def step(state: GANState, x, y, key):
            del key
            gen_inputs, real_data = (y, x) if self.swap_inputs else (x, y)
            new_params, new_opt, metrics = self._substep(
                state.params, state.opt_states, gen_inputs, real_data)
            return GANState(step=state.step + 1, params=new_params,
                            opt_states=new_opt, pool=None), metrics
        return step

    def translate(self, params, x: jax.Array, is_shadow: bool) -> jax.Array:
        return translate_patch(
            lambda v: self.generator.apply({"params": params["gen"]}, v), x)
