"""DCLGAN and DCL-CycleGAN shadow trainers.

DCLGAN (reference `gan/wrappers/dcl_gan_wrapper.py`): two CUT units — x2y
(G1: x->y) and y2x (G2: y->x) — trained sequentially each global step
(6 sub-updates: G1, D1, featD1, G2, D2, featD2;
`get_sequential_train_hooks_dclgan`, `:213-229`).

Preserved quirk: the reference's cross-coupling of the two generator losses
is written with discarded ``namedtuple._replace`` results
(`dcl_gan_wrapper.py:189-190`), so the intended coupling never takes effect
and the two CUT units are effectively independent — reproduced here by NOT
coupling them.

DCL-CycleGAN (reference `gan/wrappers/dcl_cycle_gan_wrapper.py`): builds the
cycle reconstructions and computes the weighted cycle-consistency loss, but
the same discarded-``_replace`` quirk (`:149-150`) means the cycle term never
reaches the optimized losses either — the effective training is identical to
DCLGAN.  We preserve that effective behavior and expose the intended
behavior behind ``apply_cycle_loss_fix`` (default False) for users who want
the coupling the reference meant to implement.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from hypelcnn_tpu.gan.losses import cycle_consistency_loss
from hypelcnn_tpu.gan.models import (
    ShadowDiscriminator,
    ShadowFeatureDiscriminator,
    ShadowGenerator,
)
from hypelcnn_tpu.gan.wrappers.base import GANState, GANTrainerBase, gan_adam, translate_patch
from hypelcnn_tpu.gan.wrappers.cut import init_cut_params, make_cut_substeps


class DCLGANTrainer(GANTrainerBase):
    name = "dcl_gan"

    def __init__(self, band_count: int, config: Dict[str, Any], max_steps: int):
        super().__init__(band_count, config, max_steps)
        self.generator = ShadowGenerator(
            band_size=band_count,
            impl="toeplitz" if config.get("fused_generator") else "conv")
        self.discriminator = ShadowDiscriminator(band_size=band_count)
        self.feat_discriminator = ShadowFeatureDiscriminator(
            band_size=band_count,
            patch_count=config.get("patches", 6),
            embedded_feature_size=config.get("embedded_feat_size", 2))
        lrs = {"gen": config.get("generator_lr", 2e-4),
               "disc": config.get("discriminator_lr", 1e-4),
               "featd": config.get("gen_discriminator_lr", 1e-4)}
        # The reference shares ONE AdamOptimizer instance per role between
        # the x2y and y2x train ops (`dcl_gan_wrapper.py:287-289`): slots are
        # per-variable, but the instance's beta-power accumulators advance
        # on EVERY apply_gradients, so x2y updates see bias-correction
        # t = 2k+1 and y2x sees t = 2k+2 (see gan_adam's docstring).
        self.txs = {k: gan_adam(lr, max_steps, t_stride=2, t_phase=1)
                    for k, lr in lrs.items()}
        self._txs_y2x = {k: gan_adam(lr, max_steps, t_stride=2, t_phase=2)
                         for k, lr in lrs.items()}
        self._substep = make_cut_substeps(self.generator, self.discriminator,
                                          self.feat_discriminator, config, self.txs)
        self._substep_y2x = make_cut_substeps(
            self.generator, self.discriminator, self.feat_discriminator,
            config, self._txs_y2x)

    def init_state(self, key: jax.Array) -> GANState:
        k1, k2 = jax.random.split(key)
        params = {"x2y": init_cut_params(self.generator, self.discriminator,
                                         self.feat_discriminator, self.band_count, k1),
                  "y2x": init_cut_params(self.generator, self.discriminator,
                                         self.feat_discriminator, self.band_count, k2)}
        opt_states = {
            unit: {k: self.txs[k].init(params[unit][k]) for k in ("gen", "disc", "featd")}
            for unit in ("x2y", "y2x")}
        return GANState(step=jnp.zeros((), jnp.int32), params=params,
                        opt_states=opt_states, pool=None)

    def build_train_step(self):
        def step(state: GANState, x, y, key):
            del key
            p_x2y, o_x2y, m_x2y = self._substep(state.params["x2y"],
                                                state.opt_states["x2y"], x, y)
            p_y2x, o_y2x, m_y2x = self._substep_y2x(state.params["y2x"],
                                                    state.opt_states["y2x"], y, x)
            metrics = {f"x2y_{k}": v for k, v in m_x2y.items()}
            metrics.update({f"y2x_{k}": v for k, v in m_y2x.items()})
            # every trainer exposes unprefixed losses (the training loop's
            # scan output and the parity harness key on them); for DCL each
            # is the sum over the two independent units, matching the
            # reference's per-direction tensors summed at their own
            # sequential-hook evaluation points
            for k in ("generator_loss", "discriminator_loss",
                      "gen_discriminator_loss"):
                metrics[k] = m_x2y[k] + m_y2x[k]
            return GANState(step=state.step + 1,
                            params={"x2y": p_x2y, "y2x": p_y2x},
                            opt_states={"x2y": o_x2y, "y2x": o_y2x},
                            pool=None), metrics
        return step

    def translate(self, params, x: jax.Array, is_shadow: bool) -> jax.Array:
        gen = params["x2y"]["gen"] if is_shadow else params["y2x"]["gen"]
        return translate_patch(
            lambda v: self.generator.apply({"params": gen}, v), x)


class DCLCycleGANTrainer(DCLGANTrainer):
    name = "dcl_cycle_gan"

    def __init__(self, band_count: int, config: Dict[str, Any], max_steps: int):
        super().__init__(band_count, config, max_steps)
        self.apply_cycle_loss_fix = config.get("apply_cycle_loss_fix", False)
        self.cycle_weight = config.get("cycle_consistency_loss_weight", 10.0)

    def init_state(self, key: jax.Array) -> GANState:
        # NOTE on resume: GAN training checkpoints the FULL GANState
        # (`apps/gan_train_for_shadow.py` save_checkpoint) with a template
        # from this init_state, so fix-enabled runs round-trip their
        # "cycle_gen" slots.  The one unsupported transition is toggling
        # ``apply_cycle_loss_fix`` across a resume (the saved opt_states
        # tree no longer matches the template) — start a fresh log dir.
        state = super().init_state(key)
        if self.apply_cycle_loss_fix:
            # the extra cycle update gets its OWN optimizer state: reusing
            # the unit's gen state would advance the LR schedule count twice
            # per global step, finishing the decay at half the horizon (and
            # cross-contaminate Adam moments between the two losses)
            for unit in ("x2y", "y2x"):
                state.opt_states[unit]["cycle_gen"] = self.txs["gen"].init(
                    state.params[unit]["gen"])
        return state

    def build_train_step(self):
        if not self.apply_cycle_loss_fix:
            # effective reference behavior: cycle term computed-but-discarded
            return super().build_train_step()

        g_apply = self.generator.apply
        base_step = super().build_train_step()
        cycle_w = self.cycle_weight
        txs = self.txs

        def step(state: GANState, x, y, key):
            # "fixed" variant: one extra joint generator step on the cycle
            # loss, using the dedicated cycle optimizer state (see init_state)
            def cycle_loss_fn(gens):
                gen_y = g_apply({"params": gens["x2y"]}, x)
                gen_x = g_apply({"params": gens["y2x"]}, y)
                rec_x = g_apply({"params": gens["y2x"]}, gen_y)
                rec_y = g_apply({"params": gens["x2y"]}, gen_x)
                return cycle_w * cycle_consistency_loss(x, rec_x, y, rec_y)

            # the base step rebuilds opt_states from its substeps (gen/disc/
            # featd only) — carry the cycle states across it explicitly
            cycle_opts = {u: state.opt_states[u]["cycle_gen"]
                          for u in ("x2y", "y2x")}
            state, metrics = base_step(state, x, y, key)
            gens = {"x2y": state.params["x2y"]["gen"], "y2x": state.params["y2x"]["gen"]}
            c_loss, grads = jax.value_and_grad(cycle_loss_fn)(gens)
            for unit in ("x2y", "y2x"):
                import optax
                updates, new_opt = txs["gen"].update(
                    grads[unit], cycle_opts[unit], state.params[unit]["gen"])
                state.params[unit]["gen"] = optax.apply_updates(
                    state.params[unit]["gen"], updates)
                state.opt_states[unit]["cycle_gen"] = new_opt
            metrics["cycle_loss"] = c_loss
            return state, metrics

        return step
