"""Shared GAN training infrastructure.

Replaces the reference's tfgan scaffolding (namedtuple models, scope-reuse
crutches, RunTrainOpsHooks — `gan/wrappers/cut_wrapper.py:48-87,467-584`)
with explicit param pytrees and ONE jitted train step per family that runs
the sub-network updates sequentially, exactly like the reference's
sequential hooks (G, then D, then featD — each seeing the previous update's
new parameters).

LR schedule: constant for the first half of training, then linear decay to
zero (reference ``_get_lr``, `gan/wrappers/gan_common.py:222-244`).
Optimizers: Adam(beta1=0.5) (`:264-265`).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax


def gan_lr_schedule(base_lr: float, max_steps: int) -> Callable:
    """Constant-then-linear-decay (reference `gan/wrappers/gan_common.py:222-244`)."""
    half = max_steps // 2
    decay_steps = max(max_steps - half, 1)

    def schedule(count):
        frac = jnp.clip((count - half) / decay_steps, 0.0, 1.0)
        return jnp.where(count < half, base_lr, base_lr * (1.0 - frac))
    return schedule


def gan_adam(base_lr: float, max_steps: int, b1: float = 0.5, b2: float = 0.999,
             eps: float = 1e-8, t_stride: int = 1,
             t_phase: int = 1) -> optax.GradientTransformation:
    """Adam with TF's exact update formulation:

    ``p -= lr * sqrt(1 - b2^t) / (1 - b1^t) * m_t / (sqrt(v_t) + eps)``

    i.e. eps is added to the UNcorrected ``sqrt(v_t)`` and the bias
    correction is folded into the step size — ``tf.train.AdamOptimizer``'s
    documented algorithm, which the reference's GAN train ops use
    (`gan/wrappers/gan_common.py:264-265`).  optax.adam applies eps to the
    bias-corrected ``sqrt(v_hat)`` instead; the difference is O(eps) per
    step but visibly shifts early-step trajectories from a zero-init
    generator (measured in the two-sided GAN parity experiment,
    scripts/gan_episode_parity.py), so the TF placement is authoritative
    here.

    ``t_stride``/``t_phase`` set the bias-correction exponent to
    ``t = t_stride*k + t_phase`` at the k-th update (k = 0, 1, ...), while
    the LR-decay schedule still sees k.  The DCL families need this:
    the reference shares ONE ``AdamOptimizer`` instance between the x2y and
    y2x train ops (`dcl_gan_wrapper.py:287-289`), so the instance's
    beta1/beta2 power accumulators advance TWICE per iteration and the x2y
    updates run with t = 2k+1 while y2x runs with t = 2k+2 (a ~6% smaller
    first step for y2x).  Measured: with stride 1 the matched-init DCL
    trajectory diverges in the y2x components from the very first update
    while every x2y component stays exact."""
    schedule = gan_lr_schedule(base_lr, max_steps)

    def init(params):
        return optax.ScaleByAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree_util.tree_map(jnp.zeros_like, params),
            nu=jax.tree_util.tree_map(jnp.zeros_like, params))

    def update(grads, state, params=None):
        del params
        mu = jax.tree_util.tree_map(lambda m, g: b1 * m + (1 - b1) * g,
                                    state.mu, grads)
        nu = jax.tree_util.tree_map(lambda v, g: b2 * v + (1 - b2) * g * g,
                                    state.nu, grads)
        count = state.count + 1
        c = (t_stride * state.count + t_phase).astype(jnp.float32)
        lr_t = (schedule(state.count)
                * jnp.sqrt(1.0 - b2 ** c) / (1.0 - b1 ** c))
        updates = jax.tree_util.tree_map(
            lambda m, v: -lr_t * m / (jnp.sqrt(v) + eps), mu, nu)
        return updates, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


@flax.struct.dataclass
class PoolState:
    """Element-granular history pool of generated samples for discriminator
    training (tfgan ``tensor_pool`` role, used by the vanilla and CycleGAN
    wrappers, `gan/wrappers/gan_wrapper.py:56` /
    `cycle_gan_wrapper.py:98,106`)."""
    buffer: jax.Array        # [pool_size, ...]
    inputs_buffer: jax.Array
    count: jax.Array         # filled slots

    @classmethod
    def create(cls, pool_size: int, element_shape, dtype=jnp.float32) -> "PoolState":
        return cls(buffer=jnp.zeros((pool_size, *element_shape), dtype=dtype),
                   inputs_buffer=jnp.zeros((pool_size, *element_shape), dtype=dtype),
                   count=jnp.zeros((), dtype=jnp.int32))


def pool_apply(pool: PoolState, gen_data: jax.Array, gen_inputs: jax.Array,
               key: jax.Array):
    """tfgan tensor_pool semantics, vectorized: while filling, pass through
    and store; once full, each element is swapped with a random pool entry
    with probability 0.5.

    DELIBERATE DEVIATION from the reference's sequential per-image pool
    (tfgan ``tensor_pool``): slots are drawn WITHOUT replacement for
    b <= pool_size, so two batch elements can never hit the same slot.
    Sequential semantics allow collisions (later writes win and a generated
    sample is silently dropped by the duplicate-index scatter); the
    distinct-slot draw keeps every sample while only slightly changing
    pool-history dynamics.  Documented like the other preserved-quirk sites
    so parity audits treat it as intentional."""
    p = pool.buffer.shape[0]
    b = gen_data.shape[0]
    k1, k2 = jax.random.split(key)
    if b <= p:
        # distinct slots: with replacement, colliding elements would read the
        # same pool entry and one generated sample would be silently dropped
        # by the duplicate-index scatter (order unspecified)
        slots = jax.random.choice(k1, p, (b,), replace=False)
    else:  # degenerate batch > pool: collisions unavoidable
        slots = jax.random.randint(k1, (b,), 0, p)
    swap = jax.random.bernoulli(k2, 0.5, (b,)) & (pool.count >= p)
    bshape = (b,) + (1,) * (gen_data.ndim - 1)
    swap_b = swap.reshape(bshape)

    out_data = jnp.where(swap_b, pool.buffer[slots], gen_data)
    out_inputs = jnp.where(swap_b, pool.inputs_buffer[slots], gen_inputs)
    new_buffer = pool.buffer.at[slots].set(
        jnp.where(swap_b, gen_data, pool.buffer[slots]))
    new_inputs = pool.inputs_buffer.at[slots].set(
        jnp.where(swap_b, gen_inputs, pool.inputs_buffer[slots]))

    # fill phase: append into slots count..count+b-1 (mod pool size)
    fill_pos = (pool.count + jnp.arange(b)) % p
    fill_mask = ((pool.count + jnp.arange(b)) < p).reshape(bshape)
    new_buffer = new_buffer.at[fill_pos].set(
        jnp.where(fill_mask, gen_data, new_buffer[fill_pos]))
    new_inputs = new_inputs.at[fill_pos].set(
        jnp.where(fill_mask, gen_inputs, new_inputs[fill_pos]))

    new_pool = PoolState(buffer=new_buffer, inputs_buffer=new_inputs,
                         count=jnp.minimum(pool.count + b, p))
    return new_pool, out_data, out_inputs


@flax.struct.dataclass
class GANState:
    step: jax.Array
    params: Dict[str, Any]
    opt_states: Dict[str, Any]
    pool: Optional[Any] = None


def apply_update(tx: optax.GradientTransformation, grads, opt_state, params):
    updates, new_opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), new_opt_state


class GANTrainerBase:
    """Common surface: ``init_state``, jitted ``train_step``, ``translate``.

    ``translate(params, x, is_shadow)`` maps a ``[B, 1, 1, bands]`` (or
    ``[B, k, k, bands]``) batch through the trained generator — the rebuild
    of the reference's per-cell inference graph
    (`gan/wrappers/gan_common.py:282-304`): the generator operates per-pixel,
    so a k x k patch is just batched over its cells.
    """

    name: str = "gan"

    def __init__(self, band_count: int, config: Dict[str, Any], max_steps: int):
        self.band_count = band_count
        self.config = dict(config)
        self.max_steps = max_steps
        self.mesh = None
        self._train_step = None

    def use_mesh(self, mesh) -> "GANTrainerBase":
        """Enable data-parallel training over a device mesh: the x/y sample
        batches shard over the ``data`` axis, params/opt-state/pool stay
        replicated, and XLA inserts the gradient all-reduce — the same
        GSPMD layout as the classification trainer (`parallel/mesh.py`).
        The reference's second training runtime (`gan/gan_train_for_shadow.py:80-144`)
        is single-device; this is its scaling story."""
        self.mesh = mesh
        self._train_step = None
        return self

    # subclasses implement
    def init_state(self, key: jax.Array) -> GANState:
        raise NotImplementedError

    def build_train_step(self):
        raise NotImplementedError

    def translate(self, params, x: jax.Array, is_shadow: bool) -> jax.Array:
        raise NotImplementedError

    def translate_scene(self, params, pixels, is_shadow: bool,
                        block: int = 65536):
        """Translate a whole ``[H, W, bands]`` scene in ONE jitted dispatch.

        The reference's image translation feeds one 1x1x1xbands pixel per
        ``sess.run`` — hours at GRSS2013 scale
        (`gan/gan_infer_image_for_shadow.py:62-104`).  Here the pixels fold
        into ``[n_blocks, block, 1, 1, bands]`` and a ``lax.map`` over
        blocks runs the generator on-device; through the tunneled chip the
        per-dispatch overhead (0.25-5 s, CLAUDE.md) is then paid once per
        scene instead of once per block (or per pixel).
        """
        import math as _math

        import numpy as _np

        h, w, c = pixels.shape
        total = h * w
        n_blocks = _math.ceil(total / block)
        cache = getattr(self, "_scene_jits", None)
        if cache is None:
            cache = self._scene_jits = {}
        fn = cache.get((block, c, is_shadow))
        if fn is None:
            def run(p, blocks):
                return jax.lax.map(
                    lambda b: self.translate(p, b, is_shadow), blocks)
            fn = cache[(block, c, is_shadow)] = jax.jit(run)
        flat = _np.asarray(pixels, dtype=_np.float32).reshape(total, c)
        pad = n_blocks * block - total
        if pad:
            flat = _np.pad(flat, ((0, pad), (0, 0)))
        out = fn(params, jnp.asarray(flat.reshape(n_blocks, block, 1, 1, c)))
        return _np.asarray(out).reshape(-1, c)[:total].reshape(h, w, c)

    def train_step(self, state: GANState, x: jax.Array, y: jax.Array, key: jax.Array):
        if self._train_step is None:
            fn = self.build_train_step()
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                from hypelcnn_tpu.parallel.mesh import DATA_AXIS

                repl = NamedSharding(self.mesh, P())
                data = NamedSharding(self.mesh, P(DATA_AXIS))
                self._train_step = jax.jit(
                    fn, donate_argnums=(0,),
                    in_shardings=(repl, data, data, repl),
                    out_shardings=(repl, repl))
            else:
                self._train_step = jax.jit(fn, donate_argnums=(0,))
        return self._train_step(state, x, y, key)


def translate_patch(generator_apply, x: jax.Array) -> jax.Array:
    """Apply a per-pixel spectral generator to every cell of [B, k, k, bands]
    by folding the spatial cells into the batch (replaces the reference's
    Python double loop, `gan/wrappers/gan_common.py:282-304`)."""
    b, h, w, c = x.shape
    flat = x.reshape(b * h * w, 1, 1, c)
    out = generator_apply(flat)
    return out.reshape(b, h, w, c)
