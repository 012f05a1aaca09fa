"""The classification training runtime.

Replaces the reference's TF1 session machinery — ``create_graph`` /
``optimize_nn`` (`common/common_nn_ops.py:208-240,330-373`) and
``run_monitored_session`` with its hook zoo
(`classify/monitored_session_runner.py:124-188`) — with two jitted step
functions over explicit pytrees:

- ``train_step``: on-device gather of the batch's neighborhood windows from
  the HBM-resident scene, jitted augmentation, forward+backward, optimizer
  update.  One XLA program; the host only feeds a step index.
- ``eval_step``: forward + confusion-matrix scatter-add accumulation.

Hook equivalents: periodic test evaluation every 100 steps (reference
``TestHook`` `classify/monitored_session_runner.py:89-121`), validation on a
cadence (``ValidationHook`` `:48-86`), checkpoints on a cadence, a NaN
tripwire that logs without killing (``NanTensorHook(fail_on_nan_loss=False)``
`:151`).

Scaling: the step is compiled against a ``Mesh``; the batch is sharded over
the ``data`` axis and params are replicated, so XLA inserts the gradient
all-reduce over ICI.  Single chip is the same code with a 1x1 mesh.
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from hypelcnn_tpu.core.rng import RngPool
from hypelcnn_tpu.data.augmentation import AugmentationInfo, augment_batch
from hypelcnn_tpu.data.loaders.base import SampleSet
from hypelcnn_tpu.models.base import NNModel
from hypelcnn_tpu.parallel.mesh import DATA_AXIS, create_mesh, pad_to_multiple
from hypelcnn_tpu.train.metrics import MetricsResult, compute_metrics, confusion_update
from hypelcnn_tpu.train.optimizer import build_optimizer
from hypelcnn_tpu.train.state import TrainState


@dataclass
class TrainingResult:
    """Mirror of the reference's TrainingResult (`common/common_nn_ops.py:139-143`)."""
    validation_accuracy: float
    test_accuracy: float
    loss: float
    validation_metrics: Optional[MetricsResult] = None
    test_metrics: Optional[MetricsResult] = None
    history: list = field(default_factory=list)


def make_epoch_index_stream(num_samples: int, batch_size: int, num_steps: int,
                            rng: np.random.Generator) -> np.ndarray:
    """Precompute per-epoch shuffled sample indices for every training step.

    Epoch semantics of the reference's shuffle_and_repeat pipeline
    (`common/common_nn_ops.py:188-201`) without any host work in the loop:
    a [num_steps, batch] int32 table, one device transfer at startup.
    """
    needed = num_steps * batch_size
    epochs = math.ceil(needed / num_samples)
    perms = np.concatenate([rng.permutation(num_samples) for _ in range(epochs)])
    return perms[:needed].astype(np.int32).reshape(num_steps, batch_size)


class ClassificationTrainer:
    def __init__(self, model: NNModel, class_count: int, algorithm_params: Dict[str, Any],
                 scene, sample_set: SampleSet,
                 augmentation_info: Optional[AugmentationInfo] = None,
                 mesh=None, seed: int = 1234,
                 log_dir: Optional[str] = None,
                 save_checkpoint_steps: Optional[int] = None,
                 test_cadence: int = 100,
                 validation_cadence: Optional[int] = None,
                 sources: Optional[Dict[str, Any]] = None,
                 data_shape: Optional[list] = None,
                 log_model_params: bool = False):
        from hypelcnn_tpu.data.importers import ScenePatchSource
        self.model = model
        self.class_count = class_count
        self.algorithm_params = algorithm_params
        self.scene = scene
        if sources is None:
            src = ScenePatchSource(scene)
            sources = {"training": src, "test": src, "validation": src}
        self.sources = sources
        self._data_shape = data_shape
        self.sample_set = sample_set
        self.augmentation_info = augmentation_info or AugmentationInfo()
        self.mesh = mesh or create_mesh()
        self.rng_pool = RngPool(seed)
        self.log_dir = log_dir
        self.save_checkpoint_steps = save_checkpoint_steps
        self.test_cadence = test_cadence
        self.validation_cadence = validation_cadence
        self.log_model_params = log_model_params

        self.module = model.create_module(class_count, algorithm_params)
        self.tx, self.schedule = build_optimizer(algorithm_params)

        self._train_step = None
        self._eval_step = None
        self._eval_tables: Dict = {}
        self.history: list = []

    # ---- setup ----

    def init_state(self) -> TrainState:
        shape = self.scene.get_data_shape() if self.scene is not None else self._data_shape
        dummy = jnp.zeros((2, *shape), dtype=jnp.float32)
        dummy_labels = jnp.zeros((2, self.class_count), dtype=jnp.float32)
        # jit the whole init: eager init dispatches hundreds of tiny ops
        init_fn = jax.jit(lambda rngs: self.module.init(
            rngs, dummy, labels=dummy_labels, train=True))
        variables = init_fn(
            {"params": self.rng_pool.key("init"), "dropout": self.rng_pool.key("init-dropout")})
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        from hypelcnn_tpu.parallel.mesh import MODEL_AXIS, shard_params_for_tp
        if self.mesh.shape.get(MODEL_AXIS, 1) > 1:
            # tensor parallelism: wide kernels column-sharded over the model
            # axis; optimizer state inherits the placement from tx.init
            params = shard_params_for_tp(params, self.mesh)
        else:
            params = jax.device_put(params, NamedSharding(self.mesh, P()))
        # batch_stats ride the mesh replicated so the whole state shares one
        # device set (jit rejects mixed single-device/mesh arguments)
        batch_stats = jax.device_put(batch_stats, NamedSharding(self.mesh, P()))
        return TrainState.create(params, batch_stats, self.tx)

    # ---- jitted steps ----

    def _build_train_chunk(self):
        """A jitted multi-step training chunk.

        One host dispatch runs ``chunk`` optimizer steps via ``lax.scan`` —
        the whole hot loop (index lookup, window gather, augmentation,
        forward/backward, update) lives on-device.  This is the TPU-native
        replacement for the reference's per-step ``sess.run`` loop
        (`classify/monitored_session_runner.py:182-184`).

        The target tables and rng base key ride the scan carry as program
        ARGUMENTS (the ``tables`` tuple) — a closure would bake them into
        the compiled HLO as constants (megabytes at GRSS2018 full-GT scale,
        re-shipped through the remote-compile tunnel, and silently stale on
        a second ``fit`` with a changed sample set).  Same rule as the scene
        ``arrays``.
        """
        module, model, tx = self.module, self.model, self.tx
        aug_info = self.augmentation_info
        class_count = self.class_count
        source = self.sources["training"]
        use_remat = bool(self.algorithm_params.get("remat", False))

        def one_step(carry, inp):
            state, arrays, coords_table, labels_table, key_base = carry
            idx, step_no = inp
            coords = jnp.take(coords_table, idx, axis=0)
            label_ids = jnp.take(labels_table, idx, axis=0)
            key = jax.random.fold_in(key_base, step_no)
            gather_key, aug_key, drop_key = jax.random.split(key, 3)
            patches = source.gather(arrays, idx, coords, key=gather_key)
            patches = augment_batch(patches, aug_key, aug_info)
            labels = jax.nn.one_hot(label_ids, class_count, dtype=jnp.float32)

            def loss_fn(params):
                variables = {"params": params}
                if state.batch_stats:
                    variables["batch_stats"] = state.batch_stats
                out, updates = module.apply(
                    variables, patches, labels=labels, train=True,
                    rngs={"dropout": drop_key},
                    mutable=["batch_stats"] if state.batch_stats else [])
                loss = jnp.mean(model.loss(out, labels))
                new_stats = updates.get("batch_stats", state.batch_stats) if updates else state.batch_stats
                return loss, new_stats

            if use_remat:
                # rematerialize activations in the backward pass: trades
                # FLOPs for HBM so very large batches avoid activation
                # spills (opt-in via algorithm_params {"remat": true})
                loss_fn = jax.checkpoint(loss_fn)
            (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
            new_params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
            new_state = TrainState(step=state.step + 1, params=new_params,
                                   batch_stats=new_stats, opt_state=new_opt_state)
            return (new_state, arrays, coords_table, labels_table, key_base), loss

        def chunk_fn(state: TrainState, arrays, tables, idx_chunk, step_nos):
            # the scene `arrays` AND the target `tables` ride the carry so
            # they are program ARGUMENTS, not baked-in constants
            coords_table, labels_table, key_base = tables
            carry0 = (state, arrays, coords_table, labels_table, key_base)
            (state, *_), losses = jax.lax.scan(one_step, carry0,
                                               (idx_chunk, step_nos))
            return state, losses

        batch_sh3 = NamedSharding(self.mesh, P(None, DATA_AXIS))
        repl = NamedSharding(self.mesh, P())
        return jax.jit(chunk_fn, donate_argnums=(0,),
                       in_shardings=(None, repl, repl, batch_sh3, repl))

    def _build_eval_drain(self, split: str):
        """One jitted dispatch per evaluation: ``lax.scan`` over eval batches.

        The round-1 evaluator dispatched one jit call per 8192-target batch;
        at tunnel dispatch latencies (0.25-5 s) a big validation set cost
        seconds of pure overhead.  The scan drains every batch on-device and
        returns the finished confusion matrix.
        """
        module = self.module
        source = self.sources[split]
        class_count = self.class_count

        def drain_fn(params, batch_stats, arrays, idx, coords, label_ids, mask, key):
            # idx/coords/label_ids/mask: [num_batches, batch(, 2)]
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            batch_nos = jnp.arange(idx.shape[0], dtype=jnp.uint32)

            def body(confusion, inp):
                idx_b, coords_b, labels_b, mask_b, batch_no = inp
                # member-scene sampling parity: the reference draws a random
                # member per data point during evaluation too (MultiDataSet
                # MIXED mode, `loader/GULFPORTALTDataLoader.py:40-42`); a
                # per-batch folded key keeps our eval deterministic while
                # matching that 1:(S-1) member distribution.  Single-scene
                # sources ignore the key.
                patches = source.gather(arrays, idx_b, coords_b,
                                        key=jax.random.fold_in(key, batch_no))
                out = module.apply(variables, patches, train=False)
                preds = jnp.argmax(out.y_conv, axis=1)
                return confusion_update(confusion, labels_b, preds, mask_b), None

            confusion0 = jnp.zeros((class_count, class_count), dtype=jnp.int32)
            confusion, _ = jax.lax.scan(body, confusion0,
                                        (idx, coords, label_ids, mask, batch_nos))
            return confusion

        # params/batch_stats/arrays keep their own placement (TP params are
        # model-sharded); only the batch tables are pinned to the data axis
        batch_sh = NamedSharding(self.mesh, P(None, DATA_AXIS))
        return jax.jit(drain_fn, in_shardings=(None, None, None, batch_sh,
                                               batch_sh, batch_sh, batch_sh,
                                               None))

    # ---- evaluation drains ----

    def evaluate(self, state: TrainState, split: str = "test",
                 batch_size: int = 8192) -> MetricsResult:
        """Drain a target split through eval batches, accumulate confusion,
        compute OA/AA/kappa (reference ``calculate_accuracy``,
        `common/common_nn_ops.py:295-310`)."""
        if self._eval_step is None:
            self._eval_step = {}
        if split not in self._eval_step:
            self._eval_step[split] = self._build_eval_drain(split)
        targets = {"training": self.sample_set.training_targets,
                   "test": self.sample_set.test_targets,
                   "validation": self.sample_set.validation_targets}[split]
        n = targets.shape[0]
        if n == 0:
            return compute_metrics(np.zeros((self.class_count, self.class_count)))
        # targets are immutable after construction: build the padded device
        # tables ONCE per (split, batch) and reuse — rebuilding re-sent
        # megabytes over the tunneled device link on every eval cadence.
        # The key carries a content fingerprint so a replaced sample_set
        # cannot silently serve stale coords/labels
        tbytes = np.ascontiguousarray(targets).tobytes()
        cache_key = (split, batch_size, targets.shape,
                     hashlib.blake2b(tbytes, digest_size=8).hexdigest())
        if cache_key not in self._eval_tables:
            # one live entry per (split, batch): a replaced sample_set must
            # not leak the previous split's device-resident padded tables
            stale = [k for k in self._eval_tables if k[:2] == (split, batch_size)]
            for k in stale:
                del self._eval_tables[k]
            # batch must divide over the data axis; tiny splits shrink to one batch
            data_size = self.mesh.shape[DATA_AXIS]
            eff_batch = pad_to_multiple(min(batch_size, n), data_size)
            num_batches = math.ceil(n / eff_batch)
            total = num_batches * eff_batch
            # pad by WRAPPING to real samples, not zeros: CAP's
            # always-batch-stats BN quirk (models/cap.py) computes its eval
            # normalization over the whole drain batch, and a tail of zero
            # patches poisons those statistics (measured: -1.8% validation
            # OA at GRSS-episode scale, the round-5 cap_trained gap).  The
            # mask still excludes wrapped rows from the confusion, and
            # per-row-independent models are unaffected either way.
            wrap = (np.arange(total) % n)
            idx = wrap.astype(np.int32).reshape(num_batches, eff_batch)
            coords = np.asarray(targets[:, :2], dtype=np.int32)[wrap].reshape(
                num_batches, eff_batch, 2)
            labels = np.asarray(targets[:, 2], dtype=np.int32)[wrap].reshape(
                num_batches, eff_batch)
            mask = (np.arange(total) < n).astype(np.int32).reshape(
                num_batches, eff_batch)
            self._eval_tables[cache_key] = (jnp.asarray(idx), jnp.asarray(coords),
                                            jnp.asarray(labels), jnp.asarray(mask))
        idx_d, coords_d, labels_d, mask_d = self._eval_tables[cache_key]
        arrays = self.sources[split].device_arrays()
        eval_key = self.rng_pool.key(f"eval-{split}")
        confusion = self._eval_step[split](state.params, state.batch_stats, arrays,
                                           idx_d, coords_d, labels_d, mask_d,
                                           eval_key)
        return compute_metrics(np.asarray(confusion))

    # ---- the training loop ----

    def fit(self, num_steps: int, batch_size: int,
            progress_callback: Optional[Callable[[int, float], None]] = None,
            log_every: int = 100) -> TrainingResult:
        state = self.init_state()
        resume_step = 0
        if self.log_dir and self.save_checkpoint_steps:
            # auto-resume from the latest checkpoint (MonitoredTrainingSession
            # parity, reference classify/monitored_session_runner.py:173-180)
            restored = self.restore_checkpoint(template=state)
            if restored is not None and int(restored.step) > 0:
                # restore INTO the freshly-initialized state's layout: params
                # carry the TP column-sharding from shard_params_for_tp and
                # opt_state inherits it via tx.init, so a TP run resumes
                # directly into the sharded placement (no replicated detour).
                # Leaves the template never placed on the mesh (the step
                # scalar, optimizer counts) go replicated — device_put commits
                # its result, and committed arrays on mismatched device sets
                # are rejected by jit.
                repl = NamedSharding(self.mesh, P())
                def _restore_put(r, t):
                    sharding = t.sharding
                    if not isinstance(sharding, NamedSharding):
                        sharding = repl
                    return jax.device_put(r, sharding)
                state = jax.tree_util.tree_map(_restore_put, restored, state)
                resume_step = min(int(restored.step), num_steps)
                print(f"Resuming from checkpoint at step {resume_step}")

        train = self.sample_set.training_targets
        index_stream = make_epoch_index_stream(
            train.shape[0], batch_size, num_steps, self.rng_pool.numpy_rng("epoch-shuffle"))
        tables = (jnp.asarray(train[:, :2].astype(np.int32)),
                  jnp.asarray(train[:, 2].astype(np.int32)),
                  self.rng_pool.key("train", 0))
        indices_dev = jnp.asarray(index_stream)
        if self._train_step is None:
            self._train_step = self._build_train_chunk()

        # chunk boundary = smallest active cadence so hooks fire on time
        cadences = [log_every, self.test_cadence]
        if self.validation_cadence:
            cadences.append(self.validation_cadence)
        if self.save_checkpoint_steps:
            cadences.append(self.save_checkpoint_steps)
        chunk = max(1, math.gcd(*cadences)) if len(cadences) > 1 else cadences[0]
        # guard the degenerate gcd (e.g. a prime validation cadence collapses
        # it to 1, which through the tunnel is the 0.25-5 s per-step dispatch
        # overhead the scan chunking exists to avoid).  `crossed` fires hooks
        # on the first chunk boundary AFTER their cadence point, so flooring
        # only makes hooks up to chunk-1 steps late — never skipped.  An
        # explicit small cadence (someone logging every step) is respected
        # via min(active cadences).
        active = [c for c in cadences if c]
        floor = min(active) if active else chunk
        if chunk < min(floor, 50):
            late = min(floor, 50)
            print(f"[chunk-guard] cadences {cadences} share gcd {chunk}; "
                  f"using scan chunk {late} (hooks fire on the next boundary, "
                  f"<= {late - 1} steps late)")
            chunk = late
        chunk = min(chunk, num_steps)
        self._last_chunk = chunk

        def crossed(cadence: int, start: int, end: int) -> bool:
            return cadence and (end // cadence) > (start // cadence)

        # chief-only I/O: on a multi-host run only process 0 writes summaries,
        # CSVs, and history (reference `is_chief = task == 0`,
        # gan/gan_train_for_shadow.py:300); compute still runs on every host.
        # CHECKPOINTS are the exception: orbax's CheckpointManager.save is a
        # global collective (it barriers across all processes), so every
        # process must call it — orbax itself guarantees a single writer.
        from hypelcnn_tpu.parallel.distributed import is_chief
        chief = is_chief()
        writer = None
        if self.log_dir and chief:
            from hypelcnn_tpu.train.summaries import SummaryWriter
            writer = SummaryWriter(self.log_dir)
            writer.text("algorithm_params", json.dumps(
                self.algorithm_params, indent=3, default=str))

        last_loss = float("nan")
        nan_seen = False
        t0 = time.time()
        start = resume_step
        train_arrays = self.sources["training"].device_arrays()
        while start < num_steps:
            n = min(chunk, num_steps - start)
            idx_chunk = jax.lax.slice_in_dim(indices_dev, start, start + n, axis=0)
            step_nos = jnp.arange(start, start + n, dtype=jnp.uint32)
            with jax.profiler.StepTraceAnnotation("train_chunk", step_num=start):
                state, losses = self._train_step(state, train_arrays, tables,
                                                 idx_chunk, step_nos)
            end = start + n

            if crossed(log_every, start, end) or end == num_steps:
                last_loss = float(losses[-1])
                if math.isnan(last_loss) and not nan_seen:
                    nan_seen = True
                    print(f"[nan-guard] loss is NaN at step {end} (continuing, "
                          f"parity with NanTensorHook(fail_on_nan_loss=False))")
                if progress_callback:
                    progress_callback(end, last_loss)
                if writer:
                    writer.scalar("loss", last_loss, end)
                    writer.scalar("learning_rate", self._lr_on_host(end), end)
                    if self.log_model_params:
                        # reference --log_model_params: histogram every model
                        # variable on the summary cadence
                        # (classify/monitored_session_runner.py:26-28)
                        self._log_param_histograms(writer, state, end)

            if crossed(self.test_cadence, start, end) and end != num_steps \
                    and self.sample_set.test_targets.shape[0] > 0:
                test_metrics = self.evaluate(state, "test")
                self.history.append({"step": end, "loss": last_loss,
                                     "test_oa": test_metrics.overall_accuracy})
                if writer:
                    writer.scalar("test_overall_accuracy",
                                  test_metrics.overall_accuracy, end)

            if self.validation_cadence and crossed(self.validation_cadence, start, end) \
                    and self.sample_set.validation_targets.shape[0] > 0:
                val_metrics = self.evaluate(state, "validation")
                self.history.append({"step": end, "val_oa": val_metrics.overall_accuracy,
                                     "val_aa": val_metrics.mean_per_class_accuracy,
                                     "val_kappa": val_metrics.kappa})
                if self.log_dir and chief:
                    os.makedirs(self.log_dir, exist_ok=True)
                    np.savetxt(os.path.join(self.log_dir, f"validation_confusion_{end}.csv"),
                               val_metrics.confusion, fmt="%d", delimiter=",")
                if writer:
                    writer.scalar("validation_overall_accuracy",
                                  val_metrics.overall_accuracy, end)
                    writer.scalar("validation_kappa", val_metrics.kappa, end)

            if self.save_checkpoint_steps and self.log_dir \
                    and crossed(self.save_checkpoint_steps, start, end):
                # ALL processes call save (orbax collective; see note above)
                self.save_checkpoint(state)
            start = end

        if writer:
            writer.close()
        if self.save_checkpoint_steps and self.log_dir:
            self.save_checkpoint(state)  # final save (MonitoredTrainingSession parity)
        if self.log_dir and chief and self.history:
            os.makedirs(self.log_dir, exist_ok=True)
            with open(os.path.join(self.log_dir, "history.jsonl"), "w", encoding="utf-8") as fid:
                for rec in self.history:
                    fid.write(json.dumps(rec) + "\n")

        elapsed = time.time() - t0
        test_metrics = self.evaluate(state, "test") \
            if self.sample_set.test_targets.shape[0] else None
        val_metrics = self.evaluate(state, "validation") \
            if self.sample_set.validation_targets.shape[0] else None

        self.final_state = state
        executed = num_steps - resume_step  # steps actually run this call
        self.steps_per_sec = executed / elapsed if elapsed > 0 else float("inf")
        return TrainingResult(
            validation_accuracy=val_metrics.overall_accuracy if val_metrics else 0.0,
            test_accuracy=test_metrics.overall_accuracy if test_metrics else 0.0,
            loss=last_loss,
            validation_metrics=val_metrics,
            test_metrics=test_metrics,
            history=self.history)

    def _lr_on_host(self, step: int) -> float:
        """Evaluate the LR schedule on the CPU backend: the optax schedule
        builds jnp ops, and on the tunneled TPU a logging-only scalar would
        cost an extra blocking round-trip per log crossing."""
        try:
            cpu = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            return float(self.schedule(step))
        with jax.default_device(cpu):
            return float(self.schedule(step))

    def _log_param_histograms(self, writer, state: TrainState, step: int) -> None:
        """Histogram every model variable (params + BN moving stats) — the
        reference's ``--log_model_params`` path, which histograms each slim
        model variable on the summary cadence
        (`classify/monitored_session_runner.py:26-28`)."""
        def emit(prefix: str, tree) -> None:
            leaves, _ = jax.tree_util.tree_flatten_with_path(tree)
            for path, leaf in leaves:
                name = prefix + "/".join(
                    str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
                writer.histogram(name, np.asarray(leaf), step)
        emit("params/", state.params)
        if state.batch_stats:
            emit("batch_stats/", state.batch_stats)

    # ---- checkpointing (orbax; reference Saver semantics `:164-168`) ----

    def save_checkpoint(self, state: TrainState) -> None:
        from hypelcnn_tpu.train.checkpoint import save_checkpoint
        save_checkpoint(self.log_dir, state)

    def restore_checkpoint(self, template: Optional[TrainState] = None
                           ) -> Optional[TrainState]:
        from hypelcnn_tpu.train.checkpoint import restore_checkpoint
        if template is None:
            template = self.init_state()  # shapes only; reuse fit()'s state when possible
        return restore_checkpoint(self.log_dir, template)
