"""Reference-side cycle_gan training for the two-sided GAN parity experiment.

Runs the reference's OWN wrapper + model code
(`/root/reference/gan/wrappers/cycle_gan_wrapper.py`,
`/root/reference/gan/shadow_data_models.py`) under the tf_slim and
tensorflow_gan shims, on shared pair/validation arrays produced by
scripts/gan_episode_parity.py.  Training regime mirrors the reference
runtime (`gan/gan_train_for_shadow.py:128-144` + tfgan sequential hooks):
one generator sess.run, one discriminator sess.run, one global-step
increment per iteration.

Batch consumption modes:
- ``ref`` (default): the generator run and the discriminator run consume
  SUCCESSIVE batches — with a tf.data iterator each hook's session.run
  advances ``get_next``, so in the real reference G trains on batch 2t and
  D on batch 2t+1.
- ``matched``: both runs are fed the SAME batch (row t), the controlled
  regime used for the step-matched loss-trajectory comparison against the
  rebuild (whose jitted step uses one batch for both sub-updates).

Outputs: a JSON report (per-step losses + per-validation divergence inputs)
and an npz of generated validation arrays; optionally dumps initial variable
values for weight injection into the rebuild.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True, help="npz with normal/shadow/idx/val_lit/val_shadow")
    p.add_argument("--gan_type",
                   choices=("cycle_gan", "gan_x2y", "cut_x2y", "dcl_gan",
                            "dcl_cycle_gan"),
                   default="cycle_gan")
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--validation_steps", type=int, default=200)
    p.add_argument("--run_seed", type=int, default=1234)
    p.add_argument("--batch_mode", choices=("ref", "matched"), default="ref")
    p.add_argument("--trajectory_steps", type=int, default=0,
                   help="record per-step losses for the first N steps")
    p.add_argument("--dump_init", default=None,
                   help="npz path: dump initial variable values")
    p.add_argument("--dump_final", default=None,
                   help="npz path: dump final variable values (per-tensor "
                        "update-divergence diagnostics)")
    p.add_argument("--dump_grads", default=None,
                   help="npz path: dump d(loss)/d(vars) for each sub-loss "
                        "at the initial weights on the first batch "
                        "(gradient-parity diagnostics; cut_x2y only)")
    p.add_argument("--perturb_init", action="store_true",
                   help="replace the generator's all-zero initial weights "
                        "with small N(0, 0.02) values before training/"
                        "dumping.  The CUT families are sign-ILL-CONDITIONED "
                        "at the zero-init saddle: G(x)==0 exactly, so the "
                        "feature-discriminator's first-update direction is "
                        "decided by fp-noise-scale quantities amplified by "
                        "the global l2_normalize's rsqrt(max(.,1e-12)) — "
                        "any two implementations (or hardware) flip signs "
                        "differently.  Matched-trajectory comparisons must "
                        "start off the saddle to be meaningful.")
    p.add_argument("--out", required=True)
    p.add_argument("--dump_generated", default=None,
                   help="npz path: generated validation arrays per cadence")
    p.add_argument("--save_ckpt", default=None,
                   help="save the final variables as a REAL tf.train.Saver "
                        "checkpoint (the reference training format — feeds "
                        "the GAN-augmented classification parity chain)")
    # reference CLI defaults (gan/gan_train_for_shadow.py:28-78)
    p.add_argument("--cycle_weight", type=float, default=10.0)
    p.add_argument("--identity_weight", type=float, default=0.5)
    p.add_argument("--generator_lr", type=float, default=2e-4)
    p.add_argument("--discriminator_lr", type=float, default=1e-4)
    p.add_argument("--disc_reg_scale", type=float, default=1e-5)
    # CUT family (reference gan/gan_train_for_shadow.py:42-64 defaults)
    p.add_argument("--nce_weight", type=float, default=10.0)
    p.add_argument("--tau", type=float, default=0.07)
    p.add_argument("--patches", type=int, default=6)
    p.add_argument("--embedded_feat_size", type=int, default=2)
    p.add_argument("--gen_disc_reg_scale", type=float, default=1e-4)
    p.add_argument("--gen_discriminator_lr", type=float, default=1e-4)
    args = p.parse_args(argv)

    from measure_tf_reference import install_dependency_shims
    install_dependency_shims()
    import tfgan_shim
    tfgan_shim.install()

    import types

    import numpy as np
    import tensorflow as tf

    v1 = tf.compat.v1
    v1.disable_v2_behavior()
    v1.disable_eager_execution()

    if not hasattr(tf, "estimator"):
        # TF 2.21 dropped tf.estimator; the reference only uses its
        # SessionRunHook re-export (gan_common.py:32)
        est = types.ModuleType("tensorflow.estimator")
        est.SessionRunHook = v1.train.SessionRunHook
        tf.estimator = est

    from gan.shadow_data_models import (
        shadowdata_discriminator_model,
        shadowdata_feature_discriminator_model,
        shadowdata_generator_model)
    from gan.wrappers.cut_wrapper import CUTInferenceWrapper, CUTWrapper
    from gan.wrappers.cycle_gan_wrapper import (CycleGANInferenceWrapper,
                                                CycleGANWrapper)
    from gan.wrappers.dcl_cycle_gan_wrapper import (
        DCLCycleGANInferenceWrapper, DCLCycleGANWrapper)
    from gan.wrappers.dcl_gan_wrapper import (DCLGANInferenceWrapper,
                                              DCLGANWrapper)
    from gan.wrappers.gan_wrapper import GANInferenceWrapper, GANWrapper

    d = np.load(args.data)
    normal = d["normal"].astype(np.float32)
    shadow = d["shadow"].astype(np.float32)
    idx = d["idx"]
    val_lit = d["val_lit"].astype(np.float32)
    val_shadow = d["val_shadow"].astype(np.float32)
    batch = idx.shape[1]
    bands = normal.shape[-1]

    graph = v1.Graph()
    with graph.as_default():
        v1.set_random_seed(args.run_seed)
        x_ph = v1.placeholder(tf.float32, (batch, 1, 1, bands), name="x")
        y_ph = v1.placeholder(tf.float32, (batch, 1, 1, bands), name="y")
        gen_fn = partial(shadowdata_generator_model,
                         create_only_encoder=False, is_training=True)
        disc_fn = partial(shadowdata_discriminator_model, is_training=True,
                          scale=args.disc_reg_scale)
        if args.gan_type == "cycle_gan":
            wrapper = CycleGANWrapper(
                cycle_consistency_loss_weight=args.cycle_weight,
                identity_loss_weight=args.identity_weight,
                use_identity_loss=True,
                generator_fn=gen_fn, discriminator_fn=disc_fn)
        elif args.gan_type in ("cut_x2y", "dcl_gan", "dcl_cycle_gan"):
            # CUT binds create_only_encoder itself (cut_wrapper.py:301-336)
            cut_gen_fn = partial(shadowdata_generator_model, is_training=True)
            feat_fn = partial(shadowdata_feature_discriminator_model,
                              embedded_feature_size=args.embedded_feat_size,
                              patch_count=args.patches, is_training=True,
                              scale=args.gen_disc_reg_scale)
            nce_kwargs = dict(nce_loss_weight=args.nce_weight,
                              identity_loss_weight=args.identity_weight,
                              use_identity_loss=True, tau=args.tau,
                              batch_size=batch,
                              generator_fn=cut_gen_fn,
                              discriminator_fn=disc_fn,
                              feat_discriminator_fn=feat_fn)
            if args.gan_type == "cut_x2y":
                wrapper = CUTWrapper(swap_inputs=False, **nce_kwargs)
            elif args.gan_type == "dcl_gan":
                wrapper = DCLGANWrapper(**nce_kwargs)
            else:
                wrapper = DCLCycleGANWrapper(
                    cycle_consistency_loss_weight=args.cycle_weight,
                    **nce_kwargs)
        else:
            wrapper = GANWrapper(identity_loss_weight=args.identity_weight,
                                 use_identity_loss=True, swap_inputs=False,
                                 generator_fn=gen_fn, discriminator_fn=disc_fn)
        model = wrapper.define_model(x_ph, y_ph)
        loss = wrapper.define_loss(model)
        train_kwargs = {"generator_lr": args.generator_lr,
                        "discriminator_lr": args.discriminator_lr}
        if args.gan_type in ("cut_x2y", "dcl_gan", "dcl_cycle_gan"):
            train_kwargs["gen_discriminator_lr"] = args.gen_discriminator_lr
        train_ops = wrapper.define_train_ops(
            model, loss, max_number_of_steps=args.steps, **train_kwargs)

        # group count is BAND-dependent: range(0, bands, bands//P) yields
        # more than P groups when bands % P != 0
        # (shadow_data_models.py:136-141 quirk, mirrored in the rebuild's
        # FeatureDiscriminator)
        n_groups = len(range(0, bands, bands // args.patches))

        def check_cut_sharing(cut_model_t, tag):
            # variable-sharing sanity: the 4 encoder/featD applications
            # must REUSE, not re-create (AUTO_REUSE + name-scope-local
            # default_name numbering, cut_wrapper.py:297-336)
            n_gen = len(cut_model_t.generator_variables)
            n_featd = len(cut_model_t.feat_discriminator_gen_data_variables)
            assert n_gen == 14, f"{tag} generator var sharing broke: {n_gen}"
            assert n_featd == n_groups * 8, \
                f"{tag} featD var sharing broke: {n_featd} != {n_groups * 8}"

        # the sequential-hook op schedule: one (train_op, {tag: loss_t})
        # entry per session.run the real runtime performs each iteration,
        # in hook order.  Each loss is fetched in its OWN op's run (the
        # rebuild evaluates every sub-loss at that unit's pre-update
        # parameters; summing per-direction tensors fetched at their own
        # runs reproduces that exactly for DCL).
        gen_disc_loss_t = None
        if args.gan_type == "cycle_gan":
            gen_loss_t = (loss.loss_x2y.generator_loss
                          + loss.loss_y2x.generator_loss)
            disc_loss_t = (loss.loss_x2y.discriminator_loss
                           + loss.loss_y2x.discriminator_loss)
            schedule = [(train_ops.generator_train_op, {"gen": gen_loss_t}),
                        (train_ops.discriminator_train_op,
                         {"disc": disc_loss_t})]
        elif args.gan_type in ("dcl_gan", "dcl_cycle_gan"):
            # 6 sub-updates: G, D, featD for x2y then y2x
            # (get_sequential_train_hooks_dclgan, dcl_gan_wrapper.py:213-229)
            check_cut_sharing(model.model_x2y, "x2y")
            check_cut_sharing(model.model_y2x, "y2x")
            schedule = []
            for ops, l in ((train_ops.x2y_ops, loss.loss_x2y),
                           (train_ops.y2x_ops, loss.loss_y2x)):
                schedule += [
                    (ops.generator_train_op, {"gen": l.generator_loss}),
                    (ops.discriminator_train_op,
                     {"disc": l.discriminator_loss}),
                    (ops.gen_discriminator_train_op,
                     {"gen_disc": l.gen_discriminator_loss})]
            gen_loss_t = (loss.loss_x2y.generator_loss
                          + loss.loss_y2x.generator_loss)
            disc_loss_t = (loss.loss_x2y.discriminator_loss
                           + loss.loss_y2x.discriminator_loss)
            gen_disc_loss_t = (loss.loss_x2y.gen_discriminator_loss
                               + loss.loss_y2x.gen_discriminator_loss)
        else:
            gen_loss_t = loss.generator_loss
            disc_loss_t = loss.discriminator_loss
            schedule = [(train_ops.generator_train_op, {"gen": gen_loss_t}),
                        (train_ops.discriminator_train_op,
                         {"disc": disc_loss_t})]
            if args.gan_type == "cut_x2y":
                gen_disc_loss_t = loss.gen_discriminator_loss
                check_cut_sharing(model, "cut")
                schedule.append((train_ops.gen_discriminator_train_op,
                                 {"gen_disc": gen_disc_loss_t}))

        infer_gen_fn = partial(shadowdata_generator_model,
                               create_only_encoder=False, is_training=False)
        vx = v1.placeholder(tf.float32, (None, 1, 1, bands), name="val_x")
        vy = v1.placeholder(tf.float32, (None, 1, 1, bands), name="val_y")
        if args.gan_type in ("cycle_gan", "dcl_gan", "dcl_cycle_gan"):
            bidir_cls = {"cycle_gan": CycleGANInferenceWrapper,
                         "dcl_gan": DCLGANInferenceWrapper,
                         "dcl_cycle_gan": DCLCycleGANInferenceWrapper}
            infer = bidir_cls[args.gan_type](
                shadow_generator_fn=infer_gen_fn)
            shadow_out = infer.construct_inference_graph(
                vx, is_shadow_graph=True, clip_invalid_values=False)
            deshadow_out = infer.construct_inference_graph(
                vy, is_shadow_graph=False, clip_invalid_values=False)
        else:  # single x2y generator: shadow direction only
            infer_cls = (CUTInferenceWrapper if args.gan_type == "cut_x2y"
                         else GANInferenceWrapper)
            infer = infer_cls(fetch_shadows=False,
                              shadow_generator_fn=infer_gen_fn)
            shadow_out = infer.construct_inference_graph(
                vx, is_shadow_graph=True, clip_invalid_values=False)
            deshadow_out = None

        grad_fetches = {}
        if args.dump_grads and args.gan_type != "cut_x2y":
            raise SystemExit("--dump_grads is a cut_x2y-only diagnostic")
        if args.dump_grads:
            for loss_t, variables, tag in (
                    (loss.generator_loss, model.generator_variables, "gen"),
                    (loss.discriminator_loss, model.discriminator_variables,
                     "disc"),
                    (loss.gen_discriminator_loss,
                     model.feat_discriminator_gen_data_variables, "featd")):
                for v, g in zip(variables, tf.gradients(loss_t, variables)):
                    grad_fetches[f"{tag}|{v.name}"] = (
                        tf.zeros_like(v) if g is None else g)

        init_op = v1.global_variables_initializer()
        var_list = v1.global_variables()

    losses_gen, losses_disc, losses_gen_disc = [], [], []
    runs_per_step = len(schedule)
    validations = {}
    with v1.Session(graph=graph) as sess:
        sess.run(init_op)
        if args.perturb_init:
            prng = np.random.default_rng(args.run_seed)
            for v in var_list:
                if "/Generator/" in v.name and v.name.endswith("weights:0"):
                    shape = [int(d) for d in v.get_shape()]
                    v.load(prng.normal(0.0, 0.02, shape).astype(np.float32),
                           sess)
        if args.dump_init:
            np.savez(args.dump_init,
                     **{v.name: sess.run(v) for v in var_list})
        if args.dump_grads:
            g_row0 = idx[0]
            np.savez(args.dump_grads, **sess.run(
                grad_fetches, {x_ph: normal[g_row0], y_ph: shadow[g_row0]}))
        consumed = 0
        train_t0 = time.time()
        for step in range(args.steps):
            if args.batch_mode == "ref":
                # each sequential hook's session.run advances the tf.data
                # iterator in the real runtime: 2 batches/iteration for
                # G+D families, 3 for CUT (G, D, featD hooks)
                rows = idx[consumed:consumed + runs_per_step]
                consumed += runs_per_step
            else:
                rows = [idx[step]] * runs_per_step
            totals = {"gen": 0.0, "disc": 0.0, "gen_disc": 0.0}
            seen = set()
            for row, (op, fetches) in zip(rows, schedule):
                tags = list(fetches)
                vals = sess.run([op] + [fetches[t] for t in tags],
                                {x_ph: normal[row], y_ph: shadow[row]})
                for t, v in zip(tags, vals[1:]):
                    totals[t] += float(v)
                    seen.add(t)
            gl, dl = totals["gen"], totals["disc"]
            gdl = totals["gen_disc"] if "gen_disc" in seen else None
            sess.run(train_ops.global_step_inc_op)
            if step < args.trajectory_steps:
                losses_gen.append(float(gl))
                losses_disc.append(float(dl))
                if gdl is not None:
                    losses_gen_disc.append(float(gdl))
            it = step + 1
            if it % args.validation_steps == 0 or it == args.steps:
                gen_shadow = sess.run(shadow_out, {vx: val_lit})
                gen_deshadow = (sess.run(deshadow_out, {vy: val_shadow})
                                if deshadow_out is not None else None)
                validations[str(it)] = (gen_shadow, gen_deshadow)
                print(f"[tf] step {it}: gen_loss={float(gl):.4f} "
                      f"disc_loss={float(dl):.4f}", flush=True)
        train_seconds = time.time() - train_t0
        if args.dump_final:
            np.savez(args.dump_final,
                     **{v.name: sess.run(v) for v in var_list})
        if args.save_ckpt:
            with graph.as_default():
                saver = v1.train.Saver()
            saver.save(sess, args.save_ckpt)
            print(f"[tf] checkpoint -> {args.save_ckpt}")

    if args.dump_generated:
        arrays = {}
        for it, (gs, gd) in validations.items():
            arrays[f"shadowed_{it}"] = gs
            if gd is not None:
                arrays[f"deshadowed_{it}"] = gd
        np.savez(args.dump_generated, **arrays)

    report = {
        "framework": "reference_tf",
        "gan_type": args.gan_type,
        "steps": args.steps,
        "batch": batch,
        "batch_mode": args.batch_mode,
        "run_seed": args.run_seed,
        "train_seconds": round(train_seconds, 2),
        "steps_per_sec": round(args.steps / train_seconds, 2),
        "validation_iterations": sorted(int(k) for k in validations),
        "trajectory_gen_loss": losses_gen,
        "trajectory_disc_loss": losses_disc,
        "trajectory_gen_disc_loss": losses_gen_disc,
    }
    with open(args.out, "w") as fid:
        json.dump(report, fid, indent=2)
    print(f"[tf] report -> {args.out}")


if __name__ == "__main__":
    main()
