"""One-iteration CUT update-divergence diagnostic (throwaway).

Runs the reference TF cut_x2y ONE matched-batch iteration (dumping init +
final variables), replays the same iteration in the rebuild from the
injected init, and prints the per-tensor max|delta| of the post-update
parameters — localizing which sub-network's first update diverges.
"""

import json
import os
import subprocess
import sys
import tempfile

SCRIPTS_DIR = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(SCRIPTS_DIR)
sys.path.insert(0, REPO)
sys.path.insert(0, SCRIPTS_DIR)

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from gan_episode_parity import (build_shared, inject_tf_init, GAN_CONFIG,
                                _SCOPES)


class A:
    h, w, bands, classes, scene_seed = 96, 128, 24, 6, 11
    noise = 120.0
    validation_count = 8


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    spec, normal, shadow, val_lit, val_shadow, _ = build_shared(A())
    n_pairs = normal.shape[0]
    rng = np.random.default_rng(5150)
    idx = rng.integers(0, n_pairs, (3 * steps, 4)).astype(np.int32)

    with tempfile.TemporaryDirectory() as tmp:
        data_npz = os.path.join(tmp, "d.npz")
        np.savez(data_npz, normal=normal, shadow=shadow, idx=idx,
                 val_lit=val_lit, val_shadow=val_shadow)
        init_npz = os.path.join(tmp, "init.npz")
        fin_npz = os.path.join(tmp, "fin.npz")
        out = os.path.join(tmp, "rep.json")
        subprocess.run(
            [sys.executable, os.path.join(SCRIPTS_DIR, "gan_parity_tf.py"),
             "--data", data_npz, "--steps", str(steps), "--gan_type", "cut_x2y",
             "--validation_steps", str(steps), "--run_seed", "1234",
             "--batch_mode", "matched", "--out", out,
             "--trajectory_steps", str(steps), "--perturb_init",
             "--dump_init", init_npz, "--dump_final", fin_npz,
             "--dump_grads", os.path.join(tmp, "grads.npz")],
            cwd=REPO, text=True, check=True)
        init_values = dict(np.load(init_npz))
        fin_values = dict(np.load(fin_npz))
        tf_grads = dict(np.load(os.path.join(tmp, "grads.npz")))
        with open(out) as fid:
            rep = json.load(fid)

    import jax.numpy as jnp
    from hypelcnn_tpu.gan.wrapper_registry import get_trainer_dict

    trainer = get_trainer_dict(GAN_CONFIG, A.bands, steps)["cut_x2y"]
    state = trainer.init_state(jax.random.key(0))
    state = state.replace(params=inject_tf_init(state.params, init_values,
                                                "cut_x2y"))
    normal_d, shadow_d = jnp.asarray(normal), jnp.asarray(shadow)

    # ---- gradient parity at the initial point, first batch ----
    from hypelcnn_tpu.gan.losses import (
        l2_regularization, least_squares_discriminator_loss,
        least_squares_generator_loss, nce_loss)

    P = state.params
    gen_m, disc_m, featd_m = (trainer.generator, trainer.discriminator,
                              trainer.feat_discriminator)
    rows0 = jnp.asarray(idx[0])
    x0 = jnp.take(normal_d, rows0, axis=0)
    y0 = jnp.take(shadow_d, rows0, axis=0)

    def emb(gp, fp, data):
        return featd_m.apply({"params": fp},
                             gen_m.apply({"params": gp}, data,
                                         encoder_only=True))

    def gen_loss_fn(gp):
        gen_data = gen_m.apply({"params": gp}, x0)
        adv = least_squares_generator_loss(
            disc_m.apply({"params": P["disc"]}, gen_data, x0))
        gd = nce_loss(emb(gp, P["featd"], gen_data), emb(gp, P["featd"], x0),
                      0.07)
        id_y = gen_m.apply({"params": gp}, y0)
        idl = nce_loss(emb(gp, P["featd"], id_y), emb(gp, P["featd"], y0),
                       0.07)
        return adv + 10.0 * gd + 0.5 * idl

    def disc_loss_fn(dp):
        gen_data = gen_m.apply({"params": P["gen"]}, x0)
        return (least_squares_discriminator_loss(
            disc_m.apply({"params": dp}, y0, x0),
            disc_m.apply({"params": dp}, gen_data, x0))
            + l2_regularization(dp, 1e-5, exclude=("fc3",)))

    def featd_loss_fn(fp):
        gen_data = gen_m.apply({"params": P["gen"]}, x0)
        return (nce_loss(emb(P["gen"], fp, gen_data), emb(P["gen"], fp, x0),
                         0.07) + l2_regularization(fp, 1e-4))

    grads = {"gen": jax.grad(gen_loss_fn)(P["gen"]),
             "disc": jax.grad(disc_loss_fn)(P["disc"]),
             "featd": jax.grad(featd_loss_fn)(P["featd"])}
    scopes = _SCOPES["cut_x2y"]
    grows = []
    for top, sub in jax.device_get(grads).items():
        for layer, leaves in sub.items():
            for leaf_name, val in leaves.items():
                suffix = {"kernel": "weights", "bias": "biases"}[leaf_name]
                if top == "featd":
                    g, fc = layer.split("_")
                    n = 4 * int(g[1:]) + int(fc[2:]) - 1
                    tfl = ("fully_connected" if n == 0
                           else f"fully_connected_{n}")
                else:
                    tfl = {"fc1": "fully_connected",
                           "fc2": "fully_connected_1",
                           "fc3": "fully_connected_2"}.get(layer, layer)
                tfg = tf_grads[f"{top}|{scopes[top]}/{tfl}/{suffix}:0"]
                d = float(np.abs(np.asarray(val) - tfg).max())
                mag = float(np.abs(tfg).max())
                grows.append((d, mag, f"{top}/{layer}/{leaf_name}"))
    grows.sort(reverse=True)
    print("gradient parity at init (first batch): |rebuild-tf| (vs |tf|):")
    for d, mag, name in grows[:14]:
        print(f"  {d:.3e}  (|g| {mag:.3e})  {name}")

    for step in range(steps):
        rows = jnp.asarray(idx[step])
        x = jnp.take(normal_d, rows, axis=0)
        y = jnp.take(shadow_d, rows, axis=0)
        state, metrics = trainer.train_step(state, x, y, jax.random.key(1))
        print(f"rebuild step {step}: gen={float(metrics['generator_loss']):.6f} "
              f"disc={float(metrics['discriminator_loss']):.6f} "
              f"featd={float(metrics['gen_discriminator_loss']):.6f}")
    print("tf        : gen=%s disc=%s featd=%s" % (
        rep["trajectory_gen_loss"][-1], rep["trajectory_disc_loss"][-1],
        rep["trajectory_gen_disc_loss"][-1]))

    # per-tensor post-update deltas
    scopes = _SCOPES["cut_x2y"]
    params = jax.device_get(state.params)
    rows = []
    for top, sub in params.items():
        for layer, leaves in sub.items():
            for leaf_name, val in leaves.items():
                suffix = {"kernel": "weights", "bias": "biases"}[leaf_name]
                if top == "featd":
                    g, fc = layer.split("_")
                    n = 4 * int(g[1:]) + int(fc[2:]) - 1
                    tfl = "fully_connected" if n == 0 else f"fully_connected_{n}"
                else:
                    tfl = {"fc1": "fully_connected", "fc2": "fully_connected_1",
                           "fc3": "fully_connected_2"}.get(layer, layer)
                name = f"{scopes[top]}/{tfl}/{suffix}:0"
                tfv = fin_values[name]
                d = float(np.abs(np.asarray(val) - tfv).max())
                upd = float(np.abs(tfv - init_values[name]).max())
                rows.append((d, upd, f"{top}/{layer}/{leaf_name}"))
    rows.sort(reverse=True)
    print("\nper-tensor |rebuild-tf| after %d step(s) (vs |tf update size|):" % steps)
    for d, upd, name in rows[:18]:
        print(f"  {d:.3e}  (upd {upd:.3e})  {name}")


if __name__ == "__main__":
    main()
