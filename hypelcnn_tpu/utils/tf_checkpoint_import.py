"""Import the reference's TF ``model.ckpt-NNNN`` checkpoints into flax pytrees.

The reference trains classifiers (saved under scopes ``nn_core`` /
``global_step`` / ``training_optimizer``, `classify/monitored_session_runner.py:164-168`)
and GAN generators (under ``Model[/ModelX2Y|/ModelY2X]/Generator``,
`gan/wrappers/gan_common.py:22-23`, `cycle_gan_wrapper.py:18-19`); loaders
declare specific GAN checkpoints for shadow augmentation
(`loader/GRSS2013DataLoader.py:26-34`).  A user migrating to the rebuild can
load those checkpoints directly — no TF *training*, only TF's checkpoint
reader (gated import, same policy as ``utils/tfrecord_compat.py``).

Name mapping (the inverse of the per-variable parity map proven in
``scripts/forward_parity.py``):

  flax ``<scope>/Conv_0|Dense_0/kernel``  <- TF ``<scope>/weights``
  flax ``<scope>/.../bias``               <- TF ``<scope>/biases``
  flax ``<scope>/BatchNorm_0/bias``       <- TF ``<scope>/BatchNorm/beta``
  batch_stats ``mean``/``var``            <- ``moving_mean``/``moving_variance``
  directly-named flax layers (GAN nets)   <- same-scope ``weights``/``biases``

Fused multi-scale levels (``fuse_level_convs``) are handled: each
``conv{k}x{k}_kernel`` pulls its branch conv, and the merged BatchNorm is
the ascending-k concat of the branch BN vectors.
"""

from __future__ import annotations

import re
from typing import Dict, Optional

import numpy as np

_BN_LEAF = {"bias": "beta", "scale": "gamma",
            "mean": "moving_mean", "var": "moving_variance"}
_LIN_LEAF = {"kernel": "weights", "bias": "biases"}
_FUSED_KERNEL = re.compile(r"^(conv\d+x\d+)_kernel$")
_FUSED_BIAS = re.compile(r"^(conv\d+x\d+)_bias$")


def load_tf_checkpoint_values(ckpt_prefix: str) -> Dict[str, np.ndarray]:
    """Read every variable of a TF checkpoint (``model.ckpt-NNNN`` prefix or
    a directory containing a ``checkpoint`` state file) as numpy arrays."""
    try:
        import tensorflow as tf
    except ImportError as exc:  # pragma: no cover
        raise ImportError(
            "Importing reference TF checkpoints requires tensorflow "
            "(read-only; no TF graph is built).") from exc
    import os
    if os.path.isdir(ckpt_prefix):
        state = tf.train.latest_checkpoint(ckpt_prefix)
        if state is None:
            raise FileNotFoundError(f"no TF checkpoint under {ckpt_prefix}")
        ckpt_prefix = state
    reader = tf.train.load_checkpoint(ckpt_prefix)
    return {name: reader.get_tensor(name)
            for name in reader.get_variable_to_shape_map()}


class _Taken:
    """Tracks which checkpoint variables were consumed (for reporting)."""

    def __init__(self, values: Dict[str, np.ndarray]):
        self.values = values
        self.used: set = set()

    def take(self, name: str, like: np.ndarray) -> np.ndarray:
        if name not in self.values:
            raise KeyError(f"checkpoint has no variable {name!r} "
                           f"(needed for a leaf of shape {like.shape})")
        val = np.asarray(self.values[name])
        if val.shape != tuple(like.shape):
            raise ValueError(f"{name}: checkpoint shape {val.shape} != "
                             f"template shape {tuple(like.shape)}")
        self.used.add(name)
        return val


def _fill_fused(module_tree: dict, scope_base: str, taken: _Taken) -> dict:
    """Fill a FusedMultiScaleLevel subtree from per-branch TF variables.

    ``scope_base`` is the TF prefix up to and including the level base name
    (e.g. ``nn_core/connector_0``); branch convs live at
    ``{scope_base}_conv{k}x{k}``.
    """
    out: dict = {}
    # branch kernel sizes come from the CHECKPOINT's own variable names so
    # a batch_stats tree (which holds only the merged BatchNorm) fuses too
    branch_pat = re.compile(re.escape(scope_base) + r"_conv(\d+)x(\d+)/")
    ks = sorted({int(m.group(1)) for name in taken.values
                 if (m := branch_pat.match(name))})
    for key, leaf in module_tree.items():
        if (m := _FUSED_KERNEL.match(key)):
            out[key] = taken.take(f"{scope_base}_{m.group(1)}/weights", leaf)
        elif (m := _FUSED_BIAS.match(key)):
            out[key] = taken.take(f"{scope_base}_{m.group(1)}/biases", leaf)
        elif key == "BatchNorm_0":
            sub = {}
            for bn_leaf, arr in leaf.items():
                tf_leaf = _BN_LEAF[bn_leaf]
                parts = [_take_bn_branch(taken, scope_base, k, tf_leaf)
                         for k in sorted(ks)]
                merged = np.concatenate(parts)
                if merged.shape != tuple(arr.shape):
                    raise ValueError(
                        f"{scope_base} fused BatchNorm {bn_leaf}: concat "
                        f"shape {merged.shape} != template {tuple(arr.shape)}")
                sub[bn_leaf] = merged
            out[key] = sub
        else:
            raise KeyError(f"unexpected fused-level key {key!r}")
    return out


def _take_bn_branch(taken: _Taken, scope_base: str, k: int, tf_leaf: str
                    ) -> np.ndarray:
    name = f"{scope_base}_conv{k}x{k}/BatchNorm/{tf_leaf}"
    if name not in taken.values:
        raise KeyError(f"checkpoint has no variable {name!r}")
    taken.used.add(name)
    return np.asarray(taken.values[name])


def _fill_tree(tree: dict, scope: str, taken: _Taken) -> dict:
    out: dict = {}
    for key, sub in tree.items():
        if key in ("Conv_0", "Dense_0"):
            out[key] = {leaf: taken.take(f"{scope}/{_LIN_LEAF[leaf]}", arr)
                        for leaf, arr in sub.items()}
        elif key == "BatchNorm_0":
            out[key] = {leaf: taken.take(f"{scope}/BatchNorm/{_BN_LEAF[leaf]}", arr)
                        for leaf, arr in sub.items()}
        elif isinstance(sub, dict):
            if key.endswith("_fused"):
                out[key] = _fill_fused(sub, f"{scope}/{key[:-len('_fused')]}",
                                       taken)
            else:
                out[key] = _fill_tree(sub, f"{scope}/{key}", taken)
        else:  # directly-named flax layer leaf (GAN convs: net1/kernel)
            out[key] = taken.take(f"{scope}/{_LIN_LEAF.get(key, key)}", sub)
    return out


def _cap_special_fill(params: dict, taken: _Taken, scope: str) -> dict:
    """CAP's DigitCaps per-capsule 1x1 convs are stacked into the rebuild's
    fused einsum weights (mapping proven in scripts/forward_parity.py
    cap_parity; reference `nnmodel/CAPModel.py:71-84`)."""
    out = dict(params)
    data_size = params["digitcaps_w"].shape[0]
    out["digitcaps_w"] = np.stack(
        [taken.take(f"{scope}/DigitCaps_layer/DigitCaps_layer_w_{i}/weights",
                    np.zeros((1, 1) + tuple(params["digitcaps_w"].shape[1:]),
                             np.float32))[0, 0]
         for i in range(data_size)])
    out["digitcaps_b"] = np.stack(
        [taken.take(f"{scope}/DigitCaps_layer/DigitCaps_layer_w_{i}/biases",
                    params["digitcaps_b"][i])
         for i in range(data_size)])
    rest = {k: v for k, v in params.items()
            if k not in ("digitcaps_w", "digitcaps_b")}
    out.update(_fill_tree(rest, scope, taken))
    return out


def import_classifier_variables(variables: dict, ckpt_path: str,
                                scope: str = "nn_core") -> dict:
    """Fill a classifier's ``{"params", "batch_stats"}`` template from a
    reference checkpoint (Saver scopes `classify/monitored_session_runner.py:164-168`).

    The template decides what is read: an inference template (no decoder
    heads) simply skips the ``image_gen_net_*`` variables; optimizer slots
    and ``global_step`` in the checkpoint are ignored.
    """
    values = load_tf_checkpoint_values(ckpt_path)
    taken = _Taken(values)
    params = dict(variables["params"])
    if "digitcaps_w" in params:
        filled_params = _cap_special_fill(params, taken, scope)
    else:
        filled_params = _fill_tree(params, scope, taken)
    out = {"params": filled_params}
    if "batch_stats" in variables:
        out["batch_stats"] = _fill_tree(dict(variables["batch_stats"]),
                                        scope, taken)
    return out


# GAN type -> (template param path) -> TF scope prefix of that generator.
# Scopes per reference `gan/wrappers/gan_common.py:22-23` (Model/Generator),
# `cycle_gan_wrapper.py:18-19,127-129` (Model/ModelX2Y|Y2X/Generator);
# CUT saves a single direction under Model/Generator
# (`cut_wrapper.py:611,300`); DCL(-cycle) both directions like CycleGAN
# (`dcl_gan_wrapper.py:44-56,255`).
GAN_GENERATOR_SCOPES: Dict[str, Dict[tuple, str]] = {
    "gan_x2y": {("generator",): "Model/Generator"},
    "gan_y2x": {("generator",): "Model/Generator"},
    "cycle_gan": {("gen_x2y",): "Model/ModelX2Y/Generator",
                  ("gen_y2x",): "Model/ModelY2X/Generator"},
    "cut_x2y": {("gen",): "Model/Generator"},
    "cut_y2x": {("gen",): "Model/Generator"},
    "dcl_gan": {("x2y", "gen"): "Model/ModelX2Y/Generator",
                ("y2x", "gen"): "Model/ModelY2X/Generator"},
    "dcl_cycle_gan": {("x2y", "gen"): "Model/ModelX2Y/Generator",
                      ("y2x", "gen"): "Model/ModelY2X/Generator"},
}


def import_gan_generator_params(gan_type: str, template_params: dict,
                                ckpt_path: str,
                                values: Optional[Dict[str, np.ndarray]] = None
                                ) -> dict:
    """Fill the GENERATOR entries of a GAN trainer's param template from a
    reference checkpoint; discriminator/feature-discriminator entries keep
    their template values (the reference's own generator restorer is
    generator-only, `gan/wrappers/cycle_gan_wrapper.py:140-147`)."""
    if gan_type not in GAN_GENERATOR_SCOPES:
        raise KeyError(f"unknown gan type {gan_type!r}; expected one of "
                       f"{sorted(GAN_GENERATOR_SCOPES)}")
    if values is None:
        values = load_tf_checkpoint_values(ckpt_path)
    taken = _Taken(values)

    def fill_at(tree: dict, path: tuple, scope: str) -> dict:
        key, rest = path[0], path[1:]
        sub = dict(tree)
        if rest:
            sub[key] = fill_at(sub[key], rest, scope)
        else:
            sub[key] = _fill_tree(dict(sub[key]), scope, taken)
        return sub

    out = dict(template_params)
    for path, scope in GAN_GENERATOR_SCOPES[gan_type].items():
        out = fill_at(out, path, scope)
    return out


def is_tf_checkpoint(path: str) -> bool:
    """True when ``path`` points at a TF checkpoint prefix/dir (``.index``
    sibling or a ``checkpoint`` state file) rather than an orbax dir."""
    import os
    if os.path.isfile(path + ".index"):
        return True
    return os.path.isdir(path) and os.path.isfile(
        os.path.join(path, "checkpoint"))
