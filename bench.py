"""Benchmark: HYPELCNN training throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md); its documented setup is the
HYPELCNN modelconfig (filter_count=480, batch 48, `nnmodel/modelconfigs/
alg_param_hypelcnn.json`) on GRSS2013-scale data (144-band CASI + LiDAR,
15 classes).  We measure steady-state training patches/sec/chip on a
synthetic scene of that scale with the full pipeline (on-device window
gather + augmentation + forward/backward + optimizer).  ``vs_baseline``
compares against a conservative estimate of the TF1 reference's single-GPU
throughput on this workload (~1000 patches/s: batch 48 at ~20 steps/s with
a host-side feed pipeline).
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_PATCHES_PER_SEC = 1000.0  # estimated TF reference throughput (no published number)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from hypelcnn_tpu.data.augmentation import AugmentationInfo
    from hypelcnn_tpu.data.loaders.synthetic import SyntheticDataLoader
    from hypelcnn_tpu.models import HYPELCNNModel

    # GRSS2013-scale synthetic scene: 144-band CASI + LiDAR, 15 classes
    loader = SyntheticDataLoader("synthetic://?h=128&w=256&bands=144&classes=15")
    scene = loader.load_data(neighborhood=1, normalize=True)
    np.random.seed(0)
    samples = loader.load_samples(train_data_ratio=0.3, test_data_ratio=0.05)

    from hypelcnn_tpu.train.trainer import ClassificationTrainer

    model = HYPELCNNModel()
    batch_size = 512  # TPU-native batch; the MXU is idle at the reference's 48
    algorithm_params = {**model.default_params(), "batch_size": batch_size,
                        "compute_dtype": "bfloat16"}

    trainer = ClassificationTrainer(
        model=model, class_count=15, algorithm_params=algorithm_params,
        scene=scene, sample_set=samples,
        augmentation_info=AugmentationInfo(perform_rotation_augmentation=True,
                                           perform_reflection_augmentation=True),
        test_cadence=10 ** 9)

    # warmup chunk (compile)
    warmup_steps = 20
    trainer.fit(num_steps=warmup_steps, batch_size=batch_size, log_every=warmup_steps)

    # timed: fresh trainer state reuses the compiled chunk
    steps = 200
    t0 = time.time()
    trainer._eval_step = None
    state = trainer.final_state
    coords_table = jnp.asarray(samples.training_targets[:, :2].astype(np.int32))
    del coords_table  # tables already captured in the compiled chunk
    import jax as _jax
    idx_stream = np.random.randint(0, samples.training_targets.shape[0],
                                   size=(steps, batch_size)).astype(np.int32)
    idx_dev = jnp.asarray(idx_stream)
    step_nos = jnp.arange(steps, dtype=jnp.uint32)
    # run in cadence-sized chunks equal to compiled chunk length
    chunk = warmup_steps
    for start in range(0, steps, chunk):
        state, losses = trainer._train_step(
            state, _jax.lax.slice_in_dim(idx_dev, start, start + chunk, axis=0),
            step_nos[start:start + chunk])
    _jax.block_until_ready(losses)
    elapsed = time.time() - t0

    patches_per_sec = steps * batch_size / elapsed
    print(json.dumps({
        "metric": "hypelcnn_train_patches_per_sec_per_chip",
        "value": round(patches_per_sec, 1),
        "unit": "patches/s",
        "vs_baseline": round(patches_per_sec / REFERENCE_PATCHES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
