"""Capture a device profile trace of the training chunk (for optimization work).

Writes a TensorBoard-loadable trace under --out; inspect with
`tensorboard --logdir <out>` -> Profile plugin.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="/tmp/jax_trace")
    parser.add_argument("--batch", type=int, default=2048)
    parser.add_argument("--chunk", type=int, default=50)
    args = parser.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from hypelcnn_tpu.data.loaders.synthetic import SyntheticDataLoader
    from hypelcnn_tpu.models import HYPELCNNModel
    from hypelcnn_tpu.train.trainer import ClassificationTrainer

    loader = SyntheticDataLoader("synthetic://?h=128&w=256&bands=144&classes=15")
    scene = loader.load_data(neighborhood=1, normalize=True)
    np.random.seed(0)
    samples = loader.load_samples(train_data_ratio=0.3, test_data_ratio=0.05)
    model = HYPELCNNModel()
    params = {**model.default_params(), "batch_size": args.batch,
              "compute_dtype": "bfloat16"}
    tr = ClassificationTrainer(model=model, class_count=15, algorithm_params=params,
                               scene=scene, sample_set=samples, test_cadence=10 ** 9)
    train = samples.training_targets
    tables = (jnp.asarray(train[:, :2].astype(np.int32)),
              jnp.asarray(train[:, 2].astype(np.int32)),
              tr.rng_pool.key("train", 0))
    step_fn = tr._build_train_chunk()
    state = tr.init_state()
    arrays = tr.sources["training"].device_arrays()
    idx = jnp.asarray(np.random.randint(0, train.shape[0],
                                        size=(args.chunk, args.batch)).astype(np.int32))
    nos = jnp.arange(args.chunk, dtype=jnp.uint32)
    state, losses = step_fn(state, arrays, tables, idx, nos)
    losses.block_until_ready()  # compile outside the trace

    with jax.profiler.trace(args.out):
        state, losses = step_fn(state, arrays, tables, idx, nos)
        losses.block_until_ready()
    print(f"trace written to {args.out}")


if __name__ == "__main__":
    main()
