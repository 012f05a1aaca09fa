"""Full-scene GAN image translation throughput (VERDICT r4 item 6).

The reference's ``gan_infer_image_for_shadow`` translates the scene pixel by
pixel through ``sess.run`` (`gan/gan_infer_image_for_shadow.py:62-104`) —
hours at GRSS2013 scale (~665k px).  The rebuild runs the whole scene in ONE
jitted ``lax.map`` dispatch (``GANTrainerBase.translate_scene``).  This
script measures that sweep on the ambient device and merges a
``full_scene_translate`` block into GAN_BENCH.json.

Also captures the shadow-map-filtered end-to-end app semantics: translate +
vectorized mask select + un-normalize (the work the CLI does around the
sweep).

Usage: python scripts/bench_gan_image_infer.py [--windows 5]
       [--jax_platform cpu --smoke]  (smoke = tiny scene, correctness only)
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--gan_type", default="cycle_gan")
    parser.add_argument("--bands", type=int, default=144)
    parser.add_argument("--h", type=int, default=349)
    parser.add_argument("--w", type=int, default=1905)
    parser.add_argument("--block", type=int, default=65536)
    parser.add_argument("--windows", type=int, default=5)
    parser.add_argument("--smoke", action="store_true")
    parser.add_argument("--jax_platform", default=None)
    parser.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "GAN_BENCH.json"))
    args = parser.parse_args(argv)
    if args.smoke:
        args.h, args.w, args.bands, args.windows = 48, 64, 8, 2

    import jax

    if args.jax_platform:
        jax.config.update("jax_platforms", args.jax_platform)

    from hypelcnn_tpu.core.registry import get_loader_from_name
    from hypelcnn_tpu.gan.wrapper_registry import get_trainer_dict

    spec = (f"synthetic://?h={args.h}&w={args.w}&bands={args.bands}"
            f"&classes=15&seed=11")
    loader = get_loader_from_name("SyntheticDataLoader", spec)
    data_set = loader.load_data(0, True)
    shadow_map, _ = loader.load_shadow_map(0, data_set)
    band_size = data_set.get_casi_band_count()
    h, w = data_set.get_scene_shape()
    pixels = np.asarray(data_set.casi[:h, :w, :band_size], dtype=np.float32)

    trainer = get_trainer_dict({"patches": 3, "embedded_feat_size": 2},
                               band_size, max_steps=1)[args.gan_type]
    state = trainer.init_state(jax.random.key(0))
    params = jax.device_get(state.params)

    # warm: compile + first transfer outside the clock
    converted = trainer.translate_scene(params, pixels, True, block=args.block)
    assert converted.shape == pixels.shape and np.all(np.isfinite(converted))

    times = []
    for _ in range(args.windows):
        t0 = time.perf_counter()
        converted = trainer.translate_scene(params, pixels, True,
                                            block=args.block)
        times.append(time.perf_counter() - t0)
    sweep_s = statistics.median(times)

    # end-to-end app semantics: sweep + mask select + un-normalize
    t0 = time.perf_counter()
    converted = trainer.translate_scene(params, pixels, True, block=args.block)
    mask = (np.asarray(shadow_map)[:h, :w] == 0)[:, :, None]
    filtered = np.where(mask, converted, pixels)
    _ = ((filtered * data_set.casi_max) + data_set.casi_min)
    e2e_s = time.perf_counter() - t0

    n_px = h * w
    block = {
        "gan_type": args.gan_type,
        "scene": f"{h}x{w}x{band_size}", "pixels": n_px,
        "device": str(jax.devices()[0].device_kind),
        "block": args.block,
        "sweep_s_median": round(sweep_s, 3),
        "pixels_per_sec": round(n_px / sweep_s),
        "windows_s": [round(t, 3) for t in times],
        "end_to_end_filtered_s": round(e2e_s, 3),
        "reference_comparator": "per-pixel sess.run loop, "
                                "gan/gan_infer_image_for_shadow.py:62-104 "
                                "(hours at this scale)",
    }
    out = {}
    if os.path.exists(args.out) and not args.smoke:
        with open(args.out) as f:
            out = json.load(f)
    if not args.smoke:
        out["full_scene_translate"] = block
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
            f.write("\n")
    print(json.dumps(block, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
