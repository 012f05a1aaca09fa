"""hypelcnn_tpu — a TPU-native framework for hyperspectral + LiDAR terrain
classification and GAN-based shadow-sample synthesis.

Re-designed from scratch for TPU (JAX / XLA / Pallas / pjit) with the same
capabilities as the TF1-compat reference suite (aligokalppeker/hypelcnn):

- four plug-in CNN model families (HYPELCNN, DUALCNN, CONCNN, CAP),
- five dataset loaders (GRSS2013, GRSS2018, GULFPORT, GULFPORT-ALT, AVON),
- three input-pipeline strategies (in-memory, generator/on-device gather,
  cached-record),
- four GAN families for shadow translation (vanilla, CycleGAN(+identity),
  CUT, DCLGAN, DCL-CycleGAN),
- hyperparameter search, metrics (OA/AA/kappa/confusion), checkpointing,
  full-scene inference, and offline utilities.

Architecture differences from the reference (by design, not omission):
- Pure jitted step functions over explicit param/opt-state pytrees replace
  the TF1 graph/session/hook machinery.
- The per-pixel host patch gather is an on-device operation: the padded
  scene lives in HBM and a Pallas (or dynamic-slice) kernel gathers
  neighborhood windows for a batch of coordinates.
- Data/model sharding via jax.sharding.Mesh + jit, with XLA collectives.
"""

__version__ = "0.3.0"  # round 3
