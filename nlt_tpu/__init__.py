"""nlt_tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework for Neural Light
Transport — relighting and view synthesis via a texture-space (UV) U-Net that
predicts a learned residual over a physically-derived diffuse base.

This is a from-scratch re-design of the capabilities of
google/neural-light-transport (TOG 2021) for TPU hardware:

- the compute path (dual-path UV U-Net, differentiable UV->camera resampling,
  Barron adaptive robust loss over a CDF9/7 wavelet pyramid, LPIPS) is pure
  JAX, compiled end-to-end under ``jax.jit`` with optional Pallas kernels for
  the hot ops;
- distribution is a first-class ``jax.sharding.Mesh`` + ``NamedSharding``
  story (data-parallel batch axis, optional texel-tile sharding of the UV
  space), replacing the reference's ``tf.distribute.MirroredStrategy``
  (reference: nlt/trainvali.py:254-264);
- checkpointing stores the full training state — params, optimizer state,
  step, and the robust-loss latent parameters the reference silently never
  checkpointed (reference quirk: nlt/models/base.py:79-101 only registers
  ``self.net``).

Layer map (mirrors the reference's, SURVEY.md §1):

    trainvali / nlt_test     CLI drivers                  (L7)
    parallel/                mesh + sharded train step    (L6)
    models/                  task logic                   (L5)
    networks/                architectures                (L4)
    losses/                  losses incl. robust + LPIPS  (L3)
    datasets/                host data pipeline           (L2)
    utils/, ops/, vis/       utilities and kernels        (L1)
"""

__version__ = "0.1.0"
