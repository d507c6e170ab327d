"""LayoutDETR-TPU: a TPU-native JAX/XLA/Pallas framework for generative layout design.

A from-scratch rebuild of the capabilities of salesforce/LayoutDETR
(reference: /root/reference) designed TPU-first:

- Compute path: JAX + XLA + Pallas kernels (MXU-sized matmuls, fused
  elementwise ops, bf16 activations / fp32 params).
- Parallelism: ``jax.sharding.Mesh`` + jit shardings over ICI; grad
  all-reduce is a mesh ``psum`` inside the jitted step (reference used
  torch.distributed NCCL + flattened all_reduce,
  training/training_loop.py:305-312).
- Data: host-side zip pipeline with *pre-tokenized* text (the reference
  ran a CPU tokenizer inside every forward, training/networks_detr.py:145).
- Checkpointing: orbax pytree checkpoints of params + EMA + optimizer
  state (the reference pickled live modules, torch_utils/persistence.py).

Subpackages
-----------
- ``config``    typed config tree + string-keyed dynamic construction
- ``ops``       Pallas/XLA op layer (bias_act, upfirdn2d, conv2d_resample, attention)
- ``models``    flax modules (ResNet50-FrozenBN, DETR transformer, BERT/MED,
                StyleGAN2 encoder/decoder, Generator, Discriminator, LayoutNet)
- ``data``      dataset_tool (offline) + LayoutDataset (runtime zip loader) + tokenizer
- ``training``  GAN loss phases, jitted train steps, EMA, ADA augment
- ``parallel``  mesh construction and sharding helpers
- ``metrics``   layout metrics (overlap/alignment/IoU/DocSim/GIoU), layout-FID harness
"""

__version__ = "0.1.0"
