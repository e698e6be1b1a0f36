"""impersonator_tpu — a TPU-native Liquid Warping GAN framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
svip-lab/impersonator (ICCV 2019 "Liquid Warping GAN"): human motion
imitation, appearance transfer and novel view synthesis from a single
image, plus the adversarial training stack that produces the models.

Layout
------
- ``ops``       device-side geometry ops: batched SMPL LBS, weak-perspective
                projection, the fim/wim mesh rasterizer (XLA + Pallas),
                correspondence-flow builder, bilinear warping, morphology.
- ``models``    neural networks (flax.linen, NHWC): LWB generator,
                deepfill-v2 inpaintor, patch discriminators, HMR pose
                regressor, VGG/face/style loss nets.
- ``tasks``     task orchestration: imitator / swapper / viewer /
                adversarial trainer / test-time personalization.
- ``parallel``  device-mesh setup and sharding rules (pjit/shard_map).
- ``data``      host-side input pipelines.
- ``metrics``   SSIM / PSNR / LPIPS-style evaluation.
- ``utils``     checkpointing, logging, image/video IO.
- ``cli``       entry points mirroring the reference's train/run_* scripts.

The reference implementation this framework is modeled after lives at
/root/reference (PyTorch/CUDA); file:line citations in docstrings point
there for behavioural parity checks. No code is shared.
"""

__version__ = "0.1.0"
