"""Diffusion guidance (cf. reference nerfstudio/generative/, ~600 LoC:
StableDiffusion / DeepFloyd score-distillation + positional text prompts,
unused by the AD training path).

The pretrained checkpoints those classes download are unavailable in this
environment (zero egress), so the machinery is built predictor-agnostic
(see diffusion.py): `TinyNoisePredictor` trains in-env with
`denoising_loss`, `ddim_sample` generates from any predictor, and
`ScoreDistillationGuidance.sds_loss` reproduces the reference's SDS
semantics (classifier-free guidance, w=1-alpha_bar, stop-grad target trick).
External weights plug through the same `predict(params, x_t, t, cond)`
interface.
"""

from neuradar_tpu.generative.random_cameras import (  # noqa: F401
    RandomCamerasConfig,
    random_train_pose,
)
from neuradar_tpu.generative.diffusion import (  # noqa: F401
    PositionalEmbeddings,
    ScoreDistillationGuidance,
    TinyNoisePredictor,
    add_noise,
    alpha_bar,
    ddim_sample,
    denoising_loss,
)
