"""tpu_deer — TPU-native Multimodal DEER (Deep Evidential Emotion Regression).

A from-scratch JAX/XLA/Pallas framework with the capabilities of the reference
PyTorch codebase `kalgeee/Uncertainty-Aware-Multimodal-Emotion-Recognition`:
continuous valence/arousal/dominance (VAD) emotion regression from audio,
video, and text, with principled uncertainty quantification via
Normal-Inverse-Gamma (NIG) evidential heads.

Design principles (TPU-first, not a port):
  * All model math is pure-functional jnp, jitted end-to-end as one XLA program.
  * Hot DSP (the audio feature front-end) runs as fused Pallas matmul kernels
    on the MXU instead of per-sample librosa loops.
  * Scaling is SPMD over a `jax.sharding.Mesh` (data + model axes) with XLA
    collectives — no per-device Python.
  * Static shapes everywhere; data-dependent control flow via lax primitives.

Reference parity map (reference file → tpu_deer module):
  src/models/deer.py             → tpu_deer.core.nig, tpu_deer.models.heads
  src/models/encoders.py         → tpu_deer.models.encoders, tpu_deer.ops.audio_frontend
  src/models/fusion.py           → tpu_deer.models.fusion
  src/models/complete_project.py → tpu_deer.models.deer_model
  src/utils/losses.py            → tpu_deer.core.losses
  src/utils/metrics.py           → tpu_deer.core.metrics
  src/data/preprocessing.py      → tpu_deer.data.*
  src/training/training.py       → tpu_deer.train.trainer
  src/training/evaluation.py     → tpu_deer.eval.*
  src/utils/visualization.py     → tpu_deer.viz.report
  experiments/run_multimodal_deer.py      → tpu_deer.cli
  experiments/multi_dataset_framework.py  → tpu_deer.train.multi_dataset
"""

__version__ = "0.1.0"

EMOTION_DIMS = ("valence", "arousal", "dominance")
