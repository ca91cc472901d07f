"""Training: trainer, checkpointing, schedules, multi-dataset orchestration."""

from tpu_deer.train.checkpoint import CheckpointManager
from tpu_deer.train.trainer import (
    DEERTrainer,
    TrainingConfig,
    TrainState,
    run_complete_training_pipeline,
)
from tpu_deer.train.text_pretrain import (
    TextEncoderFeaturizer,
    TextPretrainConfig,
    pretrain_text_encoder,
)
from tpu_deer.train.raw_trainer import RawSequenceTrainer, RawTrainingConfig
