"""TPU kernels and XLA DSP: the native compute tier of the framework."""

from tpu_deer.ops.audio_frontend import (
    AudioFrontendConfig,
    frame_signal,
    mfcc_frames,
    audio_frame_features,
    extract_utterance_features,
    extract_enhanced_utterance_features,
)
from tpu_deer.ops.flash_attention import flash_attention
