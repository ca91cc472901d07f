"""Model zoo: encoders, attention, fusion, DEER heads, and the complete model."""

from tpu_deer.models.deer_model import (
    CompleteDEERModel,
    DEERModelConfig,
    create_complete_deer_model,
    count_parameters,
)
from tpu_deer.models.encoders import (
    ModalityEncoder,
    AudioSequenceEncoder,
    VideoSequenceEncoder,
    TextSequenceEncoder,
    UnifiedSequenceEncoder,
    create_encoders_from_config,
    get_encoder_output_dims,
)
from tpu_deer.models.hierarchical_deer import (
    HierarchicalDEERFusionModel,
    RawSequenceDEERModel,
)
from tpu_deer.models.attention import (
    MultiHeadAttention,
    UncertaintyEstimator,
    UncertaintyAwareAttention,
    CrossModalAttention,
)
from tpu_deer.models.fusion import (
    HierarchicalFusion,
    HierarchicalMultimodalFusion,
    AudioVisualFusion,
    TrimodalFusion,
    UncertaintyAwareGating,
    AdaptiveFusionGating,
    AttentionFusion,
    BilinearFusion,
    ConcatFusion,
    create_fusion_module,
)
from tpu_deer.models.heads import (
    DEERPredictionHead,
    MultiDimensionalDEER,
    UncertaintyCalibrationLayer,
)
