"""Visualization and reporting."""

from tpu_deer.viz.report import (
    EmotionSpaceVisualizer,
    UncertaintyVisualizer,
    AttentionVisualizer,
    PerformanceVisualizer,
    create_comprehensive_report,
)
