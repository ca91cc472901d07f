"""Evaluation: metrics bundles, uncertainty quality, calibration, statistics."""

from tpu_deer.eval.evaluator import (
    EvaluationResults,
    DEERModelEvaluator,
    evaluate_deer_model,
)
from tpu_deer.eval.uncertainty import UncertaintyAnalyzer, sparsification_curve
from tpu_deer.eval.calibration import CalibrationAnalyzer
from tpu_deer.eval.statistics import StatisticalValidator, bootstrap_ccc_ci
from tpu_deer.eval.cross_validation import CrossValidationEvaluator
from tpu_deer.eval.conformal import ConformalCalibrator, ConformalIntervals
from tpu_deer.eval.ood import MahalanobisOOD, input_norm_features, ood_auroc
