"""Core evidential math: NIG distributions, DEER losses, regression metrics."""

from tpu_deer.core.nig import (
    NIGParams,
    nig_params_from_evidence,
    nig_uncertainties,
    nig_nll,
    nig_nll_v2,
    evidence_regularizer,
    evidence_regularizer_v2,
    kl_regularizer,
    kl_regularizer_v2,
)
from tpu_deer.core.losses import (
    DEERLossConfig,
    deer_loss,
    multi_task_deer_loss,
    uncertainty_regularization_loss,
    calibration_loss,
    combined_deer_loss,
    binned_ece_loss,
)
from tpu_deer.core.metrics import (
    concordance_correlation_coefficient,
    ccc_sufficient_stats,
    ccc_from_stats,
    pearson_correlation,
    mean_absolute_error,
    root_mean_squared_error,
    uncertainty_calibration_error,
    evaluate_predictions,
)
