from .metrics import (
    classification_metrics_from_cm,
    regression_metrics_from_sums,
    format_confusion_matrix,
)
from .trainer import train, TrainResult

__all__ = [
    "classification_metrics_from_cm",
    "regression_metrics_from_sums",
    "format_confusion_matrix",
    "train",
    "TrainResult",
]
