from .logging import get_root_logger
from .metrics import (confusion_matrix, get_weighted_score,
                      mean_class_accuracy, softmax, top_k_accuracy)

__all__ = ['get_root_logger', 'softmax', 'top_k_accuracy',
           'mean_class_accuracy', 'confusion_matrix', 'get_weighted_score']
