from .logging import get_root_logger
from .metrics import (confusion_matrix, get_weighted_score,
                      mean_class_accuracy, softmax, top_k_accuracy)

__all__ = ['get_root_logger', 'softmax', 'top_k_accuracy',
           'mean_class_accuracy', 'confusion_matrix', 'get_weighted_score']

def device_mem_usage():
    """Per-device HBM usage in GB (reference ``misc.py:17-22`` analog)."""
    import jax
    out = {}
    for d in jax.local_devices():
        stats = getattr(d, 'memory_stats', lambda: None)()
        if stats:
            out[str(d)] = {
                'bytes_in_use_gb': stats.get('bytes_in_use', 0) / 1e9,
                'peak_gb': stats.get('peak_bytes_in_use', 0) / 1e9,
            }
    return out
