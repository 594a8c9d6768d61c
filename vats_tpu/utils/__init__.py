from vats_tpu.utils.logging_utils import setup_logger
from vats_tpu.utils.visualization import plot_metrics

__all__ = ["setup_logger", "plot_metrics"]
