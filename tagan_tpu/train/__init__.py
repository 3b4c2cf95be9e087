from .metrics import (calculate_metrics, calculate_regression_metrics,
                      calculate_graph_metrics, MetricsTracker)
from .trainer import TAGANTrainer, make_optimizer
from .checkpoint import save_checkpoint, load_checkpoint
