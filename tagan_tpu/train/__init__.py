from .metrics import (calculate_metrics, calculate_regression_metrics,
                      calculate_graph_metrics, MetricsTracker)
from .trainer import TAGANTrainer, cross_validate, make_optimizer
from .checkpoint import save_checkpoint, load_checkpoint
