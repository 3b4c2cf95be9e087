from .attention_vis import (plot_attention_patterns,
                            plot_interactive_attention,
                            plot_temporal_graph_attention,
                            create_animated_attention,
                            plot_graph_with_attention)
from .temporal_vis import (visualize_temporal_graph,
                           plot_node_feature_evolution,
                           animate_feature_timeseries,
                           interactive_temporal_graph,
                           plot_temporal_patterns)
from .performance_vis import (plot_performance_metrics,
                              plot_confusion_matrix, plot_roc_curve,
                              plot_precision_recall_curve,
                              plot_training_history,
                              plot_metric_comparison,
                              interactive_performance_plot,
                              interactive_confusion_matrix,
                              plot_feature_importance)
