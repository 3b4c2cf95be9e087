"""API-surface completeness: every public component of the reference
(SURVEY.md §2 inventory) must have a TAGAN-TPU equivalent, importable at
its documented location (COVERAGE.md). Guards against accidental export
regressions as the package evolves.

Reference export lists come from `/root/reference/src/tagan/__init__.py`,
`layers/__init__.py:5-9`, `utils/__init__.py`, `visualization/__init__.py:5-29`,
plus classes that the reference defines without exporting (SURVEY.md §2).
"""

import importlib

import pytest

# (module path, attribute) -> the reference component it covers
SURFACE = {
    # §2.1 model assembly
    ("tagan_tpu", "TAGAN"): "TAGAN (model.py:22)",
    ("tagan_tpu.nn.encdec", "TAGANEncoder"): "TAGANEncoder (model.py:663, dead in ref)",
    ("tagan_tpu.nn.encdec", "TAGANDecoder"): "TAGANDecoder (model.py:874, dead in ref)",
    ("tagan_tpu.nn.encdec", "TAGANEncoderDecoder"): "TAGANEncoderDecoder (model.py:960)",
    ("tagan_tpu.nn.encdec", "save_temporal_state"): "save_temporal_state (model.py:624, broken in ref)",
    ("tagan_tpu.nn.encdec", "load_temporal_state"): "load_temporal_state (model.py:633)",
    # §2.2 geometric attention
    ("tagan_tpu.ops.distances", "pairwise_scores"): "DistanceMetric (geometric_attention.py:15-225)",
    ("tagan_tpu.nn", "GeometricAttention"): "GeometricAttention (geometric_attention.py:228)",
    ("tagan_tpu.nn", "GraphAttention"): "TAGANGraphAttention (graph_attention.py:15)",
    ("tagan_tpu.nn.spatial", "GeometricDistanceModule"): "GeometricDistanceModule (geometric_attention.py:610)",
    ("tagan_tpu.nn.spatial", "SpatialPositionEncoding"): "SpatialPositionEncoding (geometric_attention.py:770)",
    ("tagan_tpu.nn.spatial", "GeometricTemporalAttention"): "GeometricTemporalAttention (geometric_attention.py:1029)",
    # §2.3 temporal attention
    ("tagan_tpu.nn", "TimeEncoding"): "TimeEncoding (temporal_attention.py:15)",
    ("tagan_tpu.nn", "TemporalAttention"): "TemporalAttention (temporal_attention.py:309)",
    ("tagan_tpu.nn", "AsymmetricTemporalAttention"): "AsymmetricTemporalAttention (temporal_attention.py:624)",
    ("tagan_tpu.nn.temporal_attention", "MultiTimeScaleAttention"): "MultiTimeScaleAttention (temporal_attention.py:1220)",
    # §2.4 temporal propagation
    ("tagan_tpu.nn.propagation", "TemporalGRU"): "TemporalGRU (temporal_propagation.py:15)",
    ("tagan_tpu.nn.propagation", "TemporalGRUCell"): "TemporalGRUCell (temporal_propagation.py:402)",
    ("tagan_tpu.nn.propagation", "TemporalEvolutionLayer"): "TemporalEvolutionLayer (temporal_propagation.py:561)",
    ("tagan_tpu.nn.propagation", "TemporalSkipConnection"): "TemporalSkipConnection (temporal_propagation.py:768)",
    ("tagan_tpu.nn.propagation", "TemporalGatingUnit"): "TemporalGatingUnit (temporal_propagation.py:960)",
    ("tagan_tpu.nn", "TemporalPropagation"): "TemporalPropagation (temporal_propagation.py:1078)",
    ("tagan_tpu.nn.propagation", "AsymmetricTemporalCell"): "AsymmetricTemporalCell (temporal_propagation.py:1525)",
    # §2.5 heads & losses
    ("tagan_tpu.nn.heads", "TemporalPredictionHead"): "TemporalPredictionHead (classification.py:15)",
    ("tagan_tpu.nn.heads", "MultiTaskPredictionHead"): "MultiTaskPredictionHead (classification.py:182)",
    ("tagan_tpu.nn.heads", "temporal_loss"): "TemporalLossFunction (classification.py:349)",
    ("tagan_tpu.nn.heads", "TemporalLossModule"): "TemporalLossModule (classification.py:595)",
    ("tagan_tpu.nn.heads", "TemporalClassificationHead"): "TemporalClassificationHead (classification.py:743)",
    ("tagan_tpu.nn.heads", "asymmetric_focal_loss"): "AsymmetricFocalLoss (classification.py:978)",
    ("tagan_tpu.nn.heads", "ClassificationModule"): "ClassificationModule (classification.py:1069)",
    ("tagan_tpu.nn.heads", "RegressionModule"): "RegressionModule (classification.py:1234)",
    # §2.6 memory banks
    ("tagan_tpu", "MemoryState"): "NodeMemoryBank (memory_bank.py:14)",
    ("tagan_tpu", "memory_update"): "NodeMemoryBank.update (memory_bank.py:65)",
    ("tagan_tpu", "memory_read"): "NodeMemoryBank.get_states (memory_bank.py:187)",
    ("tagan_tpu", "memory_reset"): "NodeMemoryBank.reset (memory_bank.py:227)",
    ("tagan_tpu", "memory_stats"): "NodeMemoryBank.get_memory_stats (memory_bank.py:334)",
    ("tagan_tpu", "TemporalMemoryState"): "TemporalMemoryBank (memory_bank.py:363)",
    ("tagan_tpu", "temporal_memory_interpolate"): "TemporalMemoryBank.interpolate (memory_bank.py:557)",
    # §2.7 data pipeline (missing in reference — B1)
    ("tagan_tpu.data", "TemporalGraphDataset"): "TemporalGraphDataset (missing in ref)",
    ("tagan_tpu.data", "TemporalGraphDataLoader"): "TemporalGraphDataLoader (missing in ref)",
    ("tagan_tpu.data", "preprocess_temporal_graph"): "preprocess_temporal_graph (missing in ref)",
    ("tagan_tpu.data", "create_synthetic_data"): "create_synthetic_data (data_utils.py:14)",
    ("tagan_tpu.data.social_media", "SocialMediaDataGenerator"): "SocialMediaDataGenerator (synthetic_social_media_data.py:26)",
    ("tagan_tpu.data.social_media", "SocialMediaGraphProcessor"): "SocialMediaGraphProcessor (preprocess_social_media.py:29)",
    # §2.8 training / metrics / config / debug
    ("tagan_tpu.train", "TAGANTrainer"): "TAGANTrainer (trainer.py:26)",
    ("tagan_tpu.train", "cross_validate"): "num_folds CV (config.py:386, never implemented in ref)",
    ("tagan_tpu.train", "calculate_metrics"): "calculate_metrics (metrics.py:20)",
    ("tagan_tpu.train", "calculate_regression_metrics"): "calculate_regression_metrics (metrics.py:212)",
    ("tagan_tpu.train", "calculate_graph_metrics"): "calculate_graph_metrics (metrics.py:264)",
    ("tagan_tpu.train", "MetricsTracker"): "MetricsTracker (metrics.py:307)",
    ("tagan_tpu", "TAGANConfig"): "TAGANConfig (config.py:14)",
    ("tagan_tpu", "ExperimentConfig"): "TAGANExperimentConfig (config.py:353)",
    ("tagan_tpu.utils.debug", "TAGANDebugger"): "TAGANDebugger (debug_utils.py:24)",
    # §2.9 native / parallel (absent in reference — mandated by the build)
    ("tagan_tpu.ops.pallas.flash_geometric", "flash_geometric_attention"): "fused SDDMM+softmax+SpMM kernel",
    ("tagan_tpu.ops.sparse", "segment_softmax"): "segment softmax",
    ("tagan_tpu.core.graph", "coo_to_csr"): "CSR build",
    ("tagan_tpu.dist.mesh", "make_mesh"): "device mesh",
    ("tagan_tpu.dist.edge_partition", "ring_edge_attention"): "halo/ring exchange",
    ("tagan_tpu.dist.edge_partition", "scaling_report"): "scaling counters",
}

VIZ = [
    # attention_vis (visualization/__init__.py:5-11)
    "plot_attention_patterns", "plot_interactive_attention",
    "plot_temporal_graph_attention", "create_animated_attention",
    "plot_graph_with_attention",
    # temporal_vis (:12-18)
    "visualize_temporal_graph", "plot_node_feature_evolution",
    "animate_feature_timeseries", "interactive_temporal_graph",
    "plot_temporal_patterns",
    # performance_vis (:19-29)
    "plot_performance_metrics", "plot_confusion_matrix", "plot_roc_curve",
    "plot_precision_recall_curve", "plot_training_history",
    "plot_metric_comparison", "interactive_performance_plot",
    "interactive_confusion_matrix", "plot_feature_importance",
]


@pytest.mark.parametrize("modname,attr", sorted(SURFACE), ids=lambda x: str(x))
def test_component_available(modname, attr):
    mod = importlib.import_module(modname)
    assert hasattr(mod, attr), \
        f"{modname}.{attr} missing (covers: {SURFACE[(modname, attr)]})"


def test_viz_surface_complete():
    viz = importlib.import_module("tagan_tpu.viz")
    missing = [n for n in VIZ if not hasattr(viz, n)]
    assert not missing, f"viz functions missing: {missing}"
