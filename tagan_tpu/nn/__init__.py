from .geometric import GeometricAttention, GraphAttention
from .time_encoding import TimeEncoding
from .temporal_attention import (TemporalAttention,
                                 AsymmetricTemporalAttention,
                                 MultiTimeScaleAttention, causal_mask)
from .propagation import (TemporalGRUCell, TemporalEvolutionLayer,
                          TemporalSkipConnection, TemporalGatingUnit,
                          TemporalPropagation, TemporalGRU,
                          AsymmetricTemporalCell)
from .heads import (TemporalPredictionHead, MultiTaskPredictionHead,
                    TemporalClassificationHead, ClassificationModule,
                    RegressionModule, TemporalLossModule, temporal_loss,
                    asymmetric_focal_loss, pool_temporal)
from .model import TAGAN, TAGANOutput, batched_forward
from .encdec import (TAGANEncoder, TAGANDecoder, TAGANEncoderDecoder,
                     EncodedSequence, save_temporal_state,
                     load_temporal_state)
from .spatial import (GeometricDistanceModule, SpatialPositionEncoding,
                      GeometricTemporalAttention)
