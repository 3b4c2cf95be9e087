from .synthetic import (create_synthetic_data, create_dynamic_synthetic_data,
                        barabasi_albert_edges)
from .dataset import TemporalGraphDataset, TemporalGraphDataLoader
from .preprocess import preprocess_temporal_graph
from .social_media import SocialMediaDataGenerator, SocialMediaGraphProcessor
from .tgn import (TemporalInteractionStream, load_jodie_csv,
                  create_tgn_synthetic, stream_to_sequences)
