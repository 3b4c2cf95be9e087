from .debug import (TAGANDebugger, get_debugger, nan_debug, profiler_trace,
                    profile_forward, temporal_asymmetry_score,
                    past_future_attention, device_memory_stats)
