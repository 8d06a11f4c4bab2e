from trackdlo_tpu.utils.profiling import PhaseTimers, trace_step
from trackdlo_tpu.utils.viz import draw_tracking_overlay, geometry_markers

__all__ = ["PhaseTimers", "trace_step", "draw_tracking_overlay", "geometry_markers"]
