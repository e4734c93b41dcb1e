from .scoring import (floating_region_score, box_filter, normalize_map,
                      fused_upsample_region_score, spatial_region_score)
from .selection import select_pixels_to_label, SelectionResult
