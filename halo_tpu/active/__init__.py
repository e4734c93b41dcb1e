from .scoring import floating_region_score, box_filter, normalize_map
from .selection import select_pixels_to_label, SelectionResult
